#!/usr/bin/env python
"""Ablation profiler: marginal device cost of each path-tracer stage.

Isolated per-stage timing is unreliable through the axon tunnel (small
executions return implausibly fast), so this measures what matters: the full
_trace_rays dispatch with one stage at a time stubbed out (same shapes, no
memory traffic). marginal(stage) = t_full - t_without_stage.

Uses a center crop of the 1080p frame so the bench sphere fills the chunk
(bounces + shadows actually run). Run on the TPU tunnel:

    python tools/profile_pt.py
"""

import sys
import time

import numpy as np


def timed(fn, args, iters=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_bench_scene
    from gltf_renderer_tpu.ops import bvh as bvh_ops
    from gltf_renderer_tpu.ops import material as mat_mod
    from gltf_renderer_tpu.ops.bsdf import SurfaceProperties
    from gltf_renderer_tpu.render import pathtracer as pt

    W, H = 1920, 1080
    scene, meta, settings, params, c2w, n_tris = build_bench_scene(W, H)
    n = pt.RAY_CHUNK
    # 512x512 center crop (= RAY_CHUNK pixels) so the sphere fills the chunk.
    side = 512
    x0, y0 = (W - side) // 2, (H - side) // 2
    py_g, px_g = np.meshgrid(np.arange(y0, y0 + side), np.arange(x0, x0 + side),
                             indexing="ij")
    px = jnp.asarray(px_g.reshape(-1).astype(np.int32))
    py = jnp.asarray(py_g.reshape(-1).astype(np.int32))
    print(f"device={jax.devices()[0]} tris={n_tris} rays={n} use_pallas={meta.use_pallas}")

    def run_variant(name, patches):
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        try:
            # Fresh function object per variant: jax's jaxpr cache keys on the
            # function identity, so reusing pt._trace_rays would reuse the
            # unpatched trace.
            def fresh(*a):
                return pt._trace_rays(*a)

            f = jax.jit(fresh, static_argnums=(1, 2, 5))
            args = (scene, meta, settings, params, c2w, (W, H), jnp.uint32(3), px, py)
            ms = timed(f, args)
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        return ms

    base_ms = run_variant("full", [])
    (_, stats) = jax.jit(pt._trace_rays, static_argnums=(1, 2, 5))(
        scene, meta, settings, params, c2w, (W, H), jnp.uint32(3), px, py
    )
    rays = float(stats[0])
    print(f"{'FULL':26s} {base_ms:8.2f} ms   ({rays/1e3:.0f} krays -> "
          f"{rays / (base_ms / 1e3) / 1e6:.2f} Mrays/s)")

    # --- stubs (identical shapes/dtypes, near-zero work) ---

    real_fetch = pt.fetch_hit_attributes

    def stub_fetch(world, tri, u, v, ray_dir):
        z = jnp.zeros_like(ray_dir)
        up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ray_dir.shape)
        t4 = jnp.concatenate([up * 0 + jnp.asarray([1.0, 0.0, 0.0]), jnp.ones_like(u)[..., None]], -1)
        return pt.HitAttributes(
            position=z, geometric_normal=up, normal=up, tangent=t4,
            bitangent=jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), ray_dir.shape),
            color=jnp.ones(u.shape + (4,)), uv0=jnp.zeros(u.shape + (2,)),
            uv1=jnp.zeros(u.shape + (2,)), material=jnp.zeros_like(tri),
            back_face=jnp.zeros(u.shape, bool),
        )

    real_surface = mat_mod.get_surface_properties

    def stub_surface(materials, textures, mat_id, uv0, uv1, vertex_color, normal,
                     tangent, bitangent, geometric_normal, view, **kw):
        r = mat_id.shape[0]
        one1 = jnp.ones((r, 1)); col = jnp.full((r, 3), 0.5)
        sp = SurfaceProperties(
            albedo=col, alpha=one1, metalness=one1 * 0.0,
            roughness_squared=jnp.full((r, 2), 0.25), shading_normal=normal,
            anisotropy_tangent=tangent[..., :3], anisotropy_bitangent=bitangent,
            ior=one1 * 1.5, specular_color=jnp.ones((r, 3)), specular_factor=one1,
            clearcoat=one1 * 0.0, clearcoat_roughness=one1 * 0.1,
            clearcoat_normal=normal, sheen_color=col * 0.0,
            sheen_roughness_squared=one1 * 0.1, transmissive=one1 * 0.0,
            thickness=one1 * 0.0, attenuation_distance=one1,
            attenuation_color=jnp.ones((r, 3)),
        )
        extras = mat_mod.SurfaceExtras(
            emissive=col * 0.0, occlusion=jnp.ones(r), base_color=jnp.ones((r, 4)),
            flags=jnp.zeros(r, jnp.int32), alpha_mode=jnp.zeros(r, jnp.int32),
            alpha_cutoff=jnp.zeros(r),
        )
        return sp, extras

    real_env_sample = pt._env_sample

    def stub_env_sample(scene_, meta_, u2, params_):
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), u2.shape[:-1] + (3,))
        c = jnp.ones(u2.shape[:-1] + (3,))
        return d, c, jnp.ones(u2.shape[:-1])

    real_env_pdf = pt._env_pdf

    def stub_env_pdf(scene_, meta_, d):
        return jnp.ones(d.shape[:-1])

    real_env_rad = pt._env_radiance

    def stub_env_rad(scene_, meta_, d, params_, use_env):
        return jnp.ones(d.shape[:-1] + (3,)) * 0.5

    real_shadow = pt.trace_shadow

    def stub_shadow(scene_, meta_, origin, direction, t_max, alpha_shadow,
                    active=None, **kw):
        return jnp.ones(origin.shape[0])

    real_closest = pt.trace_closest

    def stub_traversal(scene_, meta_, origin, direction, t_min, t_max, cull_sign=0,
                       sort_rays=False, **kw):
        r = origin.shape[0]
        return bvh_ops.Hit(
            t=jnp.minimum(t_max, 2.0), tri=jnp.zeros(r, jnp.int32),
            u=jnp.full(r, 0.3), v=jnp.full(r, 0.3),
        )

    real_sample = pt.sample_bsdf
    real_eval = pt.evaluate_bsdf

    def stub_sample(sp, u3, v, settings_, sheen_table, meta=None):
        r = u3.shape[0]
        l = sp.shading_normal
        return (jnp.full((r, 3), 0.3), l, jnp.full(r, 0.5),
                jnp.zeros(r, bool), jnp.ones(r, bool))

    def stub_eval(sp, gn, v, l, settings_, sheen_table, meta=None):
        return jnp.full(gn.shape, 0.3), jnp.full(gn.shape[:-1], 0.5)

    variants = [
        ("fetch_hit_attributes", [(pt, "fetch_hit_attributes", stub_fetch)]),
        ("get_surface_properties", [(mat_mod, "get_surface_properties", stub_surface),
                                    (pt, "get_surface_properties", stub_surface)]),
        ("env_sample", [(pt, "_env_sample", stub_env_sample)]),
        ("env_pdf", [(pt, "_env_pdf", stub_env_pdf)]),
        ("env_radiance(miss)", [(pt, "_env_radiance", stub_env_rad)]),
        ("trace_shadow", [(pt, "trace_shadow", stub_shadow)]),
        ("traversal(closest)", [(pt, "trace_closest", stub_traversal)]),
        ("sample_bsdf", [(pt, "sample_bsdf", stub_sample)]),
        ("evaluate_bsdf", [(pt, "evaluate_bsdf", stub_eval)]),
    ]
    for name, patches in variants:
        ms = run_variant(name, patches)
        print(f"- {name:24s} {ms:8.2f} ms   marginal {base_ms - ms:8.2f} ms")


if __name__ == "__main__":
    main()

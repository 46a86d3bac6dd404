#!/usr/bin/env python
"""Ablation profiler for the raster backend's draw_scene (1080p).

Same method as tools/profile_pt.py: isolated stage timing through the
tunnel is unreliable, so measure the FULL _raster_step with one stage at a
time stubbed to near-zero work (same shapes), and report the marginal cost
t_full - t_without_stage. Honest-mode rule applies (docs/PERFORMANCE.md):
the first pallas dispatch flips timings honest — the raycast visibility
kernel inside the first full run does that.

    python tools/bench_raststage.py [raycast|tiled]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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

    from bench import build_bench_scene
    from gltf_renderer_tpu.render import rasterizer as R
    from gltf_renderer_tpu.render import settings as S
    from gltf_renderer_tpu.ops import material as mat_mod
    from gltf_renderer_tpu.ops import bvh as bvh_ops
    from gltf_renderer_tpu.render import pathtracer as pt

    import os

    vis = sys.argv[1] if len(sys.argv) > 1 else "raycast"
    W = int(os.environ.get("BENCH_WIDTH", 1920))
    H = int(os.environ.get("BENCH_HEIGHT", 1080))
    scene, meta, _settings, params, c2w, n_tris = build_bench_scene(W, H)
    rs = S.RenderSettings(backend="rasterizer", width=W, height=H)
    cam = jnp.zeros(3)
    scene_dev = jax.tree.map(jnp.asarray, scene)

    def run_variant(name, patches):
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        try:
            def fresh(sc):
                return R.render(sc, meta, rs, params, c2w, cam, (W, H),
                                jnp.uint32(0), visibility=vis)

            ms = timed(jax.jit(fresh), (scene_dev,))
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        return ms

    base_ms = run_variant("full", [])
    print(f"{'FULL':28s} {base_ms:8.1f} ms  ({1000.0 / base_ms:.2f} FPS, "
          f"vis={vis})")

    # Stage stubs (same output shapes, near-zero work).
    real_surface = mat_mod.get_surface_properties

    def stub_surface(materials, textures, mat_id, uv0, uv1, vertex_color,
                     normal, tangent, bitangent, geometric_normal, view, **kw):
        r = mat_id.shape[0]
        from gltf_renderer_tpu.ops.bsdf import SurfaceProperties

        one1 = jnp.ones((r, 1))
        col = jnp.full((r, 3), 0.5)
        sp = SurfaceProperties(
            albedo=col, alpha=one1, metalness=one1 * 0.0,
            roughness_squared=jnp.full((r, 2), 0.25), shading_normal=normal,
            anisotropy_tangent=tangent[..., :3], anisotropy_bitangent=bitangent,
            ior=one1 * 1.5, specular_color=jnp.ones((r, 3)),
            specular_factor=one1, clearcoat=one1 * 0.0,
            clearcoat_roughness=one1 * 0.1, clearcoat_normal=normal,
            sheen_color=col * 0.0, sheen_roughness_squared=one1 * 0.1,
            transmissive=one1 * 0.0, thickness=one1 * 0.0,
            attenuation_distance=one1, attenuation_color=jnp.ones((r, 3)),
        )
        extras = mat_mod.SurfaceExtras(
            emissive=col * 0.0, occlusion=jnp.ones(r),
            base_color=jnp.ones((r, 4)), flags=jnp.zeros(r, jnp.int32),
            alpha_mode=jnp.zeros(r, jnp.int32), alpha_cutoff=jnp.zeros(r),
        )
        return sp, extras

    real_fetch = pt.fetch_hit_attributes

    def stub_fetch(world, tri, u, v, ray_dir, with_footprint=False, **kw):
        z = jnp.zeros_like(ray_dir)
        up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ray_dir.shape)
        t4 = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), ray_dir.shape),
             jnp.ones_like(u)[..., None]], -1)
        return pt.HitAttributes(
            position=z, geometric_normal=up, normal=up, tangent=t4,
            bitangent=jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), ray_dir.shape),
            color=jnp.ones(u.shape + (4,)), uv0=jnp.zeros(u.shape + (2,)),
            uv1=jnp.zeros(u.shape + (2,)), material=jnp.zeros_like(tri),
            back_face=jnp.zeros(u.shape, bool),
            uv_area_ratio=jnp.ones_like(u) if with_footprint else None,
        )

    def stub_closest(scene_, meta_, origin, direction, t_min, t_max, **kw):
        r = origin.shape[0]
        return bvh_ops.Hit(t=jnp.minimum(t_max, 2.0),
                           tri=jnp.zeros(r, jnp.int32),
                           u=jnp.full(r, 0.3), v=jnp.full(r, 0.3))

    real_cube = R._sample_cube_trilinear

    def stub_cube(mips, direction, level, **kw):
        return jnp.full(direction.shape[:-1] + (3,), 0.3)

    import gltf_renderer_tpu.render.rasterizer as RR

    variants = [
        ("get_surface_properties", [(mat_mod, "get_surface_properties", stub_surface),
                                    (RR, "get_surface_properties", stub_surface)]),
        ("fetch_hit_attributes", [(pt, "fetch_hit_attributes", stub_fetch),
                                  (RR, "fetch_hit_attributes", stub_fetch)]),
        ("cube IBL gathers", [(RR, "_sample_cube_trilinear", stub_cube)]),
    ]
    if vis == "raycast":
        from gltf_renderer_tpu.render import pathtracer as pt_mod

        variants.append(
            ("visibility (closest_hit)", [(pt_mod, "closest_hit", stub_closest)])
        )

    for name, patches in variants:
        ms = run_variant(name, patches)
        print(f"- {name:26s} {ms:8.1f} ms   marginal {base_ms - ms:+7.1f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""True in-graph cost of the packet traversal kernel on the bench scene with
realistic rays (primary from the bench camera; bounce = cosine at hits)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main():
    from bench import build_bench_scene
    from gltf_renderer_tpu.render import pathtracer as pt
    from gltf_renderer_tpu.ops import rng
    from gltf_renderer_tpu.ops import sampling
    from gltf_renderer_tpu.utils.math import normalize

    W, H = 1920, 1080
    scene, meta, settings, params, c2w, n_tris = build_bench_scene(W, H)
    side = 512
    x0, y0 = (W - side) // 2, (H - side) // 2
    py_g, px_g = np.meshgrid(np.arange(y0, y0 + side), np.arange(x0, x0 + side), indexing="ij")
    px = jnp.asarray(px_g.reshape(-1).astype(np.int32))
    py = jnp.asarray(py_g.reshape(-1).astype(np.int32))
    R = px.shape[0]

    origin, draw = pt.generate_camera_rays(px, py, (W, H), c2w, jnp.zeros((R, 2)))
    ray_len = jnp.sqrt(jnp.maximum(jnp.sum(draw**2, -1), 1e-20))
    direction = draw / ray_len[..., None]
    t_min = jnp.zeros(R)
    t_max = ray_len

    def close(o, d, tn, tx, sort, spatial=None):
        return pt.closest_hit(scene, meta, o, d, tn, tx, sort_rays=sort,
                              sort_spatial=spatial)

    f_primary = jax.jit(lambda o, d, tn, tx: close(o, d, tn, tx, False))
    ms = timeit(f_primary, origin, direction, t_min, t_max)
    print(f"primary closest (coherent, no sort): {ms:7.2f} ms  "
          f"({R/ms/1e3:.1f} Mrays/s)")

    hit = f_primary(origin, direction, t_min, t_max)
    attrs = pt.fetch_hit_attributes(scene.world, hit.tri, hit.u, hit.v, direction)
    alivef = hit.tri >= 0
    n_alive = int(jnp.sum(alivef))
    print(f"alive after primary: {n_alive}/{R}")

    u = rng.pt_random(px, py, jnp.uint32(3), 7)
    bdir = sampling.sample_cosine_hemisphere(attrs.normal, u[..., 0:2])
    borig = pt.offset_ray(attrs.position, attrs.geometric_normal)
    btmin = jnp.where(alivef, 0.0, 2.0)
    btmax = jnp.where(alivef, 1000.0, 1.0)

    for name, sort, spat in [
        ("bounce NO sort     ", False, None),
        ("bounce octant sort ", True, None),
        ("bounce octant+local", True, hit.tri),
    ]:
        f = jax.jit(lambda o, d, tn, tx, s=sort, sp=spat: close(o, d, tn, tx, s, sp))
        ms = timeit(f, borig, bdir, btmin, btmax)
        print(f"{name}: {ms:7.2f} ms  ({n_alive/ms/1e3:.1f} Mrays/s alive)")

    # shadow: env alias sample directions
    u4 = rng.pt_random(px, py, jnp.uint32(3), 9)
    ldir, lcol, lpdf = pt._env_sample(scene, meta, u4, params)

    def shadow(o, d, tx, spatial):
        return pt.trace_shadow(scene, meta, o, d, tx, alpha_shadow=False,
                               active=alivef, sort_spatial=spatial)

    f_sh = jax.jit(lambda o, d, sp: shadow(o, d, jnp.full(R, 1000.0), sp))
    ms = timeit(f_sh, borig, ldir, hit.tri)
    print(f"shadow any-hit sorted    : {ms:7.2f} ms  ({n_alive/ms/1e3:.1f} Mrays/s alive)")

    # stage costs in isolation (single dispatch each, RPC ~24ms subtract mentally)
    f_fetch = jax.jit(lambda t, uu, vv, d: pt.fetch_hit_attributes(scene.world, t, uu, vv, d))
    print(f"fetch_hit_attributes     : {timeit(f_fetch, hit.tri, hit.u, hit.v, direction):7.2f} ms")

    from gltf_renderer_tpu.ops import material as mat_mod

    f_surf = jax.jit(lambda a_mat, a_uv0, a_uv1, a_col, a_n, a_t, a_b, a_gn, v: mat_mod.get_surface_properties(
        scene.materials, scene.textures, a_mat, a_uv0, a_uv1, a_col, a_n, a_t,
        a_b, a_gn, v,
        used_slots=meta.used_slots, rows_compact=True))
    print(f"get_surface_properties   : {timeit(f_surf, attrs.material, attrs.uv0, attrs.uv1, attrs.color, attrs.normal, attrs.tangent, attrs.bitangent, attrs.geometric_normal, -direction):7.2f} ms")

    f_env_s = jax.jit(lambda uu: pt._env_sample(scene, meta, uu, params))
    print(f"env_sample (alias)       : {timeit(f_env_s, u4):7.2f} ms")
    f_env_p = jax.jit(lambda d: pt._env_pdf(scene, meta, normalize(d)))
    print(f"env_pdf                  : {timeit(f_env_p, bdir):7.2f} ms")
    f_env_r = jax.jit(lambda d: pt._env_radiance(scene, meta, normalize(d), params, True))
    print(f"env_radiance             : {timeit(f_env_r, bdir):7.2f} ms")

    f_eval = jax.jit(lambda a_gn, v, l: pt.evaluate_bsdf(
        f_surf(attrs.material, attrs.uv0, attrs.uv1, attrs.color, attrs.normal,
               attrs.tangent, attrs.bitangent, attrs.geometric_normal, v)[0],
        a_gn, v, l, settings, scene.sheen_table, meta=meta))
    print(f"surface+evaluate_bsdf    : {timeit(f_eval, attrs.geometric_normal, -direction, ldir):7.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Shadow-dispatch experiments: the env-NEE any-hit half dominates the merged
bounce+shadow kernel (measured 128 ms vs 45 ms bounce at 262k rays). Env
shadow directions are alias-sampled -> heavily clustered on importance
hotspots, so direction-major (texel) ordering should produce packets whose
rays share one narrow frustum to one texel."""

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
    from gltf_renderer_tpu.utils.math import sphere_to_square, unit_square_to_uv

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
    hit = pt.trace_closest(scene, meta, origin, direction, jnp.zeros(R), ray_len)
    attrs = pt.fetch_hit_attributes(scene.world, hit.tri, hit.u, hit.v, direction)
    alivef = hit.tri >= 0
    n_alive = int(jnp.sum(alivef))
    print(f"device={jax.devices()[0]} alive={n_alive}/{R}")

    u4 = rng.pt_random(px, py, jnp.uint32(3), 9)
    ldir, lcol, lpdf = pt._env_sample(scene, meta, u4, params)
    borig = pt.offset_ray(attrs.position, attrs.geometric_normal)
    t_max = jnp.full(R, 1000.0)

    # Direction texel id (importance-map resolution) for direction-major keys.
    size = scene.env.importance[0].shape[0]
    uv = unit_square_to_uv(sphere_to_square(ldir))
    tx = jnp.clip((uv[:, 0] * size).astype(jnp.int32), 0, size - 1)
    ty = jnp.clip((uv[:, 1] * size).astype(jnp.int32), 0, size - 1)
    texel = ty * size + tx
    n_uniq = len(np.unique(np.asarray(texel)[np.asarray(alivef)]))
    print(f"unique shadow texels among alive: {n_uniq} (size={size})")

    def shadow(o, d, spatial):
        return pt.trace_shadow(scene, meta, o, d, t_max, alpha_shadow=False,
                               active=alivef, sort_spatial=spatial)

    f1 = jax.jit(lambda o, d: shadow(o, d, hit.tri))
    print(f"any-hit slot-sorted      : {timeit(f1, borig, ldir):7.2f} ms")
    f2 = jax.jit(lambda o, d: shadow(o, d, None))
    print(f"any-hit octant-only      : {timeit(f2, borig, ldir):7.2f} ms")
    f3 = jax.jit(lambda o, d, tex: shadow(o, d, tex))
    print(f"any-hit texel-sorted     : {timeit(f3, borig, ldir, texel):7.2f} ms")
    # texel-major + coarse origin minor
    key_mix = texel * 512 + jnp.clip(hit.tri >> 7, 0, 511)
    print(f"any-hit texel+slot-sorted: {timeit(f3, borig, ldir, key_mix):7.2f} ms")
    # closest-hit semantics for comparison (t_best shrinkage effect)
    fc = jax.jit(lambda o, d: pt.trace_closest(
        scene, meta, o, d, jnp.where(alivef, 0.0, t_max + 1.0), t_max,
        sort_rays=True, sort_spatial=hit.tri))
    print(f"CLOSEST slot-sorted      : {timeit(fc, borig, ldir):7.2f} ms")


if __name__ == "__main__":
    main()

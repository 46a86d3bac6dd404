#!/usr/bin/env python
"""Microbench: cost of the packet-dispatch sort machinery and env math at
chunk size, on the live TPU. Informs the merged-dispatch redesign."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, iters=6):
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

    from gltf_renderer_tpu.render import pathtracer as pt

    R = 262144
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    t_min = jnp.zeros(R)
    t_max = jnp.full(R, 1000.0)
    bucket = jax.random.randint(jax.random.PRNGKey(2), (R,), 0, 16)

    f_pos1 = jax.jit(lambda dd, tn, tx: pt._octant_positions(dd, tn, tx))
    f_pos2 = jax.jit(lambda dd, tn, tx, b: pt._octant_positions(dd, tn, tx, b))
    print(f"octant positions (R={R}):      {timed(f_pos1, d, t_min, t_max):7.2f} ms")
    print(f"octant+locality positions:     {timed(f_pos2, d, t_min, t_max, bucket):7.2f} ms")

    def scatter_cols(pos):
        cols = jnp.concatenate([o, d, t_min[:, None], t_max[:, None]], axis=1)
        return jnp.zeros_like(cols).at[pos].set(cols)

    pos = f_pos2(d, t_min, t_max, bucket)
    print(f"scatter 8-col reorder:         {timed(jax.jit(scatter_cols), pos):7.2f} ms")

    def gather_back(pos):
        out = jnp.stack([t_min, t_max, t_min, t_max], axis=1)
        return out[pos]

    print(f"gather 4-col restore:          {timed(jax.jit(gather_back), pos):7.2f} ms")

    # env math pieces
    from gltf_renderer_tpu.utils.math import (
        sphere_to_square, square_to_sphere, unit_square_to_uv, uv_to_unit_square,
    )
    from gltf_renderer_tpu.env.environment import direction_to_cubemap

    f_s2s = jax.jit(lambda x: square_to_sphere(uv_to_unit_square(x)))
    uv = jax.random.uniform(key, (R, 2))
    print(f"square_to_sphere:              {timed(f_s2s, uv):7.2f} ms")
    f_sph2sq = jax.jit(lambda x: unit_square_to_uv(sphere_to_square(x)))
    print(f"sphere_to_square:              {timed(f_sph2sq, d):7.2f} ms")
    f_d2c = jax.jit(direction_to_cubemap)
    print(f"direction_to_cubemap:          {timed(f_d2c, d):7.2f} ms")

    # single row gather at chunk scale for reference
    tbl = jax.random.normal(key, (1024 * 1024, 8))
    idx = jax.random.randint(key, (R,), 0, 1024 * 1024)
    f_g = jax.jit(lambda t, i: t[i])
    print(f"(1M,8) row gather @R:          {timed(f_g, tbl, idx):7.2f} ms")
    tbl2 = jax.random.normal(key, (1024, 8))
    idx2 = jax.random.randint(key, (R,), 0, 1024)
    print(f"(1K,8) row gather @R:          {timed(f_g, tbl2, idx2):7.2f} ms")

    # one full Pallas traversal for scale
    from bench import build_bench_scene

    scene, meta, settings, params, c2w, n_tris = build_bench_scene(1920, 1080)

    def trav(o_, d_, tn, tx):
        return pt.closest_hit(scene, meta, o_, d_, tn, tx)

    # coherent-ish rays at the sphere
    oo = jnp.broadcast_to(jnp.asarray([0.0, -3.0, 0.0]), (R, 3))
    dd = d * jnp.asarray([0.2, 0.2, 0.2]) + jnp.asarray([0.0, 1.0, 0.0])
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
    print(f"packet traversal coherent:     {timed(jax.jit(trav), oo, dd, t_min, t_max):7.2f} ms")

    def trav_inc(o_, d_, tn, tx):
        return pt.closest_hit(scene, meta, o_, d_, tn, tx, sort_rays=True)

    print(f"packet traversal incoherent:   {timed(jax.jit(trav_inc), o * 0.5, d, t_min, t_max):7.2f} ms")


if __name__ == "__main__":
    main()

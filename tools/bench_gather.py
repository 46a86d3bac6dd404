#!/usr/bin/env python
"""Microbenchmark: XLA gather modes on the TPU (drives gather layout choices).

Measures, at the path tracer's chunk size, the device cost of:
  - 2-index gather            arr2d[y, x]
  - 3-index gather            arr3d[f, y, x]          (cube-style)
  - flat row gather           flat[y * W + x]         (rows of width C)
  - 4-corner separate         4x flat row gathers     (bilinear pattern)
  - 4-corner fused            1 flat row gather of 4R indices
  - one-hot matmul            (R, M) @ (M, C) for small M (material rows)
"""

import time
import numpy as np


def timed(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    R = 262144
    S = 1024
    C = 4
    key = np.random.RandomState(0)
    arr2d = jnp.asarray(key.rand(S, S).astype(np.float32))
    arr3d = jnp.asarray(key.rand(6, S, S, 3).astype(np.float32))
    rows = jnp.asarray(key.rand(S * S, C).astype(np.float32))
    x = jnp.asarray(key.randint(0, S, R).astype(np.int32))
    y = jnp.asarray(key.randint(0, S, R).astype(np.int32))
    f = jnp.asarray(key.randint(0, 6, R).astype(np.int32))
    M = 8
    mat = jnp.asarray(key.rand(M, 144).astype(np.float32))
    mid = jnp.asarray(key.randint(0, M, R).astype(np.int32))

    print(f"device={jax.devices()[0]}, R={R}")

    two = jax.jit(lambda y, x: arr2d[y, x].sum())
    print(f"2-index gather (S,S)       {timed(two, y, x):7.3f} ms")

    three = jax.jit(lambda f, y, x: arr3d[f, y, x].sum())
    print(f"3-index gather (6,S,S,3)   {timed(three, f, y, x):7.3f} ms")

    flat3 = arr3d.reshape(-1, 3)
    threeflat = jax.jit(lambda f, y, x: flat3[(f * S + y) * S + x].sum())
    print(f"3-index as flat row        {timed(threeflat, f, y, x):7.3f} ms")

    rowg = jax.jit(lambda y, x: rows[y * S + x].sum())
    print(f"flat row gather (S*S,{C})   {timed(rowg, y, x):7.3f} ms")

    def corners4(y, x):
        tot = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                tot = tot + rows[jnp.clip(y + dy, 0, S - 1) * S + jnp.clip(x + dx, 0, S - 1)].sum()
        return tot
    print(f"4 separate row gathers     {timed(jax.jit(corners4), y, x):7.3f} ms")

    def corners_fused(y, x):
        y0 = y
        y1 = jnp.clip(y + 1, 0, S - 1)
        x0 = x
        x1 = jnp.clip(x + 1, 0, S - 1)
        idx = jnp.concatenate([y0 * S + x0, y0 * S + x1, y1 * S + x0, y1 * S + x1])
        return rows[idx].sum()
    print(f"4-corner fused (1 gather)  {timed(jax.jit(corners_fused), y, x):7.3f} ms")

    def onehot_mm(mid):
        oh = jax.nn.one_hot(mid, M, dtype=jnp.bfloat16)
        return (oh @ mat.astype(jnp.bfloat16)).astype(jnp.float32).sum()
    print(f"one-hot matmul (M=8,144)   {timed(jax.jit(onehot_mm), mid):7.3f} ms")

    matg = jax.jit(lambda mid: mat[mid].sum())
    print(f"material row gather        {timed(matg, mid):7.3f} ms")

    # Sorted (coherent) vs random flat row gather — locality effect.
    xs = jnp.sort(y * S + x)
    sortg = jax.jit(lambda i: rows[i].sum())
    print(f"flat row gather, sorted    {timed(sortg, xs):7.3f} ms")

    # u8 atlas-style gather.
    atlas = jnp.asarray(key.randint(0, 255, (S * S, 4)).astype(np.uint8))
    au8 = jax.jit(lambda y, x: atlas[y * S + x].astype(jnp.float32).sum())
    print(f"u8 row gather (S*S,4)      {timed(au8, y, x):7.3f} ms")

    # argsort cost at chunk size (octant sort overhead).
    srt = jax.jit(lambda k: jnp.argsort(k).sum())
    print(f"argsort (R,) i32           {timed(srt, y):7.3f} ms")


if __name__ == "__main__":
    main()

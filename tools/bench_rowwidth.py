#!/usr/bin/env python
"""Row-gather scaling on TPU: does cost track ROW COUNT or BYTES?

Decides the fetch_hit_attributes layout: 3R vertex-row gathers of width 20
(current) vs R tri-major rows of width 60/64 (one row per triangle holding
all 3 vertices). Pipelined timing (enqueue K, block once) per
docs/PERFORMANCE.md — per-call blocking eats ~25-29 ms of RPC.
"""

import time

import numpy as np


def timeit_pipe(fn, *args, k=16, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    import jax
    import jax.numpy as jnp

    R = 262144
    N = 1 << 17  # table rows (~helmet-scale 3*48k verts rounds to 128k)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, R).astype(np.int32))
    idx3 = jnp.asarray(rng.randint(0, N, 3 * R).astype(np.int32))

    print(f"device={jax.devices()[0]}  R={R}  table_rows={N}")
    for width in (8, 12, 16, 20, 24, 32, 48, 60, 64, 80, 128):
        tab = jnp.asarray(rng.rand(N, width).astype(np.float32))
        g = jax.jit(lambda i, t=tab: t[i].sum())
        ms_r = timeit_pipe(g, idx)
        ms_3r = timeit_pipe(g, idx3)
        by_r = R * width * 4 / ms_r / 1e6
        by_3r = 3 * R * width * 4 / ms_3r / 1e6
        print(
            f"width {width:4d}: R rows {ms_r:7.3f} ms ({by_r:5.1f} GB/s) | "
            f"3R rows {ms_3r:7.3f} ms ({by_3r:5.1f} GB/s)"
        )

    # bf16 rows at the interesting widths.
    for width in (20, 32, 64):
        tab = jnp.asarray(rng.rand(N, width).astype(np.float32)).astype(jnp.bfloat16)
        g = jax.jit(lambda i, t=tab: t[i].astype(jnp.float32).sum())
        print(f"bf16 width {width:3d}: R rows {timeit_pipe(g, idx):7.3f} ms | "
              f"3R rows {timeit_pipe(g, idx3):7.3f} ms")

    # Current fetch pattern: (R,8) i32 tri rows + (3R,20) vertex rows
    trows = jnp.asarray(rng.randint(0, N, (N, 8)).astype(np.int32))
    vrows = jnp.asarray(rng.rand(N, 20).astype(np.float32))

    def cur(i):
        tr = trows[i]
        ii = jnp.concatenate([tr[:, 0] % N, tr[:, 1] % N, tr[:, 2] % N])
        return vrows[ii].sum()

    print(f"tri(8,i32)+vert(3R,20) fused: {timeit_pipe(jax.jit(cur), idx):7.3f} ms")

    # Tri-major: ONE (R, 64) gather.
    tmaj = jnp.asarray(rng.rand(N, 64).astype(np.float32))
    g64 = jax.jit(lambda i: tmaj[i].sum())
    print(f"tri-major one (R,64) gather : {timeit_pipe(g64, idx):7.3f} ms")


if __name__ == "__main__":
    main()

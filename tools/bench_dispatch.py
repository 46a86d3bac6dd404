#!/usr/bin/env python
"""Calibrate per-dispatch overhead vs in-graph per-op cost on the tunnel TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    import jax
    import jax.numpy as jnp

    R = 262144
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, 2))
    tbl = jax.random.normal(key, (1024 * 1024, 8))
    idx = jax.random.randint(key, (R,), 0, 1024 * 1024)

    f_empty = jax.jit(lambda a: a)
    print("identity jit:            med %.2f min %.2f ms" % timed(f_empty, x))

    f_add = jax.jit(lambda a: a + 1.0)
    print("single add:              med %.2f min %.2f ms" % timed(f_add, x))

    def chain20(a):
        for _ in range(20):
            a = a * 1.0001 + 0.1
        return a

    print("20 chained adds:         med %.2f min %.2f ms" % timed(jax.jit(chain20), x))

    def g1(t, i):
        return t[i]

    def g8(t, i):
        out = 0.0
        for k in range(8):
            out = out + t[jnp.clip(i + k, 0, t.shape[0] - 1)]
        return out

    print("1 row gather:            med %.2f min %.2f ms" % timed(jax.jit(g1), tbl, idx))
    print("8 row gathers:           med %.2f min %.2f ms" % timed(jax.jit(g8), tbl, idx))

    def s2s_many(a):
        from gltf_renderer_tpu.utils.math import square_to_sphere, uv_to_unit_square

        out = 0.0
        for _ in range(8):
            out = out + square_to_sphere(uv_to_unit_square(a))
            a = a * 0.999
        return out

    print("8x square_to_sphere:     med %.2f min %.2f ms" % timed(jax.jit(s2s_many), x))


if __name__ == "__main__":
    main()

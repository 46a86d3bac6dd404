#!/usr/bin/env python
"""Figure out which sync primitive actually blocks on the axon tunnel, using a
matmul of known cost (8k^3 bf16 ~ 1.1 TFLOP ~ 5.6 ms at v5e peak)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def main():
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x, y: (x @ y).sum())

    out = f(a, b)
    jax.block_until_ready(out)
    float(out)

    for name, sync in [
        ("block_until_ready", lambda o: jax.block_until_ready(o)),
        ("float(out)       ", lambda o: float(o)),
        ("device_get       ", lambda o: jax.device_get(o)),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.time()
            o = f(a, b)
            sync(o)
            ts.append((time.time() - t0) * 1e3)
        print(f"{name}: med {np.median(ts):8.2f} ms  min {np.min(ts):8.2f}")

    # K-sweep with the trustworthy sync: per-dispatch cost of a row gather.
    tbl = jax.random.normal(jax.random.PRNGKey(0), (1024 * 1024, 8))
    idx = jax.random.randint(jax.random.PRNGKey(1), (262144,), 0, 1024 * 1024)
    g = jax.jit(lambda t, i: t[i].sum())

    def run_k(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = g(tbl, idx)
        float(o)
        return (time.time() - t0) * 1e3

    run_k(1)
    for k in (1, 4, 16, 64):
        print(f"gather x{k:3d}: {run_k(k):8.2f} ms  ({run_k(k)/k:6.2f} ms/op)")

    # In-graph sequential gathers (data-dependent chain forces seriality).
    def chain(t, i, k):
        acc = jnp.zeros((idx.shape[0], 8))
        for j in range(k):
            rows = t[(i + j) % t.shape[0]]
            acc = acc + rows
            i = (i ^ rows[:, 0].astype(jnp.int32)) % t.shape[0]
        return acc.sum()

    for k in (1, 8, 32):
        ck = jax.jit(lambda t, i, kk=k: chain(t, i, kk))
        o = ck(tbl, idx)
        float(o)
        t0 = time.time()
        o = ck(tbl, idx)
        float(o)
        dt = (time.time() - t0) * 1e3
        print(f"in-graph chained gathers x{k:3d}: {dt:8.2f} ms ({dt/k:6.2f} ms/op)")


if __name__ == "__main__":
    main()

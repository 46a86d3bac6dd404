#!/usr/bin/env python
"""Pin down the XLA gather COST MODEL on the TPU (fixed/row/byte scaling).

Round-4 raster paradox: quad-packing the cube fetch (4x fewer gathered
rows, same bytes) was exactly neutral end-to-end, and 2x chunks (half the
op count, 2x rows/op) was also neutral — yet stage ablations charge the
gather stages ~100-140 ms each. Those three facts pick between models:

  per-op fixed cost      -> 2x chunks should have halved draw time (it didn't)
  per gathered ROW       -> quad-packing should have won 4x on its stage (it didn't)
  per gathered BYTE      -> both neutral (matches!) and bf16 rows halve time

This microbench measures each K times INSIDE one jit (fori_loop with a
data-dependent accumulator so iterations can't be CSE'd), one block at the
end — no RPC pollution (docs/PERFORMANCE.md measurement rule). Index
distribution is uniform-random (matches incoherent shading fetches; primary
rays are tile-coherent which can only be cheaper).

Variants (table height T rows):
  rowsN_wW   one gather of N*R rows, W floats each  (N*W*4 bytes/lane const)
  eltwise    (R, 12) elementwise chain              (no gather, op-cost floor)

Run: python tools/bench_gathermodel.py [R] [K]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    T = 6 * 128 * 128  # cube-pyramid-scale table (98k rows)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, T, R).astype(np.int32))

    print(f"device={jax.devices()[0]} R={R} K={K} T={T}", flush=True)

    def timed(make_body, label, bytes_per_lane):
        body = make_body()

        @jax.jit
        def run(idx):
            def step(i, acc):
                # acc feeds the index so iterations serialize; modulo keeps
                # indices in range while changing the access pattern per step.
                j = (idx + (i + acc.astype(jnp.int32) % 3)) % T
                return acc + body(j)

            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

        out = run(idx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(idx)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / K
        gbs = bytes_per_lane * R / (ms * 1e-3) / 1e9
        print(f"{label:34s} {ms:7.3f} ms/op   {gbs:6.1f} GB/s eff", flush=True)
        return ms

    # Same bytes/lane (48 B), different row structure: 1x48B, 4x12B, 12x4B.
    for n, w in ((1, 12), (4, 3), (12, 1)):
        table = jnp.asarray(rng.rand(T, w).astype(np.float32))

        def make(n=n, w=w, table=table):
            if n == 1:
                return lambda j: table[j].sum()

            def body(j):
                tot = jnp.float32(0.0)
                for k in range(n):
                    tot = tot + table[(j + k) % T].sum()
                return tot

            return body

        timed(make, f"{n} gathers x {w} f32 rows (48 B/lane)", 48)

    # One FUSED gather of 4R rows vs 4 separate gathers of R rows (the
    # sample_cube_level corner pattern), both 48 B/lane.
    table3 = jnp.asarray(rng.rand(T, 3).astype(np.float32))

    def make_fused():
        def body(j):
            j4 = jnp.stack([(j + k) % T for k in range(4)], 1).reshape(-1)
            return table3[j4].sum()

        return body

    timed(make_fused, "1 fused gather of 4R x 12 B rows", 48)

    # Byte scaling at fixed row count: R rows of 8 / 32 / 64 / 128 floats.
    for w in (8, 32, 64, 128):
        table = jnp.asarray(rng.rand(T, w).astype(np.float32))

        def make(table=table):
            return lambda j: table[j].sum()

        timed(make, f"1 gather x {w} f32 rows ({w * 4} B/lane)", w * 4)

    # bf16 vs f32 at equal row WIDTH (half bytes): does dtype halve time?
    for dt, lbl, bpl in ((jnp.float32, "f32", 256), (jnp.bfloat16, "bf16", 128)):
        table = jnp.asarray(rng.rand(T, 64).astype(np.float32)).astype(dt)

        def make(table=table):
            return lambda j: table[j].astype(jnp.float32).sum()

        timed(make, f"1 gather x 64 {lbl} rows ({bpl} B/lane)", bpl)

    # f16 narrow rows vs the same bytes as f32 pairs (bitcast): the PT atlas
    # gather profiled "VMEM Write bound, 4.2 GiB/s" on (N, 4) f16 rows.
    t16 = jnp.asarray(rng.rand(T, 4).astype(np.float16))
    t32 = jax.lax.bitcast_convert_type(t16.reshape(T, 2, 2), jnp.float32)

    def make_f16():
        return lambda j: t16[j].astype(jnp.float32).sum()

    timed(make_f16, "1 gather x 4 f16 rows (8 B/lane)", 8)

    def make_f32pair():
        def body(j):
            g = t32[j]
            return jax.lax.bitcast_convert_type(
                g.reshape(g.shape[0], 2, 1), jnp.float16
            ).reshape(-1, 4).astype(jnp.float32).sum()

        return body

    timed(make_f32pair, "same as f32-pair rows + bitcast", 8)

    # Does XLA fold a slice back INTO the gather (re-creating the 1-wide
    # scalarizing gather)? row[idx][:, 2] vs row[idx, 2].
    t10 = jnp.asarray(rng.rand(T, 10).astype(np.float32))

    def make_col():
        return lambda j: t10[j, 2].sum()

    timed(make_col, "1-wide column gather rows[idx, 2]", 4)

    def make_row_then_slice():
        return lambda j: t10[j][:, 2].sum()

    timed(make_row_then_slice, "row gather then slice [idx][:, 2]", 4)

    # Elementwise floor: a 12-wide fma chain, no gather.
    dense = jnp.asarray(rng.rand(R, 12).astype(np.float32))

    def make_elt():
        def body(j):
            x = dense * (1.0 + j[0].astype(jnp.float32) * 1e-9)
            x = x * 1.0001 + 0.3
            x = x * x + x
            return x.sum()

        return body

    timed(make_elt, "eltwise (R,12) fma chain (no gather)", 48)

    # Row-count scaling at fixed bytes moved per row (12 B): R vs 4R rows.
    tableq = jnp.asarray(rng.rand(T, 12).astype(np.float32))

    def make_quad():
        return lambda j: tableq[j].sum()

    timed(make_quad, "1 gather x R quad rows (48 B/lane)", 48)


if __name__ == "__main__":
    main()

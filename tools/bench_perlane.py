#!/usr/bin/env python
"""On-chip microbench for PER-LANE traversal fetch primitives.

TPU has no per-lane gather from VMEM; a per-lane BVH step must fetch each
lane's node row by one of two mechanisms, both O(table size) per step:

  A. one-hot MXU matmul: fetched = onehot(ids, N) @ table(N, C)
     (bf16; exact for bf16 payloads — conservative bf16 boxes exist).
  B. group-scan register shuffle: for each 128-row group, dynamic_gather
     (jnp.take_along_axis axis=1 on equal-shape 2D operands — the only
     vector-indexed primitive Mosaic lowers) + masked select.

This tool measures both at the real table shapes (helmet/courtyard node
and leaf tables, w16 collapse) and prints us/step for a 2048-ray packet,
to be compared against tools/perlane_study.py break-even budgets
(helmet ~6-13 us/step, courtyard ~7-16 us/step vs the measured packet
kernel). Also measures the onehot-build cost alone, the MXU matmul alone,
and whether take_along_axis lowers in Mosaic at all on this toolchain.

Run on the TPU (tunnel). Pipelined timing per docs/PERFORMANCE.md.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ROWS, LANES = 16, 128  # 2048-ray packet


def timeit_pipe(fn, *args, k=16, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(k):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / k * 1e3  # ms


def make_onehot_kernel(n_rows, n_cols, steps):
    """Per-lane fetch via one-hot matmul, `steps` dependent iterations:
    ids -> onehot (2048, n_rows) bf16 -> @ table (n_rows, n_cols) ->
    fold the fetch back into new ids (forces sequential steps)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ids_ref, table_ref, out_ref):
        ids = ids_ref[:, :]                        # (ROWS, LANES) i32
        acc = jnp.zeros((ROWS, LANES), jnp.float32)
        tbl = table_ref[:, :]                      # (n_rows, n_cols) bf16
        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS * LANES, n_rows), 1)

        def body(i, carry):
            ids, acc = carry
            flat = ids.reshape(ROWS * LANES, 1)
            onehot = (col == flat).astype(jnp.bfloat16)
            fetched = jax.lax.dot_general(
                onehot, tbl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (2048, n_cols) f32
            s = fetched[:, :8].sum(axis=1).reshape(ROWS, LANES)
            acc = acc + s
            ids = (ids + s.astype(jnp.int32) + i) % n_rows
            return ids, acc

        ids, acc = jax.lax.fori_loop(0, steps, body, (ids, acc))
        out_ref[:, :] = acc

    @jax.jit
    def run(ids, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(ids, table)

    return run

def make_shuffle_kernel(n_rows, n_cols, steps):
    """Per-lane fetch via group-scan: table laid out as G groups of
    (n_cols, 128); per group one take_along_axis(axis=1) shuffle with the
    per-lane index, masked-select into the accumulator. Fetches n_cols
    values for each of 128 lanes of ONE packet row; the full packet costs
    ROWS x this (measured per-row, reported x ROWS)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    groups = -(-n_rows // LANES)

    def kernel(ids_ref, table_ref, out_ref):
        ids = ids_ref[0, :]                          # (128,) i32 per-lane ids
        acc = jnp.zeros((n_cols, LANES), jnp.float32)

        def body(i, carry):
            ids, acc = carry
            fetched = jnp.zeros((n_cols, LANES), jnp.float32)
            lo = ids % LANES
            grp = ids // LANES
            idx2 = jnp.broadcast_to(lo[None, :], (n_cols, LANES))
            for g in range(groups):
                part = table_ref[g * n_cols:(g + 1) * n_cols, :]
                shuf = jnp.take_along_axis(part, idx2, axis=1)
                fetched = jnp.where((grp == g)[None, :], shuf, fetched)
            acc = acc + fetched
            ids = (ids + fetched[0, :].astype(jnp.int32) + i) % n_rows
            return ids, acc

        ids, acc = jax.lax.fori_loop(0, steps, body, (ids, acc))
        out_ref[:, :] = acc

    @jax.jit
    def run(ids, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_cols, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(ids, table)

    return run


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    STEPS = 32

    # (label, n_rows, n_cols) — real w16 table shapes from perlane_study:
    #   helmet nodes 741x(96 box + base/meta) ; helmet leaves 4362x160;
    #   courtyard nodes 6293x112; courtyard leaves 23604x160 (hopeless, for
    #   the record).
    shapes = [
        ("helmet-node   ", 768, 112),
        ("helmet-leaf   ", 4480, 160),
        ("courtyard-node", 6400, 112),
    ]

    print("\n=== A. one-hot MXU matmul fetch (full 2048-ray packet/step) ===")
    for label, n, c in shapes:
        ids = jnp.asarray(rng.randint(0, n, (ROWS, LANES)), jnp.int32)
        table = jnp.asarray(rng.rand(n, c), jnp.bfloat16)
        try:
            run = make_onehot_kernel(n, c, STEPS)
            ms = timeit_pipe(run, ids, table)
            us_step = ms * 1e3 / STEPS
            flop = 2 * ROWS * LANES * n * c * STEPS
            print(f"  {label} ({n:5d}x{c:3d}): {us_step:8.2f} us/step "
                  f"({flop / (ms * 1e-3) / 1e12:5.1f} TFLOP/s eff)")
        except Exception as e:
            print(f"  {label}: FAILED: {type(e).__name__}: {str(e)[:200]}")

    print("\n=== B. group-scan shuffle fetch (ONE 128-ray row/step) ===")
    for label, n, c in shapes:
        ids = jnp.asarray(rng.randint(0, n, (1, LANES)), jnp.int32)
        table = jnp.asarray(rng.rand(-(-n // LANES) * c, LANES), jnp.float32)
        try:
            run = make_shuffle_kernel(n, c, STEPS)
            ms = timeit_pipe(run, ids, table)
            us_step = ms * 1e3 / STEPS
            print(f"  {label} ({n:5d}x{c:3d}): {us_step:8.2f} us/step/row "
                  f"-> x{ROWS} rows = {us_step * ROWS:8.2f} us/packet-step")
        except Exception as e:
            print(f"  {label}: FAILED: {type(e).__name__}: {str(e)[:200]}")

    print("\nBudgets (perlane_study): helmet node-step <= ~6.4 us, uniform "
          "<= ~12.8 us; courtyard node-step <= ~9.3 us, uniform <= ~15.8 us.")


if __name__ == "__main__":
    main()

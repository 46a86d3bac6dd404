"""Pallas TPU packet-traversal kernel for BVH closest-hit / any-hit.

TPU-native replacement for DXR TraceRay (Pathtracer.cpp:344-353): the packed
4-wide BVH (ops/bvh.build_wide_maps/assemble_wide) lives in VMEM and each grid
step traverses ONE PACKET of PACKET_ROWS x 128 rays with a DFS stack in SMEM.

The shape of this kernel is dictated by measured TPU latencies (tools/
bench_sort.py lineage, docs/PERFORMANCE.md):

  - A traversal step's critical path (SMEM pop -> dynamic VMEM row load ->
    vector box tests -> cross-lane reduce -> scalar push) is ~650 ns of
    LATENCY, while its vector work is only ~100 ns. Scalar extracts from a
    loaded row cost ~4 ns each — essentially free.
  - Therefore: (a) packets are BIG — 16 rows = 2048 rays — each chain
    latency is paid once per 2048 rays (measured optimum with pipelined
    timing: 16-row packets beat 8- and 32-row on both primary and full
    frame; the union effect takes over for larger packets); (b) leaf triangle tests are NOT
    run at pop time — leaf entries are buffered in an SMEM queue and flushed
    4 at a time (the 4 leaf tests are independent, so they pipeline);
    (c) the 4 per-child cross-lane any() reductions are folded into 2 summed
    reductions (counts packed in 11-bit fields).
  - Descent is branch-free: a popped leaf box-tests a DUMMY node row
    (far-point boxes that never hit -> zero pushes) instead of taking a
    lax.cond branch per entry type.

Deferred leaf processing means descent prunes on a t_best that lags by up to
3 leaves — a few extra node visits, repaid many times by the pipelining.

Lanes whose interval is empty (t_min > t_max) are dead and never extend
traversal; any_hit mode collapses a lane's t_best to NEG_BIG on its first
accepted hit so the lane stops driving descent (ACCEPT_FIRST_HIT semantics,
PathTracer.lib.hlsl:1053-1079). any_hit="lane" mixes closest and any-hit
rays in one dispatch (per-lane mode input — the merged bounce+shadow path).

Coherent packets visit near the per-ray optimum; incoherent bounce/shadow
packets degrade toward the union — the path tracer tile-orders primary rays
and locality+octant-sorts secondary rays before dispatch (render/pathtracer).
Nodes+meta must fit VMEM; leaf geometry either resides in VMEM (small
scenes) or stays in HBM with per-flush DMA (leaf_hbm — 1M+-tri scenes).
Scenes whose NODE tables bust the budget fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gltf_renderer_tpu.ops.bvh import (
    LEAF_SIZE,
    REC_GEO,
    WIDE_LEAF_BIT,
    WIDE_ID_MASK,
)

PACKET_ROWS = 16         # rays per packet = PACKET_ROWS * 128 = 2048
LANES = 128
MAX_STACK = 1024         # multi-pop explores ~POP paths concurrently: bound
                         # ~ POP * 3 * depth entries; 4 KB SMEM is cheap
QCAP = 16                # leaf queue slots (inner loop exit leaves <= FLUSH-1
                         # + POP entries pending)
FLUSH = 4                # leaves per flush batch
PACKET = PACKET_ROWS * LANES
NEG_BIG = -3.0e38  # python literal: a jnp constant would be captured as input


def _default_pop():
    import os

    try:
        return max(1, int(os.environ.get("GLTF_TPU_POP", "1")))
    except ValueError:
        return 1


def pack_leaf_tiles(records: np.ndarray, words: np.ndarray) -> np.ndarray:
    """(N, REC_GEO) f32 geometry + (N, LEAF_SIZE) i32 words -> (N, 8, 128)
    f32 leaf tiles for the leaf_hbm kernel.

    One leaf = one (8, 128) tile: flat lanes [0, REC_GEO) hold the geometry
    row, [REC_GEO, REC_GEO+LEAF_SIZE) hold the id words bitcast to f32 (the
    kernel bitcasts the row back to i32 in vector space). Mosaic DMA can
    only move 8-row-aligned slices of a 2-D tiled table, so per-leaf copies
    need the leaf to BE a tile — one DMA per leaf instead of two, at the
    cost of padding 160 useful lanes to 1024 (the copies are latency-bound
    at this size, so the extra bytes are free; HBM cost ~4 KB/leaf)."""
    records = np.asarray(records, np.float32)
    words = np.ascontiguousarray(np.asarray(words, np.int32))
    n = records.shape[0]
    assert records.shape[1] == REC_GEO and words.shape[1] == LEAF_SIZE
    assert REC_GEO + LEAF_SIZE <= 2 * LANES
    flat = np.zeros((n, 8 * LANES), np.float32)
    flat[:, :REC_GEO] = records
    flat[:, REC_GEO:REC_GEO + LEAF_SIZE] = words.view(np.float32)
    return flat.reshape(n, 8, LANES)


def pack_leaf_tiles_jnp(records, words):
    """jit-able pack_leaf_tiles (the per-frame refit path repacks on-device)."""
    n = records.shape[0]
    wf = jax.lax.bitcast_convert_type(words.astype(jnp.int32), jnp.float32)
    flat = jnp.zeros((n, 8 * LANES), jnp.float32)
    flat = flat.at[:, :REC_GEO].set(records)
    flat = flat.at[:, REC_GEO:REC_GEO + LEAF_SIZE].set(wf)
    return flat.reshape(n, 8, LANES)


# Stack entries popped per descent iteration. Multi-pop (POP>1) runs POP
# independent pop->load->test chains per loop iteration — measured
# END-TO-END NEUTRAL on a v5e (bench: POP=4 2.78 vs POP=1 2.86 Mrays/s
# no-sort; identical in kernel isolation too): the saved loop iterations are
# paid back in per-iteration vector work (4x box tests) and scalar pushes.
# Kept as a knob for future hardware where the loop overhead dominates the
# box-test vector cost; POP=1 also compiles ~4x faster.
POP = _default_pop()


def _traverse_kernel(
    nodes_ref,    # (N4+1, 24) VMEM wide box rows (f32; last row = dummy)
    meta_ref,     # (N4+1, 4) VMEM wide child meta words (i32)
    recs_ref,     # (N, REC_GEO) leaf geometry (f32) — VMEM, or HBM/ANY when
    words_ref,    # (N, LEAF_SIZE) id/flag words (i32)    leaf_hbm (DMA'd)
    ox_ref, oy_ref, oz_ref,       # (PACKET_ROWS, 128) VMEM
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    *rest,
    # rest = [mode_ref?] + outputs (t, u, v, word) + scratch (stack, queue,
    # [rec_buf, word_buf, dma_sem when leaf_hbm])
    root_meta: int,
    any_hit,      # True | False | "lane" (per-lane mode_ref input present)
    cull_sign: int,
    blend_mode: int,
    dummy_id: int,
    leaf_hbm: bool = False,
):
    from gltf_renderer_tpu.ops.bvh import BLEND_EXCLUDE, BLEND_ONLY, FLAG_BLEND, FLAG_DOUBLE_SIDED

    rec_buf = dma_sem = None
    if any_hit == "lane":
        if leaf_hbm:
            (mode_ref, t_ref, u_ref, v_ref, word_ref, stack_ref, queue_ref,
             rec_buf, dma_sem) = rest
        else:
            mode_ref, t_ref, u_ref, v_ref, word_ref, stack_ref, queue_ref = rest
    else:
        mode_ref = None
        if leaf_hbm:
            (t_ref, u_ref, v_ref, word_ref, stack_ref, queue_ref,
             rec_buf, dma_sem) = rest
        else:
            t_ref, u_ref, v_ref, word_ref, stack_ref, queue_ref = rest

    big = jnp.float32(1e30)

    def load_packet():
        ox = ox_ref[:, :]
        oy = oy_ref[:, :]
        oz = oz_ref[:, :]
        dx = dx_ref[:, :]
        dy = dy_ref[:, :]
        dz = dz_ref[:, :]
        t_min = tmin_ref[:, :]
        t_cap = tmax_ref[:, :]
        inv_x = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, jnp.sign(dx) * big + big)
        inv_y = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, jnp.sign(dy) * big + big)
        inv_z = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, jnp.sign(dz) * big + big)
        lane_any = (mode_ref[:, :] > 0) if mode_ref is not None else None
        return dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                    inv_x=inv_x, inv_y=inv_y, inv_z=inv_z,
                    t_min=t_min, t_cap=t_cap, lane_any=lane_any)

    n_child = meta_ref.shape[1]          # 4- or 8-wide nodes (static)

    def descent_step(sp, qn, sbase, qbase, pend, t_best, rays):
        """Two-deep software-pipelined MULTI-pop: the pushes applied here
        were decided TWO iterations ago — their cross-lane reduces (the long
        pole of the serial pop->load->test->reduce->push chain) get a full
        iteration of slack, so the chain through the stack is only
        push(scalar)->pop(scalar). Each iteration then pops up to POP
        entries at once: the POP pop->load->test chains are independent
        (scalar extracts ~4 ns, dynamic VMEM row loads free — measured), so
        they pipeline, and the ~485 ns/iteration loop overhead is paid once
        per POP nodes instead of per node. The traversal order is
        "almost-DFS, POP paths at a time".

        Branch-free: leaves (and idle packets) box-test the dummy row, whose
        far-point boxes never hit, so their deferred pushes are zero."""
        # pend: POP groups of (sums, metas): sums[i] packs children (2i,
        # 2i+1)'s lane counts in 14-bit fields; metas are the n_child meta
        # words. All n_child*POP push slots store IN PARALLEL: addresses come
        # from a running prefix over the push bits (plain scalar adds, ~1
        # cycle each) and slots that do NOT push write the trash slot (index
        # MAX_STACK) — so no store's address waits on another store
        # completing. Push order: group POP-1 first so group 0 (the earliest
        # pop, nearest by build order) ends on top; within a group
        # c = n_child-1..0 so child 0 pops first.
        seq = []
        for g in range(len(pend) - 1, -1, -1):
            sums, metas = pend[g]
            for c in range(n_child - 1, -1, -1):
                s = sums[c // 2]
                b = (((s >> 14) if (c & 1) else (s & 16383)) > 0).astype(jnp.int32)
                seq.append((b, metas[c]))
        acc = jnp.int32(0)
        for b, m in seq:
            addr = jnp.where(b > 0, jnp.minimum(sp + acc, MAX_STACK), MAX_STACK)
            stack_ref[sbase + addr] = m
            acc = acc + b
        sp = jnp.minimum(sp + acc, MAX_STACK)

        groups = []
        qacc = jnp.int32(0)
        for j in range(POP):
            active = sp > j
            entry = stack_ref[sbase + jnp.maximum(sp - 1 - j, 0)]
            e_is_leaf = jnp.logical_and(active, (entry & WIDE_LEAF_BIT) != 0)
            e_is_int = jnp.logical_and(active, (entry & WIDE_LEAF_BIT) == 0)
            node = jnp.where(e_is_int, entry & WIDE_ID_MASK, dummy_id)
            nrow = nodes_ref[node, :]
            packed16 = nrow.dtype == jnp.int32
            if packed16:
                # bf16 node table (GLTF_TPU_BF16BOX) ships as int32 words
                # (two bf16 box values per word — Mosaic cannot dynamically
                # row-index a bf16 VMEM table). Expand to f32 in VECTOR space
                # before the scalar extracts: bf16 -> f32 is a 16-bit left
                # shift; even values live in the low half, odd in the high.
                row_lo = jax.lax.bitcast_convert_type(
                    nrow << 16, jnp.float32)
                row_hi = jax.lax.bitcast_convert_type(
                    nrow & jnp.int32(-65536), jnp.float32)
            mrow = meta_ref[node, :]
            bits = []
            for c in range(n_child):
                if packed16:
                    lox, loy = row_lo[3 * c], row_hi[3 * c]
                    loz, hix = row_lo[3 * c + 1], row_hi[3 * c + 1]
                    hiy, hiz = row_lo[3 * c + 2], row_hi[3 * c + 2]
                else:
                    lox, loy, loz = nrow[6 * c], nrow[6 * c + 1], nrow[6 * c + 2]
                    hix, hiy, hiz = nrow[6 * c + 3], nrow[6 * c + 4], nrow[6 * c + 5]
                tx0 = (lox - rays["ox"]) * rays["inv_x"]
                tx1 = (hix - rays["ox"]) * rays["inv_x"]
                ty0 = (loy - rays["oy"]) * rays["inv_y"]
                ty1 = (hiy - rays["oy"]) * rays["inv_y"]
                tz0 = (loz - rays["oz"]) * rays["inv_z"]
                tz1 = (hiz - rays["oz"]) * rays["inv_z"]
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                box_hit = (tf >= jnp.maximum(tn, rays["t_min"])) & (tn <= t_best)
                bits.append(box_hit.astype(jnp.int32))
            # n_child/2 cross-lane reductions per group instead of n_child:
            # lane counts (<= 4096) packed in 14-bit fields survive an
            # integer sum exactly. Results are NOT consumed here — they are
            # applied at the top of the iteration after next.
            sums = tuple(
                jnp.sum(bits[2 * i] + (bits[2 * i + 1] << 14))
                for i in range(n_child // 2)
            )
            # Leaf entries buffer into the SMEM queue (flushed in batches);
            # same parallel-store-with-trash-slot scheme as the stack pushes.
            lf = e_is_leaf.astype(jnp.int32)
            qaddr = jnp.where(lf > 0, jnp.minimum(qn + qacc, QCAP), QCAP)
            queue_ref[qbase + qaddr] = entry & WIDE_ID_MASK
            qacc = qacc + lf
            groups.append((sums, tuple(mrow[c] for c in range(n_child))))
        qn = jnp.minimum(qn + qacc, QCAP)
        sp = jnp.maximum(sp - POP, 0)
        return sp, qn, tuple(groups)

    def dma_start(qn, qbase):
        """Start the FLUSH leaf-tile copies for the queue's top FLUSH
        entries; all start before any wait so the ~1-2 us latencies overlap
        each other. Duplicate clamped reads re-copy a tile — idempotent.

        Each leaf is ONE (8, 128) f32 tile (pack_leaf_tiles: geometry rows +
        bitcast id words). Mosaic requires DMA slices of a 2-D tiled table
        to be 8-row aligned — a dynamic per-leaf row index cannot be proven
        aligned ("Slice shape along dimension 0 must be aligned to tiling
        (8), but is 1", measured on v5e) — so the table is 3-D (N, 8, 128)
        and .at[leaf] moves a whole aligned tile."""
        for j in range(FLUSH):
            leaf = queue_ref[qbase + jnp.maximum(qn - 1 - j, 0)]
            pltpu.make_async_copy(
                recs_ref.at[leaf], rec_buf.at[j], dma_sem.at[j],
            ).start()

    def dma_wait():
        # Reconstructed descriptors wait on the same semaphores for the same
        # (static) byte counts — the tile index doesn't matter for the wait.
        for j in range(FLUSH):
            pltpu.make_async_copy(
                recs_ref.at[0], rec_buf.at[j], dma_sem.at[j],
            ).wait()

    def leaf_compute(best, rays):
        """Per-leaf triangle tests over the DMA'd buffers (leaf_hbm) —
        factored so the prefetch pipeline can run them a descent-run after
        the copies started (dma_wait first: the batch may still be in
        flight if the interleaved descent run was short)."""
        dma_wait()
        return _leaf_tests(0, best, 0, rays, use_buf=True)

    def leaf_flush(qn, best, qbase, rays):
        """Test FLUSH buffered leaves (clamped duplicate reads pad short
        queues — re-testing a leaf is idempotent for every accept rule).

        leaf_hbm: leaf rows live in HBM; the FLUSH x 2 row copies all start
        before the first wait, so their ~1-2 us DMA latencies overlap each
        other (and the tail of the preceding descent run) instead of
        serializing."""
        if leaf_hbm:
            dma_start(qn, qbase)
            dma_wait()
        best = _leaf_tests(qn, best, qbase, rays, use_buf=bool(leaf_hbm))
        return jnp.maximum(qn - FLUSH, 0), best

    def _leaf_tests(qn, best, qbase, rays, use_buf):
        t_b, u_b, v_b, w_b = best
        t_min = rays["t_min"]
        t_cap = rays["t_cap"]
        lane_any = rays["lane_any"]
        for j in range(FLUSH):
            if use_buf:
                # DMA'd leaf tile (pack_leaf_tiles): geometry occupies flat
                # lanes [0, REC_GEO) = tile rows 0-1; the LEAF_SIZE id words
                # ride bitcast-as-f32 at flat [REC_GEO, REC_GEO+LEAF_SIZE).
                tile = rec_buf[j]
                row0 = tile[0, :]
                row1 = tile[1, :]
                wvec = jax.lax.bitcast_convert_type(row1, jnp.int32)

                def rval(i, row0=row0, row1=row1):
                    return row0[i] if i < LANES else row1[i - LANES]

                def wval(k, wvec=wvec):
                    return wvec[REC_GEO - LANES + k]
            else:
                leaf = queue_ref[qbase + jnp.maximum(qn - 1 - j, 0)]
                rrow = recs_ref[leaf, :]
                wrow = words_ref[leaf, :]

                def rval(i, rrow=rrow):
                    return rrow[i]

                def wval(k, wrow=wrow):
                    return wrow[k]
            for k in range(LEAF_SIZE):
                p0x, p0y, p0z = rval(9 * k), rval(9 * k + 1), rval(9 * k + 2)
                e1x, e1y, e1z = rval(9 * k + 3), rval(9 * k + 4), rval(9 * k + 5)
                e2x, e2y, e2z = rval(9 * k + 6), rval(9 * k + 7), rval(9 * k + 8)
                word = wval(k)

                # Möller–Trumbore (components, vector over packet).
                pvx = rays["dy"] * e2z - rays["dz"] * e2y
                pvy = rays["dz"] * e2x - rays["dx"] * e2z
                pvz = rays["dx"] * e2y - rays["dy"] * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = rays["ox"] - p0x
                tvy = rays["oy"] - p0y
                tvz = rays["oz"] - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (rays["dx"] * qvx + rays["dy"] * qvy + rays["dz"] * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                h = (
                    (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt > t_min)
                    & (tt < t_b)
                )
                h = jnp.logical_and(h, word >= 0)
                if blend_mode == BLEND_EXCLUDE:
                    h = jnp.logical_and(h, (word & FLAG_BLEND) == 0)
                elif blend_mode == BLEND_ONLY:
                    h = jnp.logical_and(h, (word & FLAG_BLEND) != 0)
                if cull_sign:
                    culled = (det * cull_sign < 0.0) & ((word & FLAG_DOUBLE_SIDED) == 0)
                    if any_hit == "lane":
                        # Mixed dispatch: culling applies to the closest-hit
                        # (bounce) lanes only; shadow any-hit lanes never cull.
                        culled = culled & jnp.logical_not(lane_any)
                    h = jnp.logical_and(h, jnp.logical_not(culled))
                if any_hit == "lane":
                    # Any-hit lanes retire on first accept (t_best -> NEG_BIG
                    # kills every later box/tri test for them); closest lanes
                    # shrink t_best normally.
                    t_b = jnp.where(h, jnp.where(lane_any, NEG_BIG, tt), t_b)
                elif any_hit:
                    # First accepted hit retires the lane.
                    t_b = jnp.where(h, NEG_BIG, t_b)
                else:
                    t_b = jnp.where(h, tt, t_b)
                u_b = jnp.where(h, uu, u_b)
                v_b = jnp.where(h, vv, v_b)
                w_b = jnp.where(h, word, w_b)
        return (t_b, u_b, v_b, w_b)

    rays = load_packet()

    best0 = (
        rays["t_cap"],
        jnp.zeros_like(rays["t_cap"]),
        jnp.zeros_like(rays["t_cap"]),
        jnp.full(rays["t_cap"].shape, -1, jnp.int32),
    )
    # Seed the two-deep pipeline with a pending "push the root" (count 1 in
    # field 0 of group 0) one stage out and an empty stage behind it.
    zero = jnp.int32(0)
    empty_group = ((zero,) * (n_child // 2), (zero,) * n_child)
    root_group = (
        (jnp.int32(1),) + (zero,) * (n_child // 2 - 1),
        (jnp.int32(root_meta),) + (zero,) * (n_child - 1),
    )
    pend0 = (root_group,) + (empty_group,) * (POP - 1)
    pend_none = (empty_group,) * POP

    # Two-level loop: the HOT inner loop is pure descent with no lax.cond at
    # all (a big-branch cond in the hot loop taxes every iteration with the
    # region's state spill, measured ~0.3-0.5 us/iter); it exits when the
    # leaf queue fills or the stack drains. The outer loop flushes between
    # inner runs (~leaves/FLUSH times per packet, not once per pop).
    def live(state):
        sp, _qn, pend_a, pend_b, _best = state
        pending = jnp.int32(0)
        for sums, _metas in pend_a + pend_b:
            for s in sums:
                pending = pending | s
        return (sp > 0) | (pending != 0)

    def inner_cond(state):
        return live(state) & (state[1] < FLUSH)

    def inner_body(state):
        sp, qn, pend_a, pend_b, best = state
        # Apply stage A (from 2 iterations ago); the fresh sums become the
        # new stage B, and the old B shifts into A for the next iteration.
        sp, qn, pend_new = descent_step(sp, qn, 0, 0, pend_a, best[0], rays)
        return sp, qn, pend_b, pend_new, best

    if leaf_hbm == 2:
        # PREFETCH pipeline: a full batch's DMAs start as soon as the queue
        # fills, its triangle tests run one descent-run LATER — the copy
        # latency hides behind the next inner descent instead of stalling
        # the flush. t_best for descent pruning lags one extra batch (same
        # tradeoff class as the deferred leaf queue itself).
        def live_pf(state):
            sp, qn, pend_a, pend_b, _best, dmap = state
            return (
                live((sp, qn, pend_a, pend_b, _best))
                | (dmap > 0) | (qn >= FLUSH)
            )

        def outer_body_pf(state):
            sp, qn, pend_a, pend_b, best, dmap = state
            sp, qn, pend_a, pend_b, best = jax.lax.while_loop(
                inner_cond, inner_body, (sp, qn, pend_a, pend_b, best)
            )
            best = jax.lax.cond(
                dmap > 0, lambda b: leaf_compute(b, rays), lambda b: b, best
            )

            def start(q):
                dma_start(q, 0)
                return jnp.maximum(q - FLUSH, 0), jnp.int32(1)

            qn, dmap = jax.lax.cond(
                qn >= FLUSH, start, lambda q: (q, jnp.int32(0)), qn
            )
            return sp, qn, pend_a, pend_b, best, dmap

        _, qn, _, _, best, _ = jax.lax.while_loop(
            live_pf, outer_body_pf, (0, 0, pend0, pend_none, best0, jnp.int32(0))
        )
    else:
        def outer_body(state):
            state = jax.lax.while_loop(inner_cond, inner_body, state)
            sp, qn, pend_a, pend_b, best = state
            qn, best = jax.lax.cond(
                qn >= FLUSH,
                lambda q, b: leaf_flush(q, b, 0, rays),
                lambda q, b: (q, b), qn, best,
            )
            return sp, qn, pend_a, pend_b, best

        _, qn, _, _, best = jax.lax.while_loop(
            live, outer_body, (0, 0, pend0, pend_none, best0)
        )

    # Drain leftover queued leaves (< FLUSH of them; clamped reads duplicate).
    _, best = jax.lax.while_loop(
        lambda s: s[0] > 0,
        lambda s: leaf_flush(s[0], s[1], 0, rays),
        (qn, best),
    )

    t_ref[:, :] = best[0]
    u_ref[:, :] = best[1]
    v_ref[:, :] = best[2]
    word_ref[:, :] = best[3]


@functools.partial(
    jax.jit,
    static_argnames=("root_meta", "any_hit", "cull_sign", "blend_mode",
                     "interpret", "leaf_hbm"),
)
def traverse_packets_wide(
    wide_nodes,  # (N4, 24) f32 box rows
    wide_meta,   # (N4, 4) i32 child meta words
    records,     # (N, REC_GEO) f32 leaf geometry — or (N, 8, 128) f32
    #              pack_leaf_tiles tiles when leaf_hbm (words then unused)
    words,       # (N, LEAF_SIZE) i32 id/flag words
    origin,      # (R, 3)
    direction,   # (R, 3)
    t_min,       # (R,)
    t_max,       # (R,)
    root_meta: int = 0,
    any_hit=False,  # False | True | "lane" (then `mode` (R,) i32 required)
    cull_sign: int = 0,
    blend_mode: int = 0,
    interpret: bool = False,
    mode=None,   # (R,) int32: >0 = any-hit lane (any_hit == "lane" only)
    leaf_hbm: bool = False,  # leaf records/words stay in HBM and are DMA'd
    # per flush batch — lifts the VMEM ceiling from ~800k tris to HBM size
    # (the 53 MB courtyard2 leaf table vs a 36 MB budget; nodes+meta for
    # 1.1M tris are only ~5 MB and stay resident)
):
    """Packet traversal over all rays. Returns (t, tri_word, u, v) flat (R,).

    Rays are padded to a multiple of PACKET (4096); each grid step runs one
    32-row packet. In any_hit mode (global or per-lane), a hit lane reports
    word >= 0 and t is NOT meaningful.
    """
    r = origin.shape[0]
    n_pack = -(-r // PACKET)
    pad = n_pack * PACKET - r

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full(pad, fill, x.dtype)]) if pad else x
        return x.reshape(n_pack * PACKET_ROWS, LANES)

    ox = prep(origin[:, 0], 0.0)
    oy = prep(origin[:, 1], 0.0)
    oz = prep(origin[:, 2], 0.0)
    dx = prep(direction[:, 0], 1.0)
    dy = prep(direction[:, 1], 0.0)
    dz = prep(direction[:, 2], 0.0)
    tmn = prep(t_min, 1.0)
    tmx = prep(jnp.broadcast_to(t_max, t_min.shape), 0.0)  # pad: t_max < t_min

    # Dummy node row: far-point boxes that never hit (same sentinel as empty
    # wide children, ops/bvh._EMPTY_BOX) — popped leaves box-test this row.
    dummy_id = wide_nodes.shape[0]
    if wide_nodes.dtype == jnp.int32:
        # i32-PACKED conservative bf16 boxes (GLTF_TPU_BF16BOX,
        # bvh.pack_bf16_pairs): dummy row = bf16(3e38) in both halves
        # (3e38 is representable in bf16, max ~3.39e38).
        import ml_dtypes

        bf_bits = np.asarray(3.0e38, ml_dtypes.bfloat16).view(np.uint16)
        word = np.int32(
            np.uint32(bf_bits) | (np.uint32(bf_bits) << np.uint32(16))
        )
        dummy_row = jnp.full((1, wide_nodes.shape[1]), word, jnp.int32)
    else:
        dummy_row = jnp.full((1, wide_nodes.shape[1]), 3.0e38, wide_nodes.dtype)
    nodes_x = jnp.concatenate([wide_nodes, dummy_row])
    meta_x = jnp.concatenate(
        [wide_meta, jnp.full((1, wide_meta.shape[1]), WIDE_LEAF_BIT, jnp.int32)]
    )

    grid = (n_pack,)
    ray_spec = pl.BlockSpec(
        (PACKET_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel,
        root_meta=root_meta,
        any_hit=any_hit,
        cull_sign=cull_sign,
        blend_mode=blend_mode,
        dummy_id=dummy_id,
        leaf_hbm=leaf_hbm,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.int32),
    ]
    extra = []
    n_ray_specs = 8
    if any_hit == "lane":
        extra = [prep(mode.astype(jnp.int32), 0)]
        n_ray_specs = 9
    scratch = [
        # +1: index MAX_STACK / QCAP is the trash slot for parallel
        # stores whose push bit is 0 (see descent_step).
        pltpu.SMEM((MAX_STACK + 1,), jnp.int32),
        pltpu.SMEM((QCAP + 1,), jnp.int32),
    ]
    if leaf_hbm:
        # Leaf tables ride as ONE (8, 128) f32 tile per leaf (pack_leaf_tiles
        # — geometry + bitcast id words) in unpinned/HBM memory; the kernel
        # DMAs whole aligned tiles (see dma_start). The words operand is a
        # placeholder: the kernel's hbm branch never reads it.
        if records.ndim != 3 or records.shape[1:] != (8, LANES):
            raise ValueError(
                "leaf_hbm needs pack_leaf_tiles records (N, 8, 128); got "
                f"{records.shape}"
            )
        words_in = jnp.zeros((8, LANES), jnp.int32)
        leaf_specs = [pl.BlockSpec(memory_space=pl.ANY), table_spec]
        scratch += [
            pltpu.VMEM((FLUSH, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((FLUSH,)),
        ]
    else:
        words_in = words
        leaf_specs = [table_spec, table_spec]
    t, u, v, word = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * 2 + leaf_specs + [ray_spec] * n_ray_specs,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nodes_x, meta_x, records, words_in, ox, oy, oz, dx, dy, dz, tmn, tmx,
      *extra)

    t = t.reshape(-1)[:r]
    u = u.reshape(-1)[:r]
    v = v.reshape(-1)[:r]
    word = word.reshape(-1)[:r]
    return t, word, u, v


def traverse_packets(
    packed,
    origin,
    direction,
    t_min,
    t_max,
    any_hit: bool = False,
    cull_sign: int = 0,
    blend_mode: int = 0,
    interpret: bool = False,
    width: int = 4,
):
    """Compatibility wrapper over a binary PackedBVH: builds the wide tables
    on the fly (tests / tools). Hot paths pass prebuilt wide tables via
    traverse_packets_wide."""
    from gltf_renderer_tpu.ops import bvh as bvh_ops

    nodes_np = np.asarray(packed.nodes)
    is_leaf = nodes_np[:, 6] >= 0.0
    skip = nodes_np[:, 7].astype(np.int32)
    n = nodes_np.shape[0]
    # Recover `right` links: right child of internal node i is skip[i + 1].
    right = np.full(n, -1, np.int32)
    internal = ~is_leaf
    right[internal] = skip[np.clip(np.nonzero(internal)[0] + 1, 0, n - 1)]
    tree = bvh_ops.FlatBVH(
        aabb_min=nodes_np[:, 0:3], aabb_max=nodes_np[:, 3:6],
        first=np.maximum(nodes_np[:, 6], 0).astype(np.int32),
        count=is_leaf.astype(np.int32), skip=skip, right=right,
        tri_order=None, levels=None,
    )
    maps, root_meta = bvh_ops.build_wide_maps(tree, width=width)
    wide = bvh_ops.assemble_wide(packed.nodes, maps)
    leaf_ids = jnp.asarray(maps.leaf_ids)
    return traverse_packets_wide(
        wide, jnp.asarray(maps.meta), packed.records[leaf_ids],
        packed.words[leaf_ids],
        origin, direction, t_min, t_max,
        root_meta=root_meta, any_hit=any_hit, cull_sign=cull_sign,
        blend_mode=blend_mode, interpret=interpret,
    )

"""Pallas TPU packet-traversal kernel for BVH closest-hit / any-hit.

TPU-native replacement for DXR TraceRay (Pathtracer.cpp:344-353): the packed
4-wide BVH (ops/bvh.build_wide_maps/assemble_wide) lives in VMEM and each grid
step traverses ONE PACKET of rays (PACKET_ROWS x 128, the VPU register shape)
with a shared DFS stack in SMEM:

  - node fetch     = scalar dynamic loads from the VMEM wide-node table
  - AABB/triangle  = full-width (rows, 128) vector ops on the VPU
  - stack control  = scalar SMEM ops inside a while loop
  - packet prune   = push a child only if ANY live ray hits its box

The 4-wide layout exists because the while-loop iteration (pop + slab +
cross-lane any + push) has ~300 ns of scalar/sync latency on TPU — testing 4
child boxes per iteration amortizes it 4x vs a binary tree, and LEAF_SIZE=8
halves leaf pops. Lanes whose interval is empty (t_min > t_max) are dead and
never extend traversal; any_hit mode collapses a lane's t_best to -inf on its
first accepted hit so the lane stops driving descent (ACCEPT_FIRST_HIT
semantics, PathTracer.lib.hlsl:1053-1079).

Coherent packets visit near the per-ray optimum; incoherent bounce/shadow
packets degrade toward the union — the path tracer octant-sorts those before
dispatch (render/pathtracer.trace order). Scenes must fit VMEM; larger scenes
fall back to the XLA path (render/pathtracer chooses).
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

PACKET_ROWS = 8          # rays per packet = PACKET_ROWS * 128
LANES = 128
MAX_STACK = 96
PACKET = PACKET_ROWS * LANES
NEG_BIG = -3.0e38  # python literal: a jnp constant would be captured as input


def _traverse_kernel(
    nodes_ref,    # (N4, 24) VMEM wide box rows (f32)
    meta_ref,     # (N4, 4) VMEM wide child meta words (i32)
    recs_ref,     # (N, REC_GEO) VMEM binary leaf geometry (f32)
    words_ref,    # (N, LEAF_SIZE) VMEM id/flag words (i32)
    ox_ref, oy_ref, oz_ref,       # (ROWS, 128) VMEM per packet
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    # outputs
    t_ref, u_ref, v_ref, word_ref,
    # scratch
    stack_ref,    # SMEM (MAX_STACK,) int32
    *,
    root_meta: int,
    any_hit: bool,
    cull_sign: int,
    blend_mode: int,
):
    from gltf_renderer_tpu.ops.bvh import BLEND_EXCLUDE, BLEND_ONLY, FLAG_BLEND, FLAG_DOUBLE_SIDED

    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]
    t_min = tmin_ref[:, :]
    t_cap = tmax_ref[:, :]

    big = jnp.float32(1e30)
    inv_x = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, jnp.sign(dx) * big + big)
    inv_y = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, jnp.sign(dy) * big + big)
    inv_z = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, jnp.sign(dz) * big + big)

    stack_ref[0] = root_meta

    def cond(state):
        sp, _best = state
        return sp > 0

    def body(state):
        sp, best = state
        t_best, u_best, v_best, w_best = best
        entry = stack_ref[sp - 1]
        sp = sp - 1
        is_leaf = (entry & WIDE_LEAF_BIT) != 0

        def handle_leaf(sp):
            node = entry & WIDE_ID_MASK
            rrow = recs_ref[node, :]
            wrow = words_ref[node, :]
            tb, ub, vb, wb = t_best, u_best, v_best, w_best
            for k in range(LEAF_SIZE):
                p0x, p0y, p0z = rrow[9 * k], rrow[9 * k + 1], rrow[9 * k + 2]
                e1x, e1y, e1z = rrow[9 * k + 3], rrow[9 * k + 4], rrow[9 * k + 5]
                e2x, e2y, e2z = rrow[9 * k + 6], rrow[9 * k + 7], rrow[9 * k + 8]
                word = wrow[k]

                # Möller–Trumbore (components, vector over packet).
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = ox - p0x
                tvy = oy - p0y
                tvz = oz - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                h = (
                    (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt > t_min)
                    & (tt < tb)
                )
                h = jnp.logical_and(h, word >= 0)
                if blend_mode == BLEND_EXCLUDE:
                    h = jnp.logical_and(h, (word & FLAG_BLEND) == 0)
                elif blend_mode == BLEND_ONLY:
                    h = jnp.logical_and(h, (word & FLAG_BLEND) != 0)
                if cull_sign:
                    culled = (det * cull_sign < 0.0) & ((word & FLAG_DOUBLE_SIDED) == 0)
                    h = jnp.logical_and(h, jnp.logical_not(culled))
                if any_hit:
                    h = jnp.logical_and(h, tt < t_cap)
                    # First accepted hit retires the lane: t_best collapses so
                    # no box test (tn <= t_best) can pass for it again.
                    tb = jnp.where(h, NEG_BIG, tb)
                else:
                    tb = jnp.where(h, tt, tb)
                ub = jnp.where(h, uu, ub)
                vb = jnp.where(h, vv, vb)
                wb = jnp.where(h, word, wb)
            return sp, (tb, ub, vb, wb)

        def handle_internal(sp):
            node = entry
            nrow = nodes_ref[node, :]
            mrow = meta_ref[node, :]
            # Push c=3..0 so child 0 (front by build order) pops first.
            for c in range(3, -1, -1):
                lox, loy, loz = nrow[6 * c], nrow[6 * c + 1], nrow[6 * c + 2]
                hix, hiy, hiz = nrow[6 * c + 3], nrow[6 * c + 4], nrow[6 * c + 5]
                meta = mrow[c]

                tx0 = (lox - ox) * inv_x
                tx1 = (hix - ox) * inv_x
                ty0 = (loy - oy) * inv_y
                ty1 = (hiy - oy) * inv_y
                tz0 = (loz - oz) * inv_z
                tz1 = (hiz - oz) * inv_z
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                box_hit = (tf >= jnp.maximum(tn, t_min)) & (tn <= t_best)
                push = jnp.any(box_hit).astype(jnp.int32)
                stack_ref[sp] = meta
                sp = sp + push
            return sp, (t_best, u_best, v_best, w_best)

        return jax.lax.cond(is_leaf, handle_leaf, handle_internal, sp)

    init_best = (
        t_cap,
        jnp.zeros_like(t_cap),
        jnp.zeros_like(t_cap),
        jnp.full(t_cap.shape, -1, jnp.int32),
    )
    _, best = jax.lax.while_loop(cond, body, (1, init_best))
    t_ref[:, :] = best[0]
    u_ref[:, :] = best[1]
    v_ref[:, :] = best[2]
    word_ref[:, :] = best[3]


@functools.partial(
    jax.jit,
    static_argnames=("root_meta", "any_hit", "cull_sign", "blend_mode", "interpret"),
)
def traverse_packets_wide(
    wide_nodes,  # (N4, 24) f32 box rows
    wide_meta,   # (N4, 4) i32 child meta words
    records,     # (N, REC_GEO) f32 leaf geometry
    words,       # (N, LEAF_SIZE) i32 id/flag words
    origin,      # (R, 3)
    direction,   # (R, 3)
    t_min,       # (R,)
    t_max,       # (R,)
    root_meta: int = 0,
    any_hit: bool = False,
    cull_sign: int = 0,
    blend_mode: int = 0,
    interpret: bool = False,
):
    """Packet traversal over all rays. Returns (t, tri_word, u, v) flat (R,).

    Rays are padded to a multiple of PACKET; each packet is one grid step.
    In any_hit mode, a hit lane reports word >= 0 and t is NOT meaningful.
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
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pack * PACKET_ROWS, LANES), jnp.int32),
    ]
    t, u, v, word = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * 4 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wide_nodes, wide_meta, records, words, ox, oy, oz, dx, dy, dz, tmn, tmx)

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
    maps, root_meta = bvh_ops.build_wide_maps(tree)
    wide = bvh_ops.assemble_wide(packed.nodes, maps)
    return traverse_packets_wide(
        wide, jnp.asarray(maps.meta), packed.records, packed.words,
        origin, direction, t_min, t_max,
        root_meta=root_meta, any_hit=any_hit, cull_sign=cull_sign,
        blend_mode=blend_mode, interpret=interpret,
    )

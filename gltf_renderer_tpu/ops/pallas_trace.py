"""Pallas TPU packet-traversal kernel for BVH closest-hit / any-hit.

The XLA wavefront traversal (ops/bvh.intersect_closest_p) pays a fixed
~1ms-per-gather kernel-launch cost every BVH step. This kernel removes it:
the whole packed BVH (nodes + leaf records, see ops/bvh.pack) lives in VMEM,
and each grid step traverses ONE PACKET of rays (PACKET_ROWS x 128, VPU
register shape) with a shared DFS stack in SMEM — the classic packet
traversal, mapped to TPU:

  - node fetch     = scalar dynamic loads from the VMEM node table
  - AABB/triangle  = full-width (rows, 128) vector ops on the VPU
  - stack control  = scalar SMEM ops inside a fori/while loop
  - packet prune   = push children only if ANY live ray hit the box

Coherent packets (camera/shadow rays) visit near the per-ray optimum;
incoherent bounce packets degrade toward the union — still far cheaper than
per-ray gathers. Scenes must fit VMEM (~12 MB: ≈ 60k triangles); larger
scenes fall back to the XLA path (render/pathtracer chooses).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gltf_renderer_tpu.ops.bvh import LEAF_SIZE, PackedBVH

PACKET_ROWS = 8          # rays per packet = PACKET_ROWS * 128
LANES = 128
MAX_STACK = 64
PACKET = PACKET_ROWS * LANES


def _traverse_kernel(
    nodes_ref,    # (N, 8) VMEM
    recs_ref,     # (N, 48) VMEM
    ox_ref, oy_ref, oz_ref,       # (ROWS, 128) VMEM per packet
    dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref,
    # outputs
    t_ref, u_ref, v_ref, word_ref,
    # scratch
    stack_ref,    # SMEM (MAX_STACK,) int32
    *,
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

    stack_ref[0] = 0  # push root

    def cond(state):
        sp, _best = state
        return sp > 0

    def body(state):
        sp, best = state
        t_best, u_best, v_best, w_best = best
        node = stack_ref[sp - 1]
        sp = sp - 1

        nrow = nodes_ref[node, :]                       # (8,)
        lox, loy, loz = nrow[0], nrow[1], nrow[2]
        hix, hiy, hiz = nrow[3], nrow[4], nrow[5]
        meta = jnp.asarray(nrow[6], jnp.float32).view(jnp.int32)
        skip = jnp.asarray(nrow[7], jnp.float32).view(jnp.int32)
        count = jax.lax.shift_right_logical(meta, 28)
        first = meta & ((1 << 28) - 1)
        is_leaf = count > 0

        # Slab test (vector, full packet).
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
        packet_hit = jnp.any(box_hit)

        def handle_leaf(sp, t_best, u_best, v_best, w_best):
            rrow = recs_ref[node, :]                    # (48,)
            for k in range(LEAF_SIZE):
                p0x, p0y, p0z = rrow[9 * k], rrow[9 * k + 1], rrow[9 * k + 2]
                e1x, e1y, e1z = rrow[9 * k + 3], rrow[9 * k + 4], rrow[9 * k + 5]
                e2x, e2y, e2z = rrow[9 * k + 6], rrow[9 * k + 7], rrow[9 * k + 8]
                word = jnp.asarray(rrow[36 + k], jnp.float32).view(jnp.int32)

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
                    & (tt < t_best)
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
                t_best = jnp.where(h, tt, t_best)
                u_best = jnp.where(h, uu, u_best)
                v_best = jnp.where(h, vv, v_best)
                w_best = jnp.where(h, word, w_best)
            return sp, t_best, u_best, v_best, w_best

        def handle_internal(sp):
            # Push right (skip of left subtree start... right child is the
            # node at `skip of left subtree`): right child index is encoded
            # implicitly: left = node+1; right child = the skip of node+1's
            # subtree == stored per node? We packed skip, not right. Recover:
            # right = skip(left subtree root) — equals skip chain... we
            # instead use: right child = skip[node + 1]? NO — skip[left] IS
            # the right sibling by construction (assign_skip). So:
            right = jnp.asarray(nodes_ref[node + 1, 7], jnp.float32).view(jnp.int32)
            stack_ref[sp] = right
            stack_ref[sp + 1] = node + 1
            return sp + 2

        def on_hit(sp, best):
            t_b, u_b, v_b, w_b = best
            leaf_res = jax.lax.cond(
                is_leaf,
                lambda: handle_leaf(sp, t_b, u_b, v_b, w_b),
                lambda: (handle_internal(sp), t_b, u_b, v_b, w_b),
            )
            return leaf_res

        sp, t_best, u_best, v_best, w_best = jax.lax.cond(
            packet_hit,
            lambda: on_hit(sp, (t_best, u_best, v_best, w_best)),
            lambda: (sp, t_best, u_best, v_best, w_best),
        )
        return sp, (t_best, u_best, v_best, w_best)

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
    jax.jit, static_argnames=("any_hit", "cull_sign", "blend_mode", "interpret")
)
def traverse_packets(
    packed: PackedBVH,
    origin,      # (R, 3)
    direction,   # (R, 3)
    t_min,       # (R,)
    t_max,       # (R,)
    any_hit: bool = False,
    cull_sign: int = 0,
    blend_mode: int = 0,
    interpret: bool = False,
):
    """Packet traversal over all rays. Returns (t, tri_word, u, v) flat (R,).

    Rays are padded to a multiple of PACKET; each packet is one grid step.
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
    tmx = prep(t_max, 0.0)  # padded rays: t_max < t_min -> no hits

    grid = (n_pack,)
    ray_spec = pl.BlockSpec(
        (PACKET_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel, any_hit=any_hit, cull_sign=cull_sign, blend_mode=blend_mode
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
        in_specs=[table_spec, table_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed.nodes, packed.records, ox, oy, oz, dx, dy, dz, tmn, tmx)

    t = t.reshape(-1)[:r]
    u = u.reshape(-1)[:r]
    v = v.reshape(-1)[:r]
    word = word.reshape(-1)[:r]
    return t, word, u, v

"""Tile-binned software rasterizer (Pallas TPU kernel).

The reference's ForwardPass vertex/raster stage (Forward.vs.hlsl + the
hardware rasterizer) mapped to TPU:

  1. XLA: transform all world vertices to clip space, build per-triangle
     setup rows (screen coords, 1/w, reversed-Z depths, id/flags).
  2. Host: bin triangles into screen tiles (vectorized numpy CSR — the
     analogue of the reference's CPU draw-call binning, Rasterizer.cpp:74-113).
  3. Pallas: one grid step per SCREEN TILE (TILE_H x TILE_W pixels = one VPU
     register block). The tile's triangle list arrives via scalar prefetch;
     each triangle is one scalar row load + full-width edge-function /
     depth-test update. Reversed-Z GREATER depth test (Rasterizer.h:59).

Outputs a visibility G-buffer (tri id, depth, perspective-correct u, v) that
feeds the same shade_forward used by the ray-cast path. Triangles crossing
the near plane are Sutherland-Hodgman clipped on the host; the clipped
pieces carry per-vertex barycentrics of the SOURCE triangle so attribute
interpolation is unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 128
TRI_BATCH = 4
SETUP_WIDTH = 24
NEAR_EPS = 1e-6
CLIP_CAP = 1024  # max near-plane-crossing triangles clipped per frame (device path)
LIST_SMEM_CAP = 114688  # pair-list entries that fit SMEM scalar prefetch
# (1.00 MB SMEM on v5e, measured: 262144 entries overflow with the other
# operands); longer lists ride in VMEM (see rasterize_tiles).


class RasterSetup(NamedTuple):
    rows: jnp.ndarray      # (T', 24) f32 triangle setup rows (geometry)
    rows_i: jnp.ndarray    # (T', 8) i32 rows: [tri_id, flags, 0...]
    valid: np.ndarray      # (T',) bool host mask (non-degenerate, on-screen)
    screen_aabb: np.ndarray  # (T', 4) host float [x0, y0, x1, y1]


def _clip_near_host(clip, tri_vertex, keep_mask, cross_mask):
    """Sutherland–Hodgman clip of `cross_mask` triangles against w = NEAR_EPS
    (host numpy). Returns (clip_verts (M, 3, 4), bary (M, 3, 3), src (M,)):
    up to 2 output triangles per input, each vertex carrying its barycentric
    coordinates in the ORIGINAL triangle so attribute interpolation still
    addresses the original vertices (the hardware rasterizer gets this for
    free; here the kernel interpolates stored per-vertex original bary)."""
    idx = np.nonzero(cross_mask)[0]
    out_v, out_b, out_src = [], [], []
    eye = np.eye(3, dtype=np.float32)
    for t in idx:
        vs = clip[tri_vertex[t]]                     # (3, 4)
        polys_v = []
        polys_b = []
        for k in range(3):
            a, b = vs[k], vs[(k + 1) % 3]
            ba, bb = eye[k], eye[(k + 1) % 3]
            ina, inb = a[3] > NEAR_EPS, b[3] > NEAR_EPS
            if ina:
                polys_v.append(a)
                polys_b.append(ba)
            if ina != inb:
                s = (NEAR_EPS - a[3]) / (b[3] - a[3])
                polys_v.append(a + s * (b - a))
                polys_b.append(ba + s * (bb - ba))
        if len(polys_v) < 3:
            continue
        for k in range(1, len(polys_v) - 1):
            out_v.append([polys_v[0], polys_v[k], polys_v[k + 1]])
            out_b.append([polys_b[0], polys_b[k], polys_b[k + 1]])
            out_src.append(t)
    if not out_v:
        return (np.zeros((0, 3, 4), np.float32), np.zeros((0, 3, 3), np.float32),
                np.zeros(0, np.int64))
    return (np.asarray(out_v, np.float32), np.asarray(out_b, np.float32),
            np.asarray(out_src, np.int64))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _setup_device(world_position, tri_vertex, world_to_clip, width, height,
                  double_sided):
    """Device stage: clip transform + setup rows for UNCLIPPED triangles +
    the packed per-triangle host summary [x0,y0,x1,y1, valid, cross] in ONE
    array (a single device->host transfer feeds binning — per-array syncs
    each cost a ~25 ms tunnel round trip)."""
    p = jnp.concatenate(
        [world_position, jnp.ones_like(world_position[:, :1])], axis=1
    )
    clip = p @ world_to_clip.T                      # (V, 4)
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    sxv = ((clip[:, 0] / safe_w) + 1.0) * 0.5 * width
    syv = (-(clip[:, 1] / safe_w) + 1.0) * 0.5 * height
    szv = clip[:, 2] / safe_w
    iwv = 1.0 / safe_w

    i0, i1, i2 = tri_vertex[:, 0], tri_vertex[:, 1], tri_vertex[:, 2]
    t = tri_vertex.shape[0]
    behind = (w[tri_vertex] <= NEAR_EPS)
    n_behind = behind.sum(1)
    keep = n_behind == 0
    cross = (n_behind > 0) & (n_behind < 3)

    zf = jnp.zeros(t, jnp.float32)
    onef = jnp.ones(t, jnp.float32)
    rows = jnp.stack(
        [sxv[i0], syv[i0], sxv[i1], syv[i1], sxv[i2], syv[i2],
         szv[i0], szv[i1], szv[i2], iwv[i0], iwv[i1], iwv[i2],
         # identity original-bary (u=b1, v=b2) per vertex
         zf, zf, onef, zf, zf, onef,
         zf, zf, zf, zf, zf, zf],
        axis=1,
    )
    sx3 = jnp.stack([sxv[i0], sxv[i1], sxv[i2]], 1)
    sy3 = jnp.stack([syv[i0], syv[i1], syv[i2]], 1)
    summary = jnp.concatenate(
        [sx3.min(1, keepdims=True), sy3.min(1, keepdims=True),
         sx3.max(1, keepdims=True), sy3.max(1, keepdims=True),
         keep[:, None].astype(jnp.float32), cross[:, None].astype(jnp.float32)],
        axis=1,
    )
    return rows, clip, summary


def build_setup(world_position, tri_vertex, world_to_clip, width, height,
                double_sided=None):
    """Stage 1: clip transform, near-plane clipping, setup rows.

    Row layout: [x0, y0, x1, y1, x2, y2, z0, z1, z2, iw0, iw1, iw2,
    u0, v0, u1, v1, u2, v2, 0...] — z is reversed-Z NDC depth, iw = 1/clip_w,
    (u_k, v_k) are each setup vertex's barycentrics in the ORIGINAL triangle
    ((0,0)/(1,0)/(0,1) for unclipped; interpolated for near-clipped pieces).
    All unclipped rows stay on device; only near-crossing triangles (rare)
    take the host Sutherland-Hodgman path and are appended.
    """
    tv = np.asarray(tri_vertex)
    t = tv.shape[0]
    rows_d, clip_d, summary_d = _setup_device(
        world_position, tri_vertex, world_to_clip, width, height, double_sided
    )
    summary = np.asarray(summary_d)                 # ONE host sync
    aabb = summary[:, 0:4]
    keep = summary[:, 4] > 0.5
    cross = summary[:, 5] > 0.5

    ds = (np.asarray(double_sided).astype(np.int32)
          if double_sided is not None else np.zeros(t, np.int32))
    ids = np.arange(t, dtype=np.int32)
    rows_i = np.stack(
        [ids, ds] + [np.zeros(t, np.int32)] * 6, 1
    ).astype(np.int32)

    if cross.any():
        clip = np.asarray(clip_d)                   # host sync, clipped path only
        cv, cb, cs = _clip_near_host(clip, tv, keep, cross)
        w = cv[..., 3]
        safe_w = np.where(np.abs(w) > 1e-9, w, 1e-9)
        sx = ((cv[..., 0] / safe_w) + 1.0) * 0.5 * width
        sy = (-(cv[..., 1] / safe_w) + 1.0) * 0.5 * height
        sz = cv[..., 2] / safe_w
        iw = 1.0 / safe_w
        extra = np.concatenate(
            [np.stack([sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
                       sz[:, 0], sz[:, 1], sz[:, 2],
                       iw[:, 0], iw[:, 1], iw[:, 2]], 1),
             cb[:, 0, 1:3].reshape(-1, 2),
             cb[:, 1, 1:3].reshape(-1, 2),
             cb[:, 2, 1:3].reshape(-1, 2),
             np.zeros((len(cs), SETUP_WIDTH - 18), np.float32)],
            axis=1,
        ).astype(np.float32)
        rows = jnp.concatenate([rows_d, jnp.asarray(extra)])
        zi = np.zeros(len(cs), np.int32)
        rows_i = np.concatenate([
            rows_i,
            np.stack([cs.astype(np.int32), ds[cs]] + [zi] * 6, 1),
        ])
        aabb = np.concatenate([
            aabb,
            np.stack([sx.min(1), sy.min(1), sx.max(1), sy.max(1)], 1),
        ]).astype(np.float32)
        valid = np.concatenate([keep, np.ones(len(cs), bool)])
    else:
        rows = rows_d
        valid = keep
    return RasterSetup(
        rows=rows, rows_i=jnp.asarray(rows_i),
        valid=valid, screen_aabb=aabb,
    )


def bin_triangles(setup: RasterSetup, width, height, cull: bool = True):
    """Host stage 2: CSR tile lists. Returns (flat_ids, offsets) numpy."""
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    aabb = setup.screen_aabb
    valid = setup.valid.copy()
    # Degenerate/offscreen rejection.
    valid &= (aabb[:, 2] >= 0) & (aabb[:, 0] < width)
    valid &= (aabb[:, 3] >= 0) & (aabb[:, 1] < height)

    tx0 = np.clip((aabb[:, 0] // TILE_W).astype(np.int64), 0, tiles_x - 1)
    tx1 = np.clip((aabb[:, 2] // TILE_W).astype(np.int64), 0, tiles_x - 1)
    ty0 = np.clip((aabb[:, 1] // TILE_H).astype(np.int64), 0, tiles_y - 1)
    ty1 = np.clip((aabb[:, 3] // TILE_H).astype(np.int64), 0, tiles_y - 1)
    nx = np.where(valid, tx1 - tx0 + 1, 0)
    ny = np.where(valid, ty1 - ty0 + 1, 0)
    counts = nx * ny
    total = int(counts.sum())
    tri_rep = np.repeat(np.arange(len(counts)), counts)
    # Per-pair local tile offset.
    local = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    nx_rep = np.repeat(nx, counts)
    lx = local % np.maximum(nx_rep, 1)
    ly = local // np.maximum(nx_rep, 1)
    tile_x = np.repeat(tx0, counts) + lx
    tile_y = np.repeat(ty0, counts) + ly
    tile_id = tile_y * tiles_x + tile_x

    order = np.argsort(tile_id, kind="stable")
    flat = tri_rep[order].astype(np.int32)
    tid_sorted = tile_id[order]
    n_tiles = tiles_x * tiles_y
    offsets = np.zeros(n_tiles + 1, np.int64)
    np.add.at(offsets, tid_sorted + 1, 1)
    offsets = np.cumsum(offsets)
    # Nonempty tiles only — empty tiles never enter the kernel grid. Padded
    # to a power of two so the kernel shape (and compile) is stable across
    # frames; padding entries point past the grid and are dropped on scatter.
    counts_per_tile = np.diff(offsets)
    nonempty = np.nonzero(counts_per_tile)[0].astype(np.int32)
    k = max(1, int(2 ** np.ceil(np.log2(max(len(nonempty), 1)))))
    tile_ids = np.full(k, n_tiles, np.int32)
    tile_ids[: len(nonempty)] = nonempty
    return flat, offsets.astype(np.int32), tile_ids, (tiles_x, tiles_y)


def _raster_kernel(*refs, cull_sign: int, list_in_vmem: bool = False):
    if list_in_vmem:
        # Big scenes: the (tri, tile) pair list exceeds SMEM (~0.44 MB cap)
        # and lives in VMEM as (ceil(N/8), 8) i32 rows — one dynamic row
        # load + an 8-way select extracts entry k (scalar ops ~4 ns,
        # docs/PERFORMANCE.md kernel facts).
        (counts_ref, starts_ref, tile_ids_ref, list2d_ref, rows_ref,
         rows_i_ref, z_ref, tri_ref, u_ref, v_ref) = refs

        def load_list(i):
            row = list2d_ref[i >> 3, :]
            lane = i & 7
            v = row[0]
            for j in range(1, 8):
                v = jnp.where(lane == j, row[j], v)
            return v
    else:
        (counts_ref, starts_ref, list_ref, tile_ids_ref, rows_ref,
         rows_i_ref, z_ref, tri_ref, u_ref, v_ref) = refs

        def load_list(i):
            return list_ref[i]

    tiles_x = counts_ref[0]  # packed: [tiles_x, n_tiles]
    n_tiles = counts_ref[1]
    tile = jnp.minimum(tile_ids_ref[pl.program_id(0)], n_tiles - 1)
    tile_x = tile % tiles_x
    tile_y = tile // tiles_x
    x0 = (tile_x * TILE_W).astype(jnp.float32)
    y0 = (tile_y * TILE_H).astype(jnp.float32)

    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + 0.5
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + 0.5

    start = starts_ref[tile]
    count = starts_ref[tile + 1] - start

    def one_tri(k, state):
        zb, trib, ub, vb = state
        # Clamped index: the batched loop (TRI_BATCH per iteration) pads the
        # tail by re-testing the LAST triangle — idempotent for the z-test.
        tri_slot = load_list(start + jnp.minimum(k, count - 1))
        r = rows_ref[tri_slot, :]
        ax, ay, bx, by, cx, cy = r[0], r[1], r[2], r[3], r[4], r[5]
        z0, z1, z2 = r[6], r[7], r[8]
        iw0, iw1, iw2 = r[9], r[10], r[11]
        ri = rows_i_ref[tri_slot, :]
        word = ri[0]
        flags = ri[1]

        # Edge functions (signed areas). Screen space has y down; glTF CCW
        # front faces project to CW -> area < 0 for front faces.
        # NOTE: all conditionals run in the (TILE_H, TILE_W) vector domain —
        # Mosaic cannot legalize scalar selects.
        e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)   # opposite v0
        e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)   # opposite v1
        e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)   # opposite v2
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        area_b = jnp.zeros((TILE_H, TILE_W), jnp.float32) + area

        is_back = area_b > 0.0
        inside_neg = (e0 <= 0.0) & (e1 <= 0.0) & (e2 <= 0.0)
        inside_pos = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        # No select on i1 vectors (Mosaic can't truncate to i1): logical mix.
        inside = (is_back & inside_pos) | (jnp.logical_not(is_back) & inside_neg)
        if cull_sign:
            # +1: cull back faces unless double-sided (flags bit 0).
            ds_b = (jnp.zeros((TILE_H, TILE_W), jnp.int32) + (flags & 1)) != 0
            side = is_back if cull_sign > 0 else jnp.logical_not(is_back)
            culled = jnp.logical_and(side, jnp.logical_not(ds_b))
            inside = jnp.logical_and(inside, jnp.logical_not(culled))

        inv_area = jnp.where(jnp.abs(area_b) > 1e-12, 1.0 / area_b, 0.0)
        l0 = e0 * inv_area
        l1 = e1 * inv_area
        l2 = e2 * inv_area
        # Reversed-Z depth at pixel (linear in screen space).
        z = l0 * z0 + l1 * z1 + l2 * z2
        # Perspective-correct interpolation of the ORIGINAL triangle's
        # barycentrics stored per setup vertex (identity for unclipped
        # triangles; near-clipped pieces map back to the source triangle).
        pw0 = l0 * iw0
        pw1 = l1 * iw1
        pw2 = l2 * iw2
        denom = pw0 + pw1 + pw2
        inv_denom = jnp.where(jnp.abs(denom) > 1e-20, 1.0 / denom, 0.0)
        u = (pw0 * r[12] + pw1 * r[14] + pw2 * r[16]) * inv_denom
        v = (pw0 * r[13] + pw1 * r[15] + pw2 * r[17]) * inv_denom

        take = inside & (z > zb) & (z <= 1.0) & (z >= 0.0) & (jnp.abs(area_b) > 1e-12)
        zb = jnp.where(take, z, zb)
        trib = jnp.where(take, word, trib)
        ub = jnp.where(take, u, ub)
        vb = jnp.where(take, v, vb)
        return zb, trib, ub, vb

    init = (
        jnp.zeros((TILE_H, TILE_W), jnp.float32),          # reversed-Z clear=0
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
    )

    # TRI_BATCH triangles per loop iteration: the loop construct itself costs
    # ~485 ns/iteration on TPU (docs/PERFORMANCE.md) while one triangle's
    # vector work is ~200 ns — batching amortizes the fixed cost 4x.
    def body(k, state):
        base = k * TRI_BATCH
        for j in range(TRI_BATCH):
            state = one_tri(base + j, state)
        return state

    n_iter = jnp.where(count > 0, (count + TRI_BATCH - 1) // TRI_BATCH, 0)
    zb, trib, ub, vb = jax.lax.fori_loop(0, n_iter, body, init)
    z_ref[:, :] = zb
    tri_ref[:, :] = trib
    u_ref[:, :] = ub
    v_ref[:, :] = vb


@functools.partial(jax.jit, static_argnames=("tiles", "cull_sign", "interpret", "list_space"))
def rasterize_tiles(rows, rows_i, flat_list, offsets, tile_ids, tiles: Tuple[int, int],
                    cull_sign: int = 1, interpret: bool = False,
                    list_space: str = ""):
    """Pallas stage 3. Grid runs over NONEMPTY tiles only (compact outputs
    scattered back). Returns (z, tri, u, v) of shape (tiles_y*8, tiles_x*128).

    list_space: "smem" streams the (tri, tile) pair list via scalar prefetch
    (fits ~114k entries); "vmem" stores it as (N/8, 8) i32 rows in VMEM —
    no practical length cap. Default "": picked from the list length (the
    list length is static, so the choice is too)."""
    if not list_space:
        list_space = "smem" if flat_list.shape[0] <= LIST_SMEM_CAP else "vmem"
    tiles_x, tiles_y = tiles
    n_tiles = tiles_x * tiles_y
    k = tile_ids.shape[0]
    meta = jnp.asarray([tiles_x, n_tiles], jnp.int32)

    grid = (k,)
    out_block = pl.BlockSpec((TILE_H, TILE_W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((k * TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((k * TILE_H, TILE_W), jnp.int32),
        jax.ShapeDtypeStruct((k * TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((k * TILE_H, TILE_W), jnp.float32),
    ]
    if list_space == "vmem":
        n = flat_list.shape[0]
        pad = -(-n // 8) * 8 - n
        list2d = jnp.concatenate(
            [flat_list, jnp.zeros(pad, flat_list.dtype)]
        ).reshape(-1, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,   # meta, offsets, tile ids
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,  # list, rows, rows_i
            out_specs=[out_block] * 4,
        )
        kernel = functools.partial(_raster_kernel, cull_sign=cull_sign,
                                   list_in_vmem=True)
        operands = (meta, offsets, tile_ids, list2d, rows, rows_i)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,   # meta, offsets, flat triangle list, tile ids
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,  # rows, rows_i
            out_specs=[out_block] * 4,
        )
        kernel = functools.partial(_raster_kernel, cull_sign=cull_sign)
        operands = (meta, offsets, flat_list, tile_ids, rows, rows_i)
    z_c, tri_c, u_c, v_c = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    # Scatter compact tiles into the full image (padding ids >= n_tiles drop).
    def scatter(compact, clear, dtype):
        full = jnp.full((n_tiles, TILE_H, TILE_W), clear, dtype)
        full = full.at[tile_ids].set(
            compact.reshape(k, TILE_H, TILE_W), mode="drop"
        )
        return (
            full.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * TILE_H, tiles_x * TILE_W)
        )

    return (
        scatter(z_c, 0.0, jnp.float32),
        scatter(tri_c, -1, jnp.int32),
        scatter(u_c, 0.0, jnp.float32),
        scatter(v_c, 0.0, jnp.float32),
    )


def _clip_near_device(clip, tri_vertex, cross, clip_cap: int):
    """Vectorized Sutherland–Hodgman clip against w = NEAR_EPS, in-graph.

    Crossing triangles are compacted to the front with one sort_key_val (the
    same machinery the PT's dispatch uses); the first `clip_cap` of them are
    clipped fully vectorized. A triangle with 1 vertex inside yields 1 piece,
    with 2 inside yields 2 (the quad fan). Beyond-cap crossers are dropped
    (raycast parity tests bound cap generously; crossing tris are rare).

    Returns (verts (2K, 3, 4) clip-space, bary (2K, 3, 3) barycentrics in the
    SOURCE triangle, src (2K,) source ids, valid (2K,)).
    """
    t = tri_vertex.shape[0]
    key = jnp.where(cross, 0, 1).astype(jnp.int32)
    _, idx_sorted = jax.lax.sort_key_val(key, jnp.arange(t, dtype=jnp.int32))
    cand = idx_sorted[:clip_cap]                       # (K,)
    cand_valid = cross[cand]
    vs = clip[tri_vertex[cand]]                        # (K, 3, 4)
    inside = vs[..., 3] > NEAR_EPS                     # (K, 3)
    n_in = inside.sum(-1)
    # Rotate so v0 is the LONE vertex (inside one if n_in==1, outside one if
    # n_in==2) — cyclic rotation preserves winding.
    r_in = jnp.argmax(inside, axis=-1)
    r_out = jnp.argmax(~inside, axis=-1)
    r = jnp.where(n_in == 1, r_in, r_out)

    def take(k):
        j = (r + k) % 3
        v = jnp.take_along_axis(vs, j[:, None, None], axis=1)[:, 0]
        return v, jax.nn.one_hot(j, 3, dtype=jnp.float32)

    va, ba = take(0)
    vb, bb = take(1)
    vc, bc = take(2)

    def isect(p, q, bp, bq):
        dw = q[:, 3] - p[:, 3]
        s = (NEAR_EPS - p[:, 3]) / jnp.where(jnp.abs(dw) > 1e-20, dw, 1e-20)
        s = s[:, None]
        return p + s * (q - p), bp + s * (bq - bp)

    iab, b_iab = isect(va, vb, ba, bb)
    iac, b_iac = isect(va, vc, ba, bc)
    one_in = (n_in == 1)[:, None, None]
    # n_in==1 (a inside):  piece 1 = (a, iab, iac), no piece 2.
    # n_in==2 (a outside): quad (iab, b, c, iac) -> (iab, b, c), (iab, c, iac).
    t1_v = jnp.where(one_in, jnp.stack([va, iab, iac], 1), jnp.stack([iab, vb, vc], 1))
    t1_b = jnp.where(one_in, jnp.stack([ba, b_iab, b_iac], 1), jnp.stack([b_iab, bb, bc], 1))
    t2_v = jnp.stack([iab, vc, iac], 1)
    t2_b = jnp.stack([b_iab, bc, b_iac], 1)
    verts = jnp.concatenate([t1_v, t2_v])
    bary = jnp.concatenate([t1_b, t2_b])
    src = jnp.concatenate([cand, cand])
    valid = jnp.concatenate(
        [cand_valid & (n_in >= 1), cand_valid & (n_in == 2)]
    )
    return verts, bary, src, valid


def _screen_rows(verts, bary, width, height):
    """Clip-space (K, 3, 4) + source barycentrics -> (K, 24) setup rows."""
    w = verts[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    sx = ((verts[..., 0] / safe_w) + 1.0) * 0.5 * width
    sy = (-(verts[..., 1] / safe_w) + 1.0) * 0.5 * height
    sz = verts[..., 2] / safe_w
    iw = 1.0 / safe_w
    k = verts.shape[0]
    return jnp.concatenate(
        [jnp.stack([sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
                    sz[:, 0], sz[:, 1], sz[:, 2], iw[:, 0], iw[:, 1], iw[:, 2]], 1),
         bary[:, 0, 1:3], bary[:, 1, 1:3], bary[:, 2, 1:3],
         jnp.zeros((k, SETUP_WIDTH - 18), jnp.float32)],
        axis=1,
    )


def _bin_device(rows, valid, width: int, height: int, pair_cap: int):
    """On-device tile binning: (tri, tile) pair expansion via
    jnp.repeat(total_repeat_length) + ONE lax.sort_key_val + searchsorted CSR
    offsets — no host sync anywhere (the host-binned path pays a ~25 ms
    tunnel round trip per frame AND breaks cross-frame pipelining,
    docs/PERFORMANCE.md). Pairs beyond pair_cap are dropped (cap is sized
    ~4x the triangle count)."""
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    n_tiles = tiles_x * tiles_y
    t = rows.shape[0]
    sx = rows[:, 0:6:2]
    sy = rows[:, 1:6:2]
    x0 = sx.min(1)
    x1 = sx.max(1)
    y0 = sy.min(1)
    y1 = sy.max(1)
    valid = valid & (x1 >= 0) & (x0 < width) & (y1 >= 0) & (y0 < height)
    tx0 = jnp.clip((x0 // TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip((x1 // TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip((y0 // TILE_H).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip((y1 // TILE_H).astype(jnp.int32), 0, tiles_y - 1)
    nx = jnp.where(valid, tx1 - tx0 + 1, 0)
    ny = jnp.where(valid, ty1 - ty0 + 1, 0)
    counts = (nx * ny).astype(jnp.int32)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    tri_rep = jnp.repeat(
        jnp.arange(t, dtype=jnp.int32), counts, total_repeat_length=pair_cap
    )
    j = jnp.arange(pair_cap, dtype=jnp.int32)
    local = j - starts[tri_rep]
    nxr = jnp.maximum(nx[tri_rep], 1)
    ok = (local >= 0) & (local < counts[tri_rep]) & (j < ends[-1])
    lx = local % nxr
    ly = local // nxr
    tile = (ty0[tri_rep] + ly) * tiles_x + (tx0[tri_rep] + lx)
    tile = jnp.where(ok, tile, n_tiles).astype(jnp.int32)
    tile_s, tri_s = jax.lax.sort_key_val(tile, tri_rep)
    offsets = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return tri_s, offsets, (tiles_x, tiles_y)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "pair_cap", "clip_cap", "cull_sign",
                     "interpret"),
)
def rasterize_device(world_position, tri_vertex, world_to_clip, width: int,
                     height: int, double_sided=None, cull_sign: int = 1,
                     pair_cap: int = 0, clip_cap: int = CLIP_CAP,
                     interpret: bool = False):
    """Fully-jitted raster pipeline: setup + near clip + binning + kernel all
    in ONE traced graph (composable into the renderer's single frame graph —
    the host-binned `rasterize` forces a mid-frame device->host sync).

    Returns (z, tri, u, v) cropped to (height, width)."""
    t = tri_vertex.shape[0]
    if pair_cap <= 0:
        pair_cap = max(1 << 16, 1 << int(np.ceil(np.log2(4 * t))))
    rows_d, clip, summary = _setup_device(
        world_position, tri_vertex, world_to_clip, width, height, double_sided
    )
    keep = summary[:, 4] > 0.5
    cross = summary[:, 5] > 0.5
    ds = (jnp.asarray(double_sided, jnp.int32) if double_sided is not None
          else jnp.zeros(t, jnp.int32))
    ids = jnp.arange(t, dtype=jnp.int32)
    zi = jnp.zeros(t, jnp.int32)
    rows_i = jnp.stack([ids, ds] + [zi] * 6, 1)

    verts, bary, src, cvalid = _clip_near_device(clip, tri_vertex, cross, clip_cap)
    rows_ext = _screen_rows(verts, bary, width, height)
    zi2 = jnp.zeros(src.shape[0], jnp.int32)
    rows_i_ext = jnp.stack([src, ds[src]] + [zi2] * 6, 1)

    rows = jnp.concatenate([rows_d, rows_ext])
    rows_i = jnp.concatenate([rows_i, rows_i_ext])
    valid = jnp.concatenate([keep, cvalid])

    tri_list, offsets, tiles = _bin_device(rows, valid, width, height, pair_cap)
    # Pair lists beyond LIST_SMEM_CAP ride in VMEM inside rasterize_tiles —
    # NO truncation (the old behavior silently dropped pairs past the cap
    # on dense scenes).
    tiles_x, tiles_y = tiles
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    z, tri, u, v = rasterize_tiles(
        rows, rows_i, tri_list, offsets, tile_ids, tiles,
        cull_sign=cull_sign, interpret=interpret,
    )
    return (
        z[:height, :width],
        tri[:height, :width],
        u[:height, :width],
        v[:height, :width],
    )


def rasterize(world_position, tri_vertex, world_to_clip, width, height,
              double_sided=None, cull_backfaces: bool = True, interpret=None):
    """Full pipeline -> (z, tri, u, v) cropped to (height, width).

    interpret=None auto-selects interpret mode on the CPU backend (tests)."""
    if interpret is None:
        try:
            interpret = jax.default_backend() == "cpu"
        except RuntimeError:
            interpret = True
    setup = build_setup(
        world_position, tri_vertex, world_to_clip, width, height, double_sided
    )
    flat, offsets, tile_ids, tiles = bin_triangles(setup, width, height)
    if len(flat) == 0:
        flat = np.zeros(1, np.int32)
    z, tri, u, v = rasterize_tiles(
        setup.rows, setup.rows_i, jnp.asarray(flat), jnp.asarray(offsets),
        jnp.asarray(tile_ids), tiles,
        cull_sign=1 if cull_backfaces else 0, interpret=interpret,
    )
    return (
        z[:height, :width],
        tri[:height, :width],
        u[:height, :width],
        v[:height, :width],
    )

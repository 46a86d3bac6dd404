"""Packet-traversal Pallas kernel vs the XLA packed traversal (ground truth).

The packet kernel (ops/pallas_trace.traverse_packets) is the TPU fast path for
every ray the path tracer dispatches; these tests run it in interpret mode on
CPU against ops/bvh.intersect_closest_p / intersect_any_p across all filter
combinations (cull_sign, blend_mode, any_hit) and degenerate rays — the DXR
TraceRay flag semantics (Pathtracer.cpp:344-353).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gltf_renderer_tpu.ops import bvh as bvh_ops
from gltf_renderer_tpu.ops.pallas_trace import traverse_packets


def _random_scene(n_tris, seed, all_flags=True):
    """Random triangle soup in [-1, 1]^3 with randomized flag words."""
    rs = np.random.RandomState(seed)
    c = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    p0 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    p1 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    p2 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    tree = bvh_ops.build(p0, p1, p2)
    order = np.asarray(tree.tri_order)
    words = order.astype(np.int64).copy()
    if all_flags:
        words |= np.where(rs.rand(n_tris) < 0.3, bvh_ops.FLAG_MASKED, 0)
        words |= np.where(rs.rand(n_tris) < 0.3, bvh_ops.FLAG_BLEND, 0)
        words |= np.where(rs.rand(n_tris) < 0.3, bvh_ops.FLAG_DOUBLE_SIDED, 0)
    packed = bvh_ops.pack(
        tree, p0[order], (p1 - p0)[order], (p2 - p0)[order], words.astype(np.int32)
    )
    return packed


def _random_rays(n_rays, seed, coherent=False):
    rs = np.random.RandomState(seed)
    if coherent:
        o = np.tile(np.asarray([[0.0, -3.0, 0.0]], np.float32), (n_rays, 1))
        target = rs.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
        d = target - o
    else:
        o = rs.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
        d = rs.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    t_min = np.zeros(n_rays, np.float32)
    t_max = np.full(n_rays, 20.0, np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min), jnp.asarray(t_max)


def _compare_closest(packed, o, d, t_min, t_max, cull_sign, blend_mode,
                     width=4):
    ref = bvh_ops.intersect_closest_p(
        packed, o, d, t_min, t_max, blend_mode=blend_mode, cull_sign=cull_sign
    )
    t, word, u, v = traverse_packets(
        packed, o, d, t_min, t_max,
        cull_sign=cull_sign, blend_mode=blend_mode, interpret=True, width=width,
    )
    tri = np.where(np.asarray(word) >= 0, np.asarray(word) & bvh_ops.ID_MASK, -1)
    ref_tri = np.asarray(ref.tri)
    ref_t = np.asarray(ref.t)
    t = np.asarray(t)

    hit_ref = ref_tri >= 0
    hit_ker = tri >= 0
    np.testing.assert_array_equal(hit_ker, hit_ref)
    # Hit distances agree to FP tolerance; near-ties may pick either triangle.
    np.testing.assert_allclose(t[hit_ref], ref_t[hit_ref], rtol=1e-4, atol=1e-5)
    same_tri = tri == ref_tri
    close = np.abs(t - ref_t) <= 1e-4 * np.maximum(np.abs(ref_t), 1.0)
    assert np.all(same_tri | (hit_ref & close)), (
        f"{(~(same_tri | close)).sum()} rays picked a non-tie different triangle"
    )
    # Barycentrics agree where the same triangle won.
    m = same_tri & hit_ref
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(ref.v)[m], rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("cull_sign", [-1, 0, 1])
def test_closest_matches_xla_cull(cull_sign):
    packed = _random_scene(200, seed=7)
    o, d, t_min, t_max = _random_rays(256, seed=11)
    _compare_closest(packed, o, d, t_min, t_max, cull_sign, bvh_ops.BLEND_ANY)


@pytest.mark.parametrize(
    "blend_mode", [bvh_ops.BLEND_ANY, bvh_ops.BLEND_EXCLUDE, bvh_ops.BLEND_ONLY]
)
def test_closest_matches_xla_blend(blend_mode):
    packed = _random_scene(200, seed=13)
    o, d, t_min, t_max = _random_rays(256, seed=17)
    _compare_closest(packed, o, d, t_min, t_max, 0, blend_mode)


def test_closest_coherent_packet():
    packed = _random_scene(300, seed=23)
    o, d, t_min, t_max = _random_rays(512, seed=29, coherent=True)
    _compare_closest(packed, o, d, t_min, t_max, 0, bvh_ops.BLEND_ANY)


@pytest.mark.parametrize("cull_sign,blend_mode", [
    (0, bvh_ops.BLEND_ANY), (1, bvh_ops.BLEND_ANY), (-1, bvh_ops.BLEND_ANY),
    (0, bvh_ops.BLEND_EXCLUDE), (0, bvh_ops.BLEND_ONLY),
])
def test_closest_matches_xla_wide8(cull_sign, blend_mode):
    """8-wide nodes (3 collapsed binary levels) against the XLA reference."""
    packed = _random_scene(300, seed=41)
    o, d, t_min, t_max = _random_rays(384, seed=43)
    _compare_closest(packed, o, d, t_min, t_max, cull_sign, blend_mode, width=8)


def test_any_hit_wide8():
    packed = _random_scene(200, seed=47)
    o, d, t_min, t_max = _random_rays(256, seed=53)
    ref = bvh_ops.intersect_any_p(packed, o, d, t_min, t_max)
    t, word, u, v = traverse_packets(
        packed, o, d, t_min, t_max, any_hit=True, interpret=True, width=8
    )
    np.testing.assert_array_equal(np.asarray(word) >= 0, np.asarray(ref))


def test_any_hit_matches_xla():
    packed = _random_scene(200, seed=31)
    o, d, t_min, t_max = _random_rays(256, seed=37)
    ref = bvh_ops.intersect_any_p(packed, o, d, t_min, t_max)
    t, word, u, v = traverse_packets(
        packed, o, d, t_min, t_max, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(word) >= 0, np.asarray(ref))


def test_degenerate_rays():
    """Axis-aligned and zero-component directions must not produce NaN hits."""
    packed = _random_scene(100, seed=41)
    o = jnp.asarray(
        [[0.0, -3.0, 0.0], [0.0, -3.0, 0.0], [-3.0, 0.0, 0.0], [0.0, 0.0, 3.0]],
        jnp.float32,
    )
    d = jnp.asarray(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]],
        jnp.float32,
    )
    t_min = jnp.zeros(4, jnp.float32)
    t_max = jnp.full(4, 20.0, jnp.float32)
    ref = bvh_ops.intersect_closest_p(packed, o, d, t_min, t_max)
    t, word, u, v = traverse_packets(packed, o, d, t_min, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(word) >= 0, np.asarray(ref.tri) >= 0)
    assert np.isfinite(np.asarray(t)).all()


def test_tmin_offset_respected():
    """Rays restarted past a hit (alpha retraversal pattern) skip that hit."""
    packed = _random_scene(200, seed=43)
    o, d, t_min, t_max = _random_rays(256, seed=47, coherent=True)
    t0, w0, _, _ = traverse_packets(packed, o, d, t_min, t_max, interpret=True)
    has = np.asarray(w0) >= 0
    t_min2 = jnp.where(jnp.asarray(has), t0 * 1.0001 + 1e-5, t_max + 1.0)
    ref = bvh_ops.intersect_closest_p(packed, o, d, t_min2, t_max)
    t1, w1, _, _ = traverse_packets(packed, o, d, t_min2, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(w1) >= 0, np.asarray(ref.tri) >= 0)
    both = (np.asarray(w1) >= 0) & has
    assert np.all(np.asarray(t1)[both] > np.asarray(t0)[both])


def test_lane_mode_mixed_dispatch():
    """any_hit="lane": closest and any-hit rays mixed per-lane in ONE dispatch
    (the merged bounce+shadow path) must match the pure dispatches exactly —
    closest lanes vs intersect_closest_p, any-hit lanes vs intersect_any_p.
    Culling applies only to the closest lanes."""
    from gltf_renderer_tpu.ops import bvh as bvh_ops
    from gltf_renderer_tpu.ops.pallas_trace import traverse_packets_wide
    import jax.numpy as jnp

    packed = _random_scene(96, seed=5)
    o, d, t_min, t_max = _random_rays(160, seed=6)
    rs = np.random.RandomState(7)
    mode = jnp.asarray((rs.rand(160) < 0.5).astype(np.int32))

    nodes_np = np.asarray(packed.nodes)
    is_leaf = nodes_np[:, 6] >= 0.0
    skip = nodes_np[:, 7].astype(np.int32)
    n = nodes_np.shape[0]
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
    leaf_ids = jnp.asarray(maps.leaf_ids)

    for cull in (0, 1):
        t, word, u, v = traverse_packets_wide(
            wide, jnp.asarray(maps.meta), packed.records[leaf_ids],
            packed.words[leaf_ids], o, d, t_min, t_max,
            root_meta=root_meta, any_hit="lane", cull_sign=cull,
            mode=mode, interpret=True,
        )
        tri = np.where(np.asarray(word) >= 0,
                       np.asarray(word) & bvh_ops.ID_MASK, -1)
        m_any = np.asarray(mode) > 0
        # Any-hit lanes: occluded iff ANY geometry intersects (never culled).
        ref_any = np.asarray(
            bvh_ops.intersect_any_p(packed, o, d, t_min, t_max)
        )
        np.testing.assert_array_equal((tri >= 0)[m_any], ref_any[m_any])
        # Closest lanes: match intersect_closest_p with the cull flag.
        ref = bvh_ops.intersect_closest_p(packed, o, d, t_min, t_max,
                                          cull_sign=cull)
        ref_tri = np.asarray(ref.tri)
        ref_t = np.asarray(ref.t)
        mc = ~m_any
        np.testing.assert_array_equal((tri >= 0)[mc], (ref_tri >= 0)[mc])
        hit = mc & (ref_tri >= 0)
        np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                                   rtol=1e-4, atol=1e-5)


def test_bf16_conservative_boxes_same_hits():
    """bf16 node boxes with outward rounding (GLTF_TPU_BF16BOX path): the
    kernel may over-visit but the closest hits are unchanged (triangle
    tests stay exact f32)."""
    from gltf_renderer_tpu.ops.bvh import conservative_bf16_boxes
    from gltf_renderer_tpu.ops.pallas_trace import traverse_packets_wide

    packed = _random_scene(600, seed=21)
    o, d, t_min, t_max = _random_rays(4096, seed=22)

    nodes_np = np.asarray(packed.nodes)
    is_leaf = nodes_np[:, 6] >= 0.0
    skip = nodes_np[:, 7].astype(np.int32)
    n = nodes_np.shape[0]
    right = np.full(n, -1, np.int32)
    internal = ~is_leaf
    right[internal] = skip[np.clip(np.nonzero(internal)[0] + 1, 0, n - 1)]
    tree = bvh_ops.FlatBVH(
        aabb_min=nodes_np[:, 0:3], aabb_max=nodes_np[:, 3:6],
        first=np.maximum(nodes_np[:, 6], 0).astype(np.int32),
        count=is_leaf.astype(np.int32), skip=skip, right=right,
        tri_order=None, levels=None,
    )
    maps, root_meta = bvh_ops.build_wide_maps(tree, width=4)
    wide = np.asarray(bvh_ops.assemble_wide(packed.nodes, maps))
    leaf_ids = jnp.asarray(maps.leaf_ids)
    recs = packed.records[leaf_ids]
    words = packed.words[leaf_ids]

    out32 = traverse_packets_wide(
        jnp.asarray(wide), jnp.asarray(maps.meta), recs, words,
        o, d, t_min, t_max, root_meta=root_meta, interpret=True)
    # The production form is i32-PACKED pairs (Mosaic cannot dynamically
    # row-index a bf16 VMEM table) — test exactly what ships.
    wide16 = jnp.asarray(
        bvh_ops.pack_bf16_pairs(conservative_bf16_boxes(wide)))
    assert wide16.dtype == jnp.int32 and wide16.shape[1] == wide.shape[1] // 2
    out16 = traverse_packets_wide(
        wide16, jnp.asarray(maps.meta), recs, words,
        o, d, t_min, t_max, root_meta=root_meta, interpret=True)

    t32, w32 = np.asarray(out32[0]), np.asarray(out32[1])
    t16, w16 = np.asarray(out16[0]), np.asarray(out16[1])
    np.testing.assert_array_equal(w32 >= 0, w16 >= 0)
    hit = w32 >= 0
    np.testing.assert_allclose(t16[hit], t32[hit], rtol=1e-4, atol=1e-5)
    # Ties aside, the winning triangle is the same.
    same = w16 == w32
    close = np.abs(t16 - t32) <= 1e-4 * np.maximum(np.abs(t32), 1.0)
    assert np.all(same | (hit & close))


def test_leaf_hbm_matches_vmem():
    """HBM-resident leaf mode (per-flush DMA of leaf rows) must return
    bit-identical results to the all-VMEM kernel in every dispatch mode —
    the path that lifts the VMEM ceiling for 1M+-tri scenes."""
    from gltf_renderer_tpu.ops.pallas_trace import traverse_packets_wide

    packed = _random_scene(600, seed=31)
    o, d, t_min, t_max = _random_rays(4096, seed=32)

    nodes_np = np.asarray(packed.nodes)
    is_leaf = nodes_np[:, 6] >= 0.0
    skip = nodes_np[:, 7].astype(np.int32)
    n = nodes_np.shape[0]
    right = np.full(n, -1, np.int32)
    internal = ~is_leaf
    right[internal] = skip[np.clip(np.nonzero(internal)[0] + 1, 0, n - 1)]
    tree = bvh_ops.FlatBVH(
        aabb_min=nodes_np[:, 0:3], aabb_max=nodes_np[:, 3:6],
        first=np.maximum(nodes_np[:, 6], 0).astype(np.int32),
        count=is_leaf.astype(np.int32), skip=skip, right=right,
        tri_order=None, levels=None,
    )
    maps, root_meta = bvh_ops.build_wide_maps(tree, width=4)
    wide = jnp.asarray(bvh_ops.assemble_wide(packed.nodes, maps))
    leaf_ids = jnp.asarray(maps.leaf_ids)
    recs = packed.records[leaf_ids]
    words = packed.words[leaf_ids]
    meta = jnp.asarray(maps.meta)

    rs = np.random.RandomState(33)
    mode = jnp.asarray((rs.rand(4096) < 0.5).astype(np.int32))
    cases = [
        dict(any_hit=False),
        dict(any_hit=True),
        dict(any_hit="lane", mode=mode),
    ]
    from gltf_renderer_tpu.ops.pallas_trace import (
        pack_leaf_tiles, pack_leaf_tiles_jnp,
    )

    tiles = jnp.asarray(pack_leaf_tiles(np.asarray(recs), np.asarray(words)))
    # The on-device (refit-path) packer must produce the same tiles.
    np.testing.assert_array_equal(
        np.asarray(pack_leaf_tiles_jnp(recs, words)), np.asarray(tiles))
    for kw in cases:
        ref = traverse_packets_wide(
            wide, meta, recs, words, o, d, t_min, t_max,
            root_meta=root_meta, interpret=True, **kw)
        for hbm in (1, 2):  # flush-synchronous DMA / prefetch pipeline
            got = traverse_packets_wide(
                wide, meta, tiles, words, o, d, t_min, t_max,
                root_meta=root_meta, interpret=True, leaf_hbm=hbm, **kw)
            if hbm == 2 and kw.get("any_hit") in (True, "lane"):
                # Prefetch reorders leaf batches; an any-hit lane may retire
                # on a DIFFERENT (equally valid) occluder — occlusion and
                # closest-lane results must still match exactly.
                r_w, g_w = np.asarray(ref[1]), np.asarray(got[1])
                np.testing.assert_array_equal(r_w >= 0, g_w >= 0)
                if kw.get("any_hit") == "lane":
                    closest = np.asarray(kw["mode"]) == 0
                    np.testing.assert_array_equal(r_w[closest], g_w[closest])
                    np.testing.assert_array_equal(
                        np.asarray(ref[0])[closest], np.asarray(got[0])[closest])
            else:
                for r_arr, g_arr in zip(ref, got):
                    np.testing.assert_array_equal(
                        np.asarray(r_arr), np.asarray(g_arr))

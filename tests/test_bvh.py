import numpy as np
import jax.numpy as jnp

from gltf_renderer_tpu.ops import bvh as bvh_ops
from tests.scenes import uv_sphere


def _sphere_tris(n_lat=16, n_lon=32):
    p, n, uv, idx = uv_sphere(n_lat, n_lon)
    idx = idx.reshape(-1, 3)
    return p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]


def _brute_force(p0, p1, p2, origin, direction):
    """Reference closest-hit via full Möller–Trumbore over all triangles."""
    e1 = p1 - p0
    e2 = p2 - p0
    o = origin[:, None, :]
    d = direction[:, None, :]
    pvec = np.cross(d, e2[None])
    det = np.einsum("rtk,tk->rt", pvec, e1)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - p0[None]
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.einsum("rtk,rk->rt", qvec, direction) * inv
    t = np.einsum("rtk,tk->rt", qvec, e2) * inv
    hit = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < 1e9)
    t = np.where(hit, t, np.inf)
    best = np.argmin(t, -1)
    rows = np.arange(len(origin))
    tbest = t[rows, best]
    return np.where(np.isfinite(tbest), best, -1), np.where(np.isfinite(tbest), tbest, np.inf)


def test_bvh_structure():
    p0, p1, p2 = _sphere_tris()
    tree = bvh_ops.build(p0, p1, p2)
    n = len(tree.count)
    leaf_total = int(np.sum(tree.count))
    assert leaf_total == len(p0)
    assert sorted(np.asarray(tree.tri_order).tolist()) == list(range(len(p0)))
    # skip links in range.
    assert np.all(np.asarray(tree.skip) <= n)
    # Root bounds contain everything.
    np.testing.assert_allclose(tree.aabb_min[0], np.minimum(np.minimum(p0, p1), p2).min(0), atol=1e-6)


def test_bvh_closest_matches_bruteforce():
    p0, p1, p2 = _sphere_tris()
    tree = bvh_ops.build(p0, p1, p2)
    order = np.asarray(tree.tri_order)
    sv0 = p0[order]
    se1 = p1[order] - p0[order]
    se2 = p2[order] - p0[order]

    rng = np.random.default_rng(0)
    n_rays = 512
    origin = rng.normal(size=(n_rays, 3)).astype(np.float32)
    origin = 3.0 * origin / np.linalg.norm(origin, axis=-1, keepdims=True)
    target = rng.normal(size=(n_rays, 3)).astype(np.float32) * 0.3
    direction = target - origin
    direction = (direction / np.linalg.norm(direction, axis=-1, keepdims=True)).astype(np.float32)

    hit = bvh_ops.intersect_closest(
        tree, jnp.asarray(sv0), jnp.asarray(se1), jnp.asarray(se2),
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.full(n_rays, 1e-4, jnp.float32), jnp.full(n_rays, 1e9, jnp.float32),
    )
    bf_tri, bf_t = _brute_force(p0, p1, p2, origin, direction)
    got_t = np.asarray(hit.t)
    # Distances must agree (tri ids can differ at shared edges).
    miss = bf_tri < 0
    assert np.array_equal(np.asarray(hit.tri) < 0, miss)
    ok = ~miss
    np.testing.assert_allclose(got_t[ok], bf_t[ok], rtol=1e-4, atol=1e-5)


def test_bvh_occlusion():
    p0, p1, p2 = _sphere_tris()
    tree = bvh_ops.build(p0, p1, p2)
    order = np.asarray(tree.tri_order)
    sv0, se1, se2 = p0[order], p1[order] - p0[order], p2[order] - p0[order]
    origin = np.asarray([[2.0, 0, 0], [2.0, 0, 0]], np.float32)
    direction = np.asarray([[-1.0, 0, 0], [1.0, 0, 0]], np.float32)
    occ = bvh_ops.intersect_any(
        tree, jnp.asarray(sv0), jnp.asarray(se1), jnp.asarray(se2),
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.full(2, 1e-4, jnp.float32), jnp.full(2, 1e9, jnp.float32),
    )
    assert bool(occ[0]) is True   # toward sphere
    assert bool(occ[1]) is False  # away


def test_bvh_refit_matches_rebuild():
    p0, p1, p2 = _sphere_tris()
    tree = bvh_ops.build(p0, p1, p2)
    # Deform: scale by 2.
    q0, q1, q2 = 2 * p0, 2 * p1, 2 * p2
    refitted = bvh_ops.refit(tree, jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(q2))
    lo = np.asarray(refitted.aabb_min)
    hi = np.asarray(refitted.aabb_max)
    # Root bounds must be exactly the scaled bounds.
    np.testing.assert_allclose(lo[0], np.minimum(np.minimum(q0, q1), q2).min(0), atol=1e-5)
    np.testing.assert_allclose(hi[0], np.maximum(np.maximum(q0, q1), q2).max(0), atol=1e-5)
    # And traversal still finds hits.
    order = np.asarray(tree.tri_order)
    sv0, se1, se2 = q0[order], q1[order] - q0[order], q2[order] - q0[order]
    origin = np.asarray([[5.0, 0, 0]], np.float32)
    direction = np.asarray([[-1.0, 0, 0]], np.float32)
    hit = bvh_ops.intersect_closest(
        refitted, jnp.asarray(sv0), jnp.asarray(se1), jnp.asarray(se2),
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.full(1, 1e-4, jnp.float32), jnp.full(1, 1e9, jnp.float32),
    )
    assert int(hit.tri[0]) >= 0
    assert abs(float(hit.t[0]) - 4.0) < 0.05


def test_conservative_bf16_boxes_contain_f32():
    """Outward-rounded bf16 wide boxes must CONTAIN their f32 boxes exactly
    (los <= f32 los, his >= f32 his) — the correctness precondition for a
    bf16 box-test kernel (traversal may over-visit, never miss)."""
    import numpy as np

    from gltf_renderer_tpu.ops.bvh import conservative_bf16_boxes

    rng = np.random.RandomState(11)
    lo = (rng.randn(512, 4, 3) * 100).astype(np.float32)
    hi = lo + rng.rand(512, 4, 3).astype(np.float32) * 10
    rows = np.concatenate([lo, hi], axis=2).reshape(512, 24)
    out = np.asarray(conservative_bf16_boxes(rows), np.float32).reshape(512, 4, 6)
    assert (out[:, :, 0:3] <= lo + 0).all(), "bf16 lo must round DOWN"
    assert (out[:, :, 3:6] >= hi - 0).all(), "bf16 hi must round UP"
    # Values that are exactly representable stay exact.
    exact = np.round(lo * 0 + 2.0, 0)
    rows2 = np.concatenate([exact, exact + 2.0], axis=2).reshape(512, 24)
    out2 = np.asarray(conservative_bf16_boxes(rows2), np.float32).reshape(512, 4, 6)
    np.testing.assert_array_equal(out2[:, :, 0:3], exact)
    np.testing.assert_array_equal(out2[:, :, 3:6], exact + 2.0)


def test_union_visit_quality_band():
    """Packet-union visit quality (the traversal cost driver,
    docs/PERFORMANCE.md round-3 study): pin the builder's union visits on a
    fixed scene to a band so construction changes can't silently regress
    packet cost. Bounds set ~15% above the all-axes binned SAH result."""
    import sys

    sys.path.insert(0, ".")
    from tools.bvh_union_sim import union_visits, wide_children

    rs = np.random.RandomState(5)
    c = rs.uniform(-1, 1, (5000, 3)).astype(np.float32)
    p0 = c + rs.uniform(-0.08, 0.08, (5000, 3)).astype(np.float32)
    p1 = c + rs.uniform(-0.08, 0.08, (5000, 3)).astype(np.float32)
    p2 = c + rs.uniform(-0.08, 0.08, (5000, 3)).astype(np.float32)
    tree = bvh_ops.build(p0, p1, p2)
    boxes, kids, leaf, root = wide_children(tree, 4)

    org = rs.uniform(-1, 1, (512, 3)).astype(np.float32)
    d = rs.randn(512, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nv, lv, _ = union_visits(
        boxes, kids, leaf, root, org, d,
        np.full(512, 1e-3, np.float32), np.full(512, 100.0, np.float32),
    )
    # all-axes binned SAH measured (264 nodes, 455 leaves) here; band +15%.
    assert nv + lv < 830, (nv, lv)
    # And the tree is sane: every triangle appears exactly once in order.
    assert sorted(np.asarray(tree.tri_order).tolist()) == list(range(5000))

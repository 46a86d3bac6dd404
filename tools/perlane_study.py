#!/usr/bin/env python
"""Per-lane (divergent) traversal feasibility study — offline, exact.

The packet kernel pays the UNION of the packet's node visits (~98% lane
waste on incoherent rays, docs/PERFORMANCE.md). A per-lane kernel would pay
each lane's OWN visits — but TPU has no per-lane gather from VMEM: Mosaic's
only vector-indexed primitive is tpu.dynamic_gather (register shuffle along
sublanes or lanes, jnp.take_along_axis on equal-shape 2D operands), so a
per-lane node fetch from an N-row table costs either a group-scan
(O(N/128) shuffle+select chains) or a one-hot MXU matmul (O(N) MACs/lane).
Per-step fetch cost therefore scales with TABLE SIZE, not visits.

This tool computes the exact per-ray visit distributions (true DFS with
dynamic t_best pruning and any-hit early exit) on the real bench scenes,
for 4/8/16-wide collapses, and derives the LOCKSTEP step counts a per-lane
kernel would pay (max over the 2048-lane packet) plus the break-even
per-step budget vs the measured packet kernel. Pair with
tools/bench_perlane.py (on-chip fetch-primitive microbench) to settle
VERDICT r3 item #1.

    python tools/perlane_study.py [helmet|courtyard]
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

# Measured packet-kernel reference points (docs/PERFORMANCE.md, v5e):
#   merged bounce+shadow dispatch ~105 ms / 524k rays = ~410 us / 2048-ray
#   packet; ~1267 pops/packet -> ~325 ns/pop.
PACKET_US = 410.0
PACKET = 2048


def slab_hit(box, o, inv, t_min, t_cap):
    t0 = (box[0:3] - o) * inv
    t1 = (box[3:6] - o) * inv
    tn = np.minimum(t0, t1).max()
    tf = np.maximum(t0, t1).min()
    return (tf >= max(tn, t_min)) and (tn <= t_cap), tn


def per_ray_traverse(boxes, kids, leaf, root, tree, slot_p0, slot_e1, slot_e2,
                     o, d, t_min, t_cap, any_hit, order="fixed"):
    """True per-ray traversal over the wide tree: DFS, dynamic t_best,
    any-hit early exit. Returns per-ray arrays (node_visits, leaf_visits,
    tri_tests). order='near' sorts children by entry distance (headroom
    probe); 'fixed' is build order (what a lockstep kernel would do)."""
    r = o.shape[0]
    first = np.asarray(tree.first)
    count = np.asarray(tree.count)
    nv = np.zeros(r, np.int64)
    lv = np.zeros(r, np.int64)
    tt = np.zeros(r, np.int64)
    width = kids.shape[1]
    for i in range(r):
        oi, di = o[i], d[i]
        inv = np.where(np.abs(di) > 1e-20, 1.0 / di, np.sign(di) * 1e30 + 1e30)
        t_best = t_cap[i]
        stack = [root]
        done = False
        while stack and not done:
            w = stack.pop()
            nv[i] += 1
            ents = []
            for c in range(width):
                b = boxes[w, c]
                if np.isnan(b[0]):
                    continue
                hit, tn = slab_hit(b, oi, inv, t_min[i], t_best)
                if not hit:
                    continue
                ents.append((tn, c))
            if order == "near":
                ents.sort(reverse=True)  # push far first -> pop near first
            else:
                ents = ents[::-1]        # build order: child 0 pops first
            for _tn, c in ents:
                if kids[w, c] >= 0:
                    stack.append(kids[w, c])
                elif leaf[w, c] >= 0:
                    # Test the leaf NOW (depth-first order).
                    lv[i] += 1
                    bn = leaf[w, c]
                    s = slice(first[bn], first[bn] + count[bn])
                    p0, e1, e2 = slot_p0[s], slot_e1[s], slot_e2[s]
                    tt[i] += p0.shape[0]
                    pv = np.cross(di, e2)
                    det = (e1 * pv).sum(-1)
                    ok = np.abs(det) > 1e-12
                    invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                    tv = oi - p0
                    u = (tv * pv).sum(-1) * invd
                    qv = np.cross(tv, e1)
                    v = (di * qv).sum(-1) * invd
                    t = (e2 * qv).sum(-1) * invd
                    h = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & \
                        (t > t_min[i]) & (t < t_best)
                    if h.any():
                        if any_hit:
                            done = True
                            break
                        t_best = t[h].min()
    return nv, lv, tt


def stats(name, a, packet=PACKET):
    a = np.asarray(a, np.float64)
    packs = a[: (len(a) // packet) * packet].reshape(-1, packet)
    mx = packs.max(1).mean() if len(packs) else a.max()
    print(f"  {name:<26s} mean {a.mean():7.1f}  p50 {np.percentile(a,50):6.0f}"
          f"  p95 {np.percentile(a,95):6.0f}  max {a.max():6.0f}"
          f"  lockstep(max/packet) {mx:7.1f}")
    return a.mean(), mx


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import build_bench_scene
    from gltf_renderer_tpu.ops import bvh as bvh_ops
    from gltf_renderer_tpu.render import pathtracer as pt
    from bvh_union_sim import wide_children, union_visits

    kind = sys.argv[1] if len(sys.argv) > 1 else "helmet"
    os.environ["BENCH_SCENE"] = kind
    W, H = 1920, 1080
    scene, meta, settings, params, c2w, n_tris = build_bench_scene(W, H)
    world = scene.world
    wpos = np.asarray(world.position)
    tv = np.asarray(world.tri_vertex)
    tree = jax.tree.map(np.asarray, scene.bvh)
    p0, e1, e2 = bvh_ops.gather_slot_triangles(tree, wpos, tv)
    p0, e1, e2 = np.asarray(p0), np.asarray(e1), np.asarray(e2)

    # --- Fixture: real primary hit points; bounce-like cosine rays
    # (closest-hit) + shadow-like uniform-sphere rays (any-hit), as in
    # bvh_union_sim.
    px_t, py_t, valid_t = pt._tile_order(W, H)
    rng = np.random.RandomState(0)
    center = np.argmin(np.abs(px_t - W // 2) + np.abs(py_t - H // 2))
    c0 = (int(center) // PACKET) * PACKET
    starts = [max(0, c0 + (i - 3) * PACKET) for i in range(6)]
    zero_j = jnp.zeros((PACKET, 2), jnp.float32)
    pts, nrm = [], []
    for s in starts:
        px = jnp.asarray(px_t[s : s + PACKET])
        py = jnp.asarray(py_t[s : s + PACKET])
        o, draw = pt.generate_camera_rays(px, py, (W, H), jnp.asarray(c2w), zero_j)
        ln = np.linalg.norm(np.asarray(draw), axis=-1)
        o = np.asarray(o)
        d = np.asarray(draw) / ln[:, None]
        hit = bvh_ops.intersect_closest_p(
            scene.packed, jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(PACKET), jnp.asarray(ln))
        hitm = np.asarray(hit.tri) >= 0
        t = np.asarray(hit.t)
        pts.append(o[hitm] + d[hitm] * t[hitm, None] * 0.9999)
    pts = np.concatenate(pts, 0)
    if len(pts) < PACKET:
        pts = np.tile(pts, (-(-PACKET // max(len(pts), 1)), 1))
    idx = rng.choice(len(pts), PACKET, replace=False)
    org = pts[idx].astype(np.float32)
    z = rng.rand(PACKET).astype(np.float32)
    phi = rng.rand(PACKET).astype(np.float32) * 2 * np.pi
    r_ = np.sqrt(np.maximum(1 - z * z, 0))
    d_inc = np.stack([r_ * np.cos(phi), r_ * np.sin(phi), z], -1).astype(np.float32)
    t_min = np.full(PACKET, 1e-3, np.float32)
    t_cap = np.full(PACKET, 1000.0, np.float32)

    print(f"{kind}: {n_tris} tris")
    for width in (4, 8, 16):
        boxes, kids, leaf, root = wide_children(tree, width)
        n_int = kids.shape[0]
        n_leaf = int((leaf >= 0).sum())
        uv_n, uv_l, _ = union_visits(boxes, kids, leaf, root, org, d_inc,
                                     t_min, t_cap)
        print(f"\nwidth {width}: interior nodes {n_int}, leaves {n_leaf}; "
              f"packet-union nodes {uv_n} leaves {uv_l}")
        # shadow-like: any-hit early exit
        nv, lv, tt = per_ray_traverse(boxes, kids, leaf, root, tree,
                                      p0, e1, e2, org, d_inc,
                                      t_min, t_cap, any_hit=True)
        n_mean, n_max = stats("shadow node visits", nv)
        l_mean, l_max = stats("shadow leaf visits", lv)
        # bounce-like: closest-hit with dynamic t_best
        nv2, lv2, tt2 = per_ray_traverse(boxes, kids, leaf, root, tree,
                                         p0, e1, e2, org, d_inc,
                                         t_min, t_cap, any_hit=False)
        n2_mean, n2_max = stats("bounce node visits", nv2)
        l2_mean, l2_max = stats("bounce leaf visits", lv2)
        nv3, lv3, _ = per_ray_traverse(boxes, kids, leaf, root, tree,
                                       p0, e1, e2, org, d_inc,
                                       t_min, t_cap, any_hit=False,
                                       order="near")
        stats("bounce visits (near-first)", nv3)
        stats("bounce leaves (near-first)", lv3)
        # Lockstep budget: the merged dispatch is ~50/50 bounce+shadow; a
        # per-lane kernel in lockstep pays max() node steps + max() leaf
        # steps per packet. Break-even per-step cost vs the measured packet
        # kernel (~PACKET_US us/packet):
        steps_node = max(n_max, n2_max)
        steps_leaf = max(l_max, l2_max)
        budget_node = PACKET_US / (steps_node + steps_leaf * 3.0)
        print(f"  lockstep steps: node {steps_node:.0f} + leaf {steps_leaf:.0f}"
              f" -> break-even {PACKET_US / (steps_node + steps_leaf):6.2f}"
              f" us/step (uniform), {budget_node:6.2f} us/node-step if leaf"
              f" steps cost 3x")


if __name__ == "__main__":
    main()

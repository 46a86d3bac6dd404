#!/usr/bin/env python
"""On-chip Mosaic-legality probe for the kernel paths that only ever ran in
interpret mode: bf16 node boxes (GLTF_TPU_BF16BOX) and the HBM-resident leaf
DMA (leaf_hbm=1/2). Tiny tables, one packet each — compiles + runs each
variant on the real device and compares against the all-VMEM f32 kernel, with
FULL tracebacks on failure (the unattended chip queue only keeps 5 stderr
lines, which was not enough to diagnose the courtyard2 crash).

    python tools/probe_kernel_paths.py
"""

import os
import sys
import traceback

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from gltf_renderer_tpu.ops import bvh as bvh_ops
from gltf_renderer_tpu.ops.pallas_trace import traverse_packets_wide


def build_tables(n_tris=600, seed=21):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    p0 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    p1 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    p2 = c + rs.uniform(-0.25, 0.25, (n_tris, 3)).astype(np.float32)
    tree = bvh_ops.build(p0, p1, p2)
    order = np.asarray(tree.tri_order)
    packed = bvh_ops.pack(
        tree, p0[order], (p1 - p0)[order], (p2 - p0)[order],
        order.astype(np.int32),
    )
    nodes_np = np.asarray(packed.nodes)
    is_leaf = nodes_np[:, 6] >= 0.0
    skip = nodes_np[:, 7].astype(np.int32)
    n = nodes_np.shape[0]
    right = np.full(n, -1, np.int32)
    internal = ~is_leaf
    right[internal] = skip[np.clip(np.nonzero(internal)[0] + 1, 0, n - 1)]
    flat = bvh_ops.FlatBVH(
        aabb_min=nodes_np[:, 0:3], aabb_max=nodes_np[:, 3:6],
        first=np.maximum(nodes_np[:, 6], 0).astype(np.int32),
        count=is_leaf.astype(np.int32), skip=skip, right=right,
        tri_order=None, levels=None,
    )
    maps, root_meta = bvh_ops.build_wide_maps(flat, width=4)
    wide = np.asarray(bvh_ops.assemble_wide(packed.nodes, maps))
    leaf_ids = jnp.asarray(maps.leaf_ids)
    recs = packed.records[leaf_ids]
    words = packed.words[leaf_ids]
    return wide, jnp.asarray(maps.meta), recs, words, root_meta


def rays(n_rays=2048, seed=22):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rs.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(n_rays, jnp.float32), jnp.full(n_rays, 20.0, jnp.float32))


def main():
    import jax

    print(f"[probe] backend={jax.default_backend()} dev={jax.devices()[0]}",
          flush=True)
    wide, meta, recs, words, root_meta = build_tables()
    o, d, t_min, t_max = rays()

    ref = None
    results = {}
    variants = [
        ("f32_vmem", dict()),
        ("bf16box", dict(bf16=True)),
        ("leaf_hbm1", dict(leaf_hbm=1)),
        ("leaf_hbm2", dict(leaf_hbm=2)),
        ("bf16box+hbm1", dict(bf16=True, leaf_hbm=1)),
    ]
    from gltf_renderer_tpu.ops.pallas_trace import pack_leaf_tiles

    tiles = jnp.asarray(pack_leaf_tiles(np.asarray(recs), np.asarray(words)))
    for name, opts in variants:
        nodes = wide
        if opts.get("bf16"):
            nodes = bvh_ops.pack_bf16_pairs(
                bvh_ops.conservative_bf16_boxes(wide))
        leaf_hbm = opts.get("leaf_hbm", False)
        recs_in = tiles if leaf_hbm else recs
        try:
            out = traverse_packets_wide(
                jnp.asarray(nodes), meta, recs_in, words, o, d, t_min, t_max,
                root_meta=root_meta, leaf_hbm=leaf_hbm,
            )
            out = jax.tree.map(np.asarray, out)
            results[name] = out
            if ref is None:
                ref = out
                print(f"[probe] {name}: OK (reference)", flush=True)
            else:
                t_r, w_r = ref[0], ref[1]
                t_o, w_o = out[0], out[1]
                hit_same = np.array_equal(w_r >= 0, w_o >= 0)
                hit = w_r >= 0
                t_close = np.allclose(t_o[hit], t_r[hit], rtol=1e-4, atol=1e-5)
                print(f"[probe] {name}: OK  hits_match={hit_same} "
                      f"t_match={t_close}", flush=True)
        except Exception:
            print(f"[probe] {name}: FAILED", flush=True)
            traceback.print_exc()
            print("-" * 60, flush=True)
    print("[probe] done", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Capture an on-chip op-level profile of the PT bench step and print the
ranked HLO breakdown (the round-4c workflow, one command).

    python tools/profile_capture.py [pt|raster] [--by-line]

Env: BENCH_SCENE / BENCH_SPP as for bench.py. Writes the raw trace to
/tmp/jtrace_<mode> and prints both the per-op and per-source-line rankings
via tools/profile_hlo.py helpers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def main():
    mode = "pt"
    for a in sys.argv[1:]:
        if a in ("pt", "raster"):
            mode = a
    import jax
    import jax.numpy as jnp

    import bench
    from gltf_renderer_tpu.render import pathtracer as pt

    bench._warm_pallas()
    W, H = int(os.environ.get("BENCH_WIDTH", 1920)), int(os.environ.get("BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("BENCH_SPP", 4))
    scene, meta, settings, params, c2w, n_tris = bench.build_bench_scene(W, H)
    trace_dir = f"/tmp/jtrace_{mode}"

    if mode == "pt":
        def frame(seed):
            return pt.trace_chunked(scene, meta, settings, params, c2w,
                                    (W, H), jnp.uint32(seed), with_stats=True,
                                    spp=spp)
        t0 = time.time()
        jax.block_until_ready(frame(0))
        print(f"[profile] warm frame in {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        with jax.profiler.trace(trace_dir):
            outs = [frame(2), frame(3)]
            jax.block_until_ready(outs)
        n_frames = 2
        print(f"[profile] traced {n_frames} frames in {time.time() - t0:.1f}s",
              file=sys.stderr)
    else:
        from gltf_renderer_tpu.render import settings as S
        from gltf_renderer_tpu.render.renderer import _post_step, _raster_step

        rs = S.RenderSettings(backend="rasterizer", width=W, height=H)
        cam_pos = jnp.zeros(3)

        def frame(seed):
            hdr = _raster_step(scene, meta, rs, params, c2w, cam_pos, (W, H),
                               jnp.uint32(seed), "raycast")
            return _post_step(hdr, rs.tonemap, rs.bloom, jnp.uint32(seed))
        t0 = time.time()
        jax.block_until_ready(frame(0))
        print(f"[profile] warm frame in {time.time() - t0:.1f}s", file=sys.stderr)
        with jax.profiler.trace(trace_dir):
            outs = [frame(2), frame(3)]
            jax.block_until_ready(outs)
        n_frames = 2

    from tools.profile_hlo import load_hlo_stats
    import json
    import re

    d = load_hlo_stats(trace_dir)
    cols = [c["label"] for c in d["cols"]]
    I = {c: i for i, c in enumerate(cols)}
    rows = d["rows"]

    def v(r, c):
        return r["c"][I[c]].get("v")

    def src(r):
        raw = re.sub(r"<[^>]*>", "", str(v(r, "Source Info") or "")).strip()
        return raw.split("/")[-1] if raw else "?"

    total = sum(v(r, "Total self time (us)") for r in rows)
    print(f"total device time: {total / 1e3:.1f} ms over {n_frames} frames "
          f"= {total / 1e3 / n_frames:.1f} ms/frame")
    print("--- top 30 ops ---")
    for r in rows[:30]:
        print(f"{v(r, 'Total self time (us)') / 1e3:8.2f}ms "
              f"{v(r, 'Total self time (%)'):5.1f}% "
              f"x{int(v(r, '#Occurrences')):4d} "
              f"{v(r, 'HLO op category'):18s} "
              f"{(v(r, 'Bound by') or ''):8s}"
              f"{v(r, 'Measured memory BW (GiB/s)'):8.1f}GB/s  "
              f"{src(r)[:40]:40s} "
              f"{(v(r, 'Framework op name') or '')[:44]}")
    print("--- by source line ---")
    from collections import defaultdict
    agg = defaultdict(float)
    for r in rows:
        agg[(src(r), v(r, "HLO op category"))] += v(r, "Total self time (us)")
    for (loc, cat), us in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us / 1e3:9.2f}ms {100 * us / total:5.1f}%  {cat:18s} {loc}")


if __name__ == "__main__":
    main()

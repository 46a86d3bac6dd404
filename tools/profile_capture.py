#!/usr/bin/env python
"""Capture an on-chip op-level profile of the PT bench step and print the
ranked HLO breakdown (the round-4c workflow, one command).

    python tools/profile_capture.py [pt|raster] [--by-line]

Env: BENCH_SCENE / BENCH_SPP as for bench.py. Writes the raw trace to
/tmp/jtrace_<mode>; prints the per-op AND per-source-line rankings by
default, only the by-line aggregation with --by-line (shared formatting
lives in tools/profile_hlo.print_rankings).
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
    by_line = True if "--by-line" in sys.argv else None
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
        t0 = time.time()
        with jax.profiler.trace(trace_dir):
            outs = [frame(2), frame(3)]
            jax.block_until_ready(outs)
        n_frames = 2
        print(f"[profile] traced {n_frames} frames in {time.time() - t0:.1f}s",
              file=sys.stderr)

    from tools.profile_hlo import load_hlo_stats, print_rankings

    print_rankings(load_hlo_stats(trace_dir), top_n=30, by_line=by_line,
                   n_frames=n_frames)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Raster-backend frame rate at 1080p on the bench (DamagedHelmet-class)
scene with IBL + bloom + AgX (BASELINE config 2). Pipelined timing: enqueue
K frames, block once (tunnel RPC otherwise pollutes per-frame numbers)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def main():
    from bench import build_bench_scene
    from gltf_renderer_tpu.render import settings as S
    from gltf_renderer_tpu.render.renderer import _post_step, _raster_step

    W, H = (int(x) for x in (sys.argv[1:3] or (1920, 1080)))
    scene, meta, _settings, params, c2w, n_tris = build_bench_scene(W, H)
    rs = S.RenderSettings(backend="rasterizer", width=W, height=H)
    cam_pos = jnp.zeros(3)

    def frame(i):
        hdr = _raster_step(scene, meta, rs, params, c2w, cam_pos, (W, H),
                           jnp.uint32(i))
        return _post_step(hdr, rs.tonemap, rs.bloom, jnp.uint32(i))

    t0 = time.time()
    out = frame(0)
    jax.block_until_ready(out)
    print(f"[raster] first frame (compile): {time.time() - t0:.1f}s",
          file=sys.stderr)

    K = 8
    t0 = time.time()
    outs = [frame(i + 1) for i in range(K)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / K
    img = np.asarray(outs[-1])
    print(f"raster {W}x{H} {n_tris} tris: {dt * 1e3:.1f} ms/frame "
          f"({1.0 / dt:.2f} FPS)  mean={img.mean():.1f} std={img.std():.1f}")

    # Split: draw_scene alone vs post (bloom+AgX) alone.
    t0 = time.time()
    hdrs = [_raster_step(scene, meta, rs, params, c2w, cam_pos, (W, H),
                         jnp.uint32(i)) for i in range(K)]
    jax.block_until_ready(hdrs)
    print(f"  draw_scene only: {(time.time() - t0) / K * 1e3:.1f} ms")
    t0 = time.time()
    posts = [_post_step(hdrs[-1], rs.tonemap, rs.bloom, jnp.uint32(i))
             for i in range(K)]
    jax.block_until_ready(posts)
    print(f"  post only      : {(time.time() - t0) / K * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

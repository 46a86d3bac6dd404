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

    def frame(i, vis="raycast"):
        hdr = _raster_step(scene, meta, rs, params, c2w, cam_pos, (W, H),
                           jnp.uint32(i), vis)
        return _post_step(hdr, rs.tonemap, rs.bloom, jnp.uint32(i))

    K = 8
    for vis in ("raycast", "tiled"):
        t0 = time.time()
        out = frame(0, vis)
        jax.block_until_ready(out)
        print(f"[raster] {vis}: first frame (compile): {time.time() - t0:.1f}s",
              file=sys.stderr)

        t0 = time.time()
        outs = [frame(i + 1, vis) for i in range(K)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / K
        img = np.asarray(outs[-1])
        print(f"raster[{vis}] {W}x{H} {n_tris} tris: {dt * 1e3:.1f} ms/frame "
              f"({1.0 / dt:.2f} FPS)  mean={img.mean():.1f} std={img.std():.1f}")

        # Split: draw_scene alone vs post (bloom+AgX) alone.
        t0 = time.time()
        hdrs = [_raster_step(scene, meta, rs, params, c2w, cam_pos, (W, H),
                             jnp.uint32(i), vis) for i in range(K)]
        jax.block_until_ready(hdrs)
        print(f"  draw_scene only: {(time.time() - t0) / K * 1e3:.1f} ms")
        t0 = time.time()
        posts = [_post_step(hdrs[-1], rs.tonemap, rs.bloom, jnp.uint32(i))
                 for i in range(K)]
        jax.block_until_ready(posts)
        print(f"  post only      : {(time.time() - t0) / K * 1e3:.1f} ms")

    # Post-stage internals (bloom vs tonemap vs dither vs u8).
    from gltf_renderer_tpu.post.bloom import bloom as bloom_op
    from gltf_renderer_tpu.post.tonemap import to_u8, tonemap

    hdr = hdrs[-1]
    stages = {
        "bloom only": jax.jit(lambda x: bloom_op(x, rs.bloom.max_mips,
                                                 rs.bloom.strength)),
        "tonemap+dither": jax.jit(lambda x: tonemap(x, rs.tonemap.tonemapper,
                                                    rs.tonemap.exposure, 1)),
        "tonemap no dither": jax.jit(
            lambda x: tonemap(x, rs.tonemap.tonemapper, rs.tonemap.exposure, 1,
                              apply_dither=False)),
        "to_u8": jax.jit(lambda x: to_u8(jnp.clip(x, 0, 1))),
    }
    for name, fn in stages.items():
        out = fn(hdr)
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(hdr) for _ in range(K)]
        jax.block_until_ready(outs)
        print(f"  {name:18s}: {(time.time() - t0) / K * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

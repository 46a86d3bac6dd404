#!/usr/bin/env python
"""Bloom layout experiment on TPU: (H, W, 3) channel-minor vs (3, H, W)
planar. Channel-minor puts C=3 in the 128-wide lane dimension (125/128 lanes
idle on every VPU op); planar puts W there. Pipelined timing."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit_pipe(fn, *args, k=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(k)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.post.bloom import bloom

    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))

    cur = jax.jit(lambda x: bloom(x, 4, 0.01))
    print(f"bloom (H,W,3) current   : {timeit_pipe(cur, img):7.1f} ms")

    # --- planar variant -----------------------------------------------------
    def box2p(x):
        return 0.25 * (x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
                       + x[:, 0::2, 1::2] + x[:, 1::2, 1::2])

    def pad1p(x):
        return jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")

    def shiftp(pad, h, w, dy, dx):
        return pad[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    def downp(x, oh, ow):
        crop = x[:, : 2 * oh, : 2 * ow]
        pad = pad1p(crop)
        c = box2p(crop)
        d = (box2p(shiftp(pad, 2 * oh, 2 * ow, 1, 1))
             + box2p(shiftp(pad, 2 * oh, 2 * ow, -1, -1))
             + box2p(shiftp(pad, 2 * oh, 2 * ow, -1, 1))
             + box2p(shiftp(pad, 2 * oh, 2 * ow, 1, -1)))
        return (4.0 * c + d) / 8.0

    from gltf_renderer_tpu.post.bloom import _tent_phase_weights

    def upp(x, oh, ow):
        ch, h, w = x.shape
        weights = _tent_phase_weights()
        pad = pad1p(x)
        phases = {}
        for (pi, pj), wgt in weights.items():
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    cw = wgt[dy + 1, dx + 1]
                    if cw == 0.0:
                        continue
                    term = cw * shiftp(pad, h, w, dy, dx)
                    acc = term if acc is None else acc + term
            phases[(pi, pj)] = acc
        out = jnp.stack(
            [jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3),
             jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3)],
            axis=2,
        ).reshape(ch, 2 * h, 2 * w)
        if oh > 2 * h or ow > 2 * w:
            out = jnp.pad(out, ((0, 0), (0, oh - 2 * h), (0, ow - 2 * w)),
                          mode="edge")
        return out[:, :oh, :ow]

    def bloom_planar(x, iterations=4, strength=0.01):
        p = x.transpose(2, 0, 1)
        h, w = p.shape[1], p.shape[2]
        sizes = []
        ch, cw = h, w
        for _ in range(iterations):
            ch, cw = max(ch // 2, 1), max(cw // 2, 1)
            sizes.append((ch, cw))
        cur_ = p
        mips = []
        for (mh, mw) in sizes:
            cur_ = downp(cur_, mh, mw)
            mips.append(cur_)
        cur_ = mips[-1]
        for i in range(iterations - 2, -1, -1):
            cur_ = upp(cur_, *sizes[i])
        blur = upp(cur_, h, w)
        return (p + strength * blur).transpose(1, 2, 0)

    pl = jax.jit(lambda x: bloom_planar(x, 4, 0.01))
    print(f"bloom (3,H,W) planar    : {timeit_pipe(pl, img):7.1f} ms")
    a = np.asarray(cur(img))
    b = np.asarray(pl(img))
    print(f"  maxdiff vs current    : {np.abs(a - b).max():.2e}")

    # Isolate pieces, both layouts.
    from gltf_renderer_tpu.post.bloom import _box2, _pad1, downsample, upsample_tent

    imgp = img.transpose(2, 0, 1)
    print(f"box2   (H,W,3): {timeit_pipe(jax.jit(_box2), img):7.1f} ms | "
          f"(3,H,W): {timeit_pipe(jax.jit(box2p), imgp):7.1f} ms")
    print(f"down   (H,W,3): {timeit_pipe(jax.jit(lambda x: downsample(x, H//2, W//2)), img):7.1f} ms | "
          f"(3,H,W): {timeit_pipe(jax.jit(lambda x: downp(x, H//2, W//2)), imgp):7.1f} ms")
    h2 = jnp.asarray(rng.rand(H // 2, W // 2, 3).astype(np.float32))
    h2p = h2.transpose(2, 0, 1)
    print(f"uptent (H,W,3): {timeit_pipe(jax.jit(lambda x: upsample_tent(x, H, W)), h2):7.1f} ms | "
          f"(3,H,W): {timeit_pipe(jax.jit(lambda x: upp(x, H, W)), h2p):7.1f} ms")


if __name__ == "__main__":
    main()

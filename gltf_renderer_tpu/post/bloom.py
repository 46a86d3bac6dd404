"""Dual-filter bloom (Bjørge, "Bandwidth-Efficient Rendering").

Port of Bloom.cpp:57-164 + BloomDownsample/Upsample.cs.hlsl: half-res 5-tap
downsample chain, 9-tap tent upsample chain that OVERWRITES intermediate mips
(upsample input_scale=1 / output_scale=0, Bloom.cpp:137-141), final composite
image += strength * tent(mip0). No threshold — physically-ish energy bloom.

TPU note: at the exact 2x mip ratios every tap lands on integer or
quarter-pixel offsets, so both filters compile to SHIFTED-SLICE arithmetic
(pure VPU adds on edge-padded crops) instead of per-pixel gathers — the
gather formulation measured ~700 ms for the 1080p chain, the slice one is
fused elementwise work. Odd mip edges use edge-clamp padding (equivalent to
the sampler's clamp addressing; the bottom/right odd row of an odd-sized mip
is dropped, a sub-texel deviation from non-integer-ratio bilinear scaling).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _bilinear(img, u, v):
    """Bilinear sample of (H, W, 3) at uv in [0,1], clamp addressing.

    Gather-based general-ratio path (kept for callers resampling at
    arbitrary ratios, e.g. the Jimenez 13-tap at odd sizes and tests)."""
    h, w = img.shape[0], img.shape[1]
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    def fetch(xi, yi):
        return img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (c00 * (1 - tx) + c10 * tx) * (1 - ty) + (c01 * (1 - tx) + c11 * tx) * ty


def _uv_grid(h, w):
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return uu, vv


def _box2(img):
    """Mean of each 2x2 block == bilinear center tap at the 2x ratio."""
    return 0.25 * (
        img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
    )


def _pad1(img):
    """Edge-clamp pad by 1 pixel (shared by every shifted tap — ONE copy)."""
    return jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")


def _shifted(pad, h, w, dy, dx):
    """(dy, dx)-shifted h x w view of a _pad1-padded array."""
    return pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def downsample(img, out_h, out_w):
    """BloomDownsample.cs.hlsl: 4*center + 4 diagonal taps at ±0.5 texel."""
    h, w = img.shape[0], img.shape[1]
    crop = img[: 2 * out_h, : 2 * out_w]
    if h >= 2 * out_h and w >= 2 * out_w:
        # 2x fast path: center tap = 2x2 box; the ±0.5-out-texel diagonal
        # taps are the same box on ±1-input-pixel shifted (clamped) crops.
        ch, cw = 2 * out_h, 2 * out_w
        pad = _pad1(crop)
        c = _box2(crop)
        d = (
            _box2(_shifted(pad, ch, cw, 1, 1))
            + _box2(_shifted(pad, ch, cw, -1, -1))
            + _box2(_shifted(pad, ch, cw, -1, 1))
            + _box2(_shifted(pad, ch, cw, 1, -1))
        )
        return (4.0 * c + d) / 8.0
    uu, vv = _uv_grid(out_h, out_w)
    du, dv = 0.5 / out_w, 0.5 / out_h
    r = 4.0 * _bilinear(img, uu, vv)
    r = r + _bilinear(img, uu + du, vv + dv)
    r = r + _bilinear(img, uu - du, vv - dv)
    r = r + _bilinear(img, uu - du, vv + dv)
    r = r + _bilinear(img, uu + du, vv - dv)
    return r / 8.0


@functools.lru_cache(maxsize=1)
def _tent_phase_weights():
    """3x3 input-neighborhood weights for each of the 4 output phases of the
    9-tap tent at the exact 2x ratio (all taps land on ±0.25/±0.75-pixel
    offsets -> fixed bilinear weight distributions)."""
    taps = [((1, 0), 2.0), ((-1, 0), 2.0), ((0, 1), 2.0), ((0, -1), 2.0),
            ((1, 1), 1.0), ((-1, 1), 1.0), ((1, -1), 1.0), ((-1, -1), 1.0)]
    weights = {}
    for pi in (0, 1):
        for pj in (0, 1):
            wgt = np.zeros((3, 3))
            fy0 = (pi - 0.5) * 0.5
            fx0 = (pj - 0.5) * 0.5
            for (tx_, ty_), tw in taps:
                fx = fx0 + 0.5 * tx_
                fy = fy0 + 0.5 * ty_
                x0 = int(np.floor(fx))
                y0 = int(np.floor(fy))
                ax = fx - x0
                ay = fy - y0
                for dy, wy in ((y0, 1 - ay), (y0 + 1, ay)):
                    for dx, wx in ((x0, 1 - ax), (x0 + 1, ax)):
                        if wx * wy:
                            wgt[dy + 1, dx + 1] += tw * wx * wy
            weights[(pi, pj)] = wgt / 12.0
    return weights


def upsample_tent(img, out_h, out_w):
    """BloomUpsample.cs.hlsl 9-tap tent (without composite scaling)."""
    h, w = img.shape[0], img.shape[1]
    if out_h in (2 * h, 2 * h + 1) and out_w in (2 * w, 2 * w + 1):
        # 2x fast path: each output phase is a fixed 3x3 stencil of the
        # input — shifted-slice multiply-adds, interleaved per phase.
        weights = _tent_phase_weights()
        pad = _pad1(img)
        phases = {}
        for (pi, pj), wgt in weights.items():
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    c = wgt[dy + 1, dx + 1]
                    if c == 0.0:
                        continue
                    term = c * _shifted(pad, h, w, dy, dx)
                    acc = term if acc is None else acc + term
            phases[(pi, pj)] = acc
        # Interleave the 4 phases: (h, 2, w, 2, C) -> (2h, 2w, C), no scatter.
        out = jnp.stack(
            [
                jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=2),
                jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=2),
            ],
            axis=1,
        ).reshape(2 * h, 2 * w, img.shape[2])
        if out_h > 2 * h or out_w > 2 * w:  # odd target: replicate edge row/col
            out = jnp.pad(
                out, ((0, out_h - 2 * h), (0, out_w - 2 * w), (0, 0)),
                mode="edge",
            )
        return out[:out_h, :out_w]
    uu, vv = _uv_grid(out_h, out_w)
    du, dv = 1.0 / out_w, 1.0 / out_h
    r = 2.0 * (
        _bilinear(img, uu + du, vv)
        + _bilinear(img, uu - du, vv)
        + _bilinear(img, uu, vv + dv)
        + _bilinear(img, uu, vv - dv)
    )
    r = r + _bilinear(img, uu + du, vv + dv)
    r = r + _bilinear(img, uu - du, vv + dv)
    r = r + _bilinear(img, uu + du, vv - dv)
    r = r + _bilinear(img, uu - du, vv - dv)
    return r / 12.0


def bloom(img, iterations: int = 4, strength: float = 0.01, max_iterations: int = 6):
    """Bloom::Execute port. img (H, W, 3) HDR; returns img + strength*blur."""
    iterations = min(iterations, max_iterations)
    h, w = img.shape[0], img.shape[1]
    sizes = []
    ch, cw = h, w
    for _ in range(iterations):
        ch, cw = max(ch // 2, 1), max(cw // 2, 1)
        sizes.append((ch, cw))
    if not sizes:
        return img
    mips = []
    cur = img
    for (mh, mw) in sizes:
        cur = downsample(cur, mh, mw)
        mips.append(cur)
    # Upsample chain overwrites intermediate mips (Bloom.cpp:131-147).
    cur = mips[-1]
    for i in range(iterations - 2, -1, -1):
        mh, mw = sizes[i]
        cur = upsample_tent(cur, mh, mw)
    blur = upsample_tent(cur, h, w)
    return img + strength * blur

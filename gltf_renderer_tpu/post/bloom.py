"""Dual-filter bloom (Bjørge, "Bandwidth-Efficient Rendering").

Port of Bloom.cpp:57-164 + BloomDownsample/Upsample.cs.hlsl: half-res 5-tap
downsample chain, 9-tap tent upsample chain that OVERWRITES intermediate mips
(upsample input_scale=1 / output_scale=0, Bloom.cpp:137-141), final composite
image += strength * tent(mip0). No threshold — physically-ish energy bloom.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear(img, u, v):
    """Bilinear sample of (H, W, 3) at uv in [0,1], clamp addressing."""
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


def downsample(img, out_h, out_w):
    """BloomDownsample.cs.hlsl: 4*center + 4 diagonal taps at ±0.5 texel."""
    uu, vv = _uv_grid(out_h, out_w)
    du, dv = 0.5 / out_w, 0.5 / out_h
    r = 4.0 * _bilinear(img, uu, vv)
    r = r + _bilinear(img, uu + du, vv + dv)
    r = r + _bilinear(img, uu - du, vv - dv)
    r = r + _bilinear(img, uu - du, vv + dv)
    r = r + _bilinear(img, uu + du, vv - dv)
    return r / 8.0


def upsample_tent(img, out_h, out_w):
    """BloomUpsample.cs.hlsl 9-tap tent (without composite scaling)."""
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

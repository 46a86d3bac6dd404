"""HDR image IO: Radiance .hdr (RGBE) and OpenEXR readers, pure Python/numpy.

The reference uses stb_image (EnvironmentMap.cpp:253-289) for .hdr and tinyexr
(EnvironmentMap.cpp:148-251) for .exr. This environment has no OpenEXR binding,
so both formats are parsed directly: RGBE with new-style RLE, EXR scanline
images with NONE/ZIPS/ZIP compression (half & float channels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# Radiance .hdr (RGBE)
# ---------------------------------------------------------------------------

def read_hdr(path: str) -> np.ndarray:
    """Returns (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    # Header ends with a blank line; next line is the resolution.
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    res_line = data[pos:eol].decode("ascii").split()
    if res_line[0] != "-Y" or res_line[2] != "+X":
        raise ValueError(f"unsupported HDR orientation: {' '.join(res_line)}")
    height, width = int(res_line[1]), int(res_line[3])
    pos = eol + 1

    rgbe = np.zeros((height, width, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    for y in range(height):
        # New-style RLE scanline?
        if width >= 8 and width < 32768 and buf[pos] == 2 and buf[pos + 1] == 2:
            if (int(buf[pos + 2]) << 8 | int(buf[pos + 3])) != width:
                raise ValueError("HDR scanline width mismatch")
            pos += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(buf[pos])
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = buf[pos + 1]
                        x += count - 128
                        pos += 2
                    else:  # literal
                        rgbe[y, x : x + count, c] = buf[pos + 1 : pos + 1 + count]
                        x += count
                        pos += 1 + count
        else:
            flat = buf[pos : pos + width * 4].reshape(width, 4)
            rgbe[y] = flat
            pos += width * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * np.where(
        exp[..., None] > 0, 1.0, 0.0
    ).astype(np.float32)


def write_hdr(path: str, image: np.ndarray):
    """Write (H, W, 3) float32 as uncompressed RGBE (for tests/tools)."""
    image = np.maximum(np.asarray(image, np.float32), 0.0)
    h, w = image.shape[:2]
    maxc = image.max(-1)
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w), np.float64)
    nz = maxc > 1e-32
    m, e = np.frexp(maxc[nz])
    scale = (256.0 / maxc[nz]) * m
    rgbe = np.zeros((h, w, 4), np.uint8)
    vals = np.clip(image[nz] * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[nz, :3] = vals
    rgbe[nz, 3] = (e + 128).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


# ---------------------------------------------------------------------------
# OpenEXR (scanline, NONE/ZIPS/ZIP)
# ---------------------------------------------------------------------------

_PIXEL_DTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}


def _read_exr_header(data, pos):
    attrs = {}
    while True:
        if data[pos] == 0:
            return attrs, pos + 1
        end = data.index(b"\x00", pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b"\x00", pos)
        atype = data[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        attrs[name] = (atype, data[pos : pos + size])
        pos += size


def read_exr(path: str) -> np.ndarray:
    """Returns (H, W, C<=4) float32 (channels in R, G, B, A order if named so)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<iI", data, 0)
    if magic != 20000630:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("tiled EXR not supported")
    attrs, pos = _read_exr_header(data, 8)

    # Channels.
    chan_data = attrs["channels"][1]
    channels = []
    cpos = 0
    while chan_data[cpos] != 0:
        end = chan_data.index(b"\x00", cpos)
        cname = chan_data[cpos:end].decode()
        cpos = end + 1
        ctype, _plin, _x, _y = struct.unpack_from("<iBxxxii", chan_data, cpos)
        cpos += 16
        channels.append((cname, ctype))
    channels_sorted = sorted(channels)  # EXR stores channels alphabetically

    comp = attrs["compression"][1][0]
    if comp not in (0, 2, 3, 4):
        raise ValueError(f"EXR compression {comp} not supported (none/zip/piz)")
    lines_per_block = {0: 1, 2: 1, 3: 16, 4: 32}[comp]

    xmin, ymin, xmax, ymax = struct.unpack("<iiii", attrs["dataWindow"][1])
    width = xmax - xmin + 1
    height = ymax - ymin + 1

    n_blocks = -(-height // lines_per_block)
    offsets = struct.unpack_from(f"<{n_blocks}Q", data, pos)

    out = {name: np.zeros((height, width), np.float32) for name, _ in channels}
    bytes_per_px = {0: 4, 1: 2, 2: 4}
    line_bytes = sum(bytes_per_px[t] * width for _, t in channels)

    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        raw = data[off + 8 : off + 8 + size]
        n_lines = min(lines_per_block, ymax - y + 1)
        expect = line_bytes * n_lines
        if comp == 4 and size < expect:
            from gltf_renderer_tpu.env.piz import piz_uncompress

            chan_types = [(n_, t_) for n_, t_ in channels_sorted]
            raw = piz_uncompress(raw, chan_types, width, n_lines)
        elif comp == 4:
            pass  # stored uncompressed (compression didn't help)
        if comp in (2, 3):
            raw = zlib.decompress(raw)
            # EXR zip post-process: un-delta (d[i] = d[i-1] + raw[i] - 128,
            # d[0] = raw[0]) then de-interleave halves.
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            d = np.mod(np.cumsum(b - 128) + 128, 256).astype(np.uint8)
            half = (len(d) + 1) // 2
            inter = np.zeros(len(d), np.uint8)
            inter[0::2] = d[:half]
            inter[1::2] = d[half:]
            raw = inter.tobytes()
        if len(raw) != expect:
            raise ValueError("EXR block size mismatch")
        bpos = 0
        for li in range(n_lines):
            for cname, ctype in channels_sorted:
                nb = bytes_per_px[ctype] * width
                line = np.frombuffer(raw, _PIXEL_DTYPE[ctype], count=width, offset=bpos)
                out[cname][y - ymin + li] = line.astype(np.float32)
                bpos += nb

    order = [c for c in ("R", "G", "B", "A") if c in out]
    if not order:
        order = [channels[0][0]]
    return np.stack([out[c] for c in order], -1)


def write_exr(path: str, image: np.ndarray):
    """Minimal uncompressed float32 scanline EXR writer (for tests/tools)."""
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    c = 1 if image.ndim == 2 else image.shape[2]
    names = ["Y"] if c == 1 else ["R", "G", "B", "A"][:c]
    chans = sorted(names)

    def attr(name, atype, payload):
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + struct.pack("<I", len(payload)) + payload

    chan_payload = b""
    for n in chans:
        chan_payload += n.encode() + b"\x00" + struct.pack("<iBxxxii", 2, 0, 1, 1)
    chan_payload += b"\x00"

    header = b""
    header += attr("channels", "chlist", chan_payload)
    header += attr("compression", "compression", b"\x00")
    header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    img = image.reshape(h, w, c)
    name_to_idx = {n: i for i, n in enumerate(names)}
    line_bytes = 4 * w * c
    table_pos = 8 + len(header)
    data_pos = table_pos + 8 * h
    offsets = [data_pos + i * (8 + line_bytes) for i in range(h)]
    with open(path, "wb") as f:
        f.write(struct.pack("<iI", 20000630, 2))
        f.write(header)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<ii", y, line_bytes))
            for n in chans:
                f.write(img[y, :, name_to_idx[n]].tobytes())


def read_environment_image(path: str) -> np.ndarray:
    """Dispatch on extension -> (H, W, 3) float32 equirect radiance."""
    lower = path.lower()
    if lower.endswith(".hdr"):
        return read_hdr(path)[..., :3]
    if lower.endswith(".exr"):
        img = read_exr(path)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
        return img[..., :3]
    raise ValueError(f"unsupported environment image: {path}")

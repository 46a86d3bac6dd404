"""PIZ decompression for OpenEXR (wavelet + Huffman), pure Python/numpy.

Implements the PIZ scanline-block codec per the OpenEXR specification
(bitmap/LUT + canonical Huffman with zero-run codes + 2D Haar-like wavelet).
Slow-but-correct: environment maps load once.
"""

from __future__ import annotations

import struct

import numpy as np

HUF_ENCBITS = 16
HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1
HUF_DECBITS = 14
HUF_DECSIZE = 1 << HUF_DECBITS
HUF_DECMASK = HUF_DECSIZE - 1

A_OFFSET = 1 << 14
MOD_MASK = (1 << 16) - 1

NBITS = 16
M_OFFSET = 1 << (NBITS - 1)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0       # bit buffer
        self.lc = 0      # bits in buffer

    def get_bits(self, n: int) -> int:
        while self.lc < n:
            self.c = (self.c << 8) | self.data[self.pos]
            self.pos += 1
            self.lc += 8
        self.lc -= n
        return (self.c >> self.lc) & ((1 << n) - 1)


def _unpack_enc_table(br: _BitReader, im: int, iM: int):
    """hufUnpackEncTable: 6-bit code lengths with zero-run codes."""
    hcode = np.zeros(HUF_ENCSIZE, np.int64)
    i = im
    while i <= iM:
        l = br.get_bits(6)
        hcode[i] = l
        if l == 63:  # LONG_ZEROCODE_RUN
            zerun = br.get_bits(8) + 6  # SHORTEST_LONG_RUN = 59 + 2 - 63 + 8...
            for _ in range(zerun):
                hcode[i] = 0
                i += 1
            i -= 1
        elif l >= 59:  # SHORT_ZEROCODE_RUN
            zerun = l - 59 + 2
            for _ in range(zerun):
                hcode[i] = 0
                i += 1
            i -= 1
        i += 1
    _build_canonical_codes(hcode)
    return hcode


def _build_canonical_codes(hcode):
    """hufCanonicalCodeTable: lengths -> canonical codes (in place:
    hcode[i] = code << 6 | length)."""
    n = np.zeros(59, np.int64)
    lens = hcode.copy()
    for l in lens:
        n[l] += 1
    c = 0
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        n[i] = c
        c = nc
    for i in range(HUF_ENCSIZE):
        l = int(lens[i])
        if l > 0:
            hcode[i] = (l | (int(n[l]) << 6))
            n[l] += 1


def _huf_length(code):
    return code & 63


def _huf_code(code):
    return code >> 6


def _build_dec_table(hcode, im, iM):
    """hufBuildDecTable: short-code lookup + long-code lists."""
    fast_len = np.zeros(HUF_DECSIZE, np.int32)
    fast_lit = np.zeros(HUF_DECSIZE, np.int64)
    longs = {}
    for c in range(im, iM + 1):
        l = _huf_length(int(hcode[c]))
        code = _huf_code(int(hcode[c]))
        if l == 0:
            continue
        if l > HUF_DECBITS:
            pl = code >> (l - HUF_DECBITS)
            longs.setdefault(pl, []).append(c)
        else:
            base = code << (HUF_DECBITS - l)
            count = 1 << (HUF_DECBITS - l)
            fast_len[base : base + count] = l
            fast_lit[base : base + count] = c
    return fast_len, fast_lit, longs


def _huf_decode(data: bytes, nbits: int, hcode, fast_len, fast_lit, longs, rlc, n_out):
    """hufDecode: bitstream -> n_out u16 symbols."""
    out = np.zeros(n_out, np.uint16)
    oi = 0
    c = 0
    lc = 0
    pos = 0
    n_bytes = (nbits + 7) // 8

    def get_char():
        nonlocal c, lc, pos
        c = (c << 8) | data[pos]
        pos += 1
        lc += 8

    while pos < n_bytes:
        get_char()
        while lc >= HUF_DECBITS:
            idx = (c >> (lc - HUF_DECBITS)) & HUF_DECMASK
            l = int(fast_len[idx])
            if l > 0:
                lc -= l
                sym = int(fast_lit[idx])
                # run-length code?
                if sym == rlc:
                    if lc < 8:
                        get_char()
                    run = (c >> (lc - 8)) & 0xFF
                    lc -= 8
                    out[oi : oi + run] = out[oi - 1]
                    oi += run
                else:
                    out[oi] = sym
                    oi += 1
            else:
                # long code: search the candidate list
                found = False
                for sym in longs.get(idx, ()):
                    code_l = _huf_length(int(hcode[sym]))
                    code_c = _huf_code(int(hcode[sym]))
                    while lc < code_l and pos < n_bytes:
                        get_char()
                    if lc >= code_l and code_c == ((c >> (lc - code_l)) & ((1 << code_l) - 1)):
                        lc -= code_l
                        if sym == rlc:
                            if lc < 8:
                                get_char()
                            run = (c >> (lc - 8)) & 0xFF
                            lc -= 8
                            out[oi : oi + run] = out[oi - 1]
                            oi += run
                        else:
                            out[oi] = sym
                            oi += 1
                        found = True
                        break
                if not found:
                    raise ValueError("PIZ: invalid Huffman code")
        # n_bytes reached; flush handled below
    # Final bits (< HUF_DECBITS): continue decoding from the tail buffer.
    i = 8 - nbits % 8
    if i == 8:
        i = 0
    c >>= i
    lc -= i
    while lc > 0:
        idx = (c << (HUF_DECBITS - lc)) & HUF_DECMASK
        l = int(fast_len[idx])
        if l > 0 and l <= lc:
            lc -= l
            sym = int(fast_lit[idx])
            if sym == rlc:
                if lc < 8:
                    raise ValueError("PIZ: truncated run")
                run = (c >> (lc - 8)) & 0xFF
                lc -= 8
                out[oi : oi + run] = out[oi - 1]
                oi += run
            else:
                out[oi] = sym
                oi += 1
        else:
            raise ValueError("PIZ: invalid code in tail")
        if oi >= n_out:
            break
    if oi != n_out:
        raise ValueError(f"PIZ: decoded {oi} of {n_out} symbols")
    return out


def huf_uncompress(data: bytes, n_out: int) -> np.ndarray:
    im, iM, table_len, nbits, _ = struct.unpack_from("<iiiii", data, 0)
    br = _BitReader(data[20:])
    hcode = _unpack_enc_table(br, im, iM)
    fast_len, fast_lit, longs = _build_dec_table(hcode, im, iM)
    bitstream = data[20 + br.pos :]
    return _huf_decode(bitstream, nbits, hcode, fast_len, fast_lit, longs, iM, n_out)


def _wdec14(l, h):
    ls = int(l)
    hs = int(h)
    # signed 16-bit interpretation
    if ls >= 32768:
        ls -= 65536
    if hs >= 32768:
        hs -= 65536
    ai = ls + (hs & 1) + (hs >> 1)
    return np.uint16(ai & MOD_MASK), np.uint16((ai - hs) & MOD_MASK)


def _wdec16(l, h):
    m = int(l)
    d = int(h)
    bb = (m - (d >> 1)) & MOD_MASK
    aa = (d + bb - A_OFFSET) & MOD_MASK
    return np.uint16(aa), np.uint16(bb)


def wav2_decode(a: np.ndarray, nx: int, ox: int, ny: int, oy: int, mx: int):
    """Inverse 2D wavelet (ImfWav.cpp wav2Decode semantics). In place.

    a is a flat uint16 array; element (y, x) lives at a[y*oy + x*ox].
    """
    w14 = mx < (1 << 14)
    n = ny if nx > ny else nx          # MIN(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1

    dec = _wdec14 if w14 else _wdec16
    while p >= 1:
        row_step = p * oy
        col_step = p * ox
        y = 0
        while y <= ny - p2:
            x = 0
            base_y = y * oy
            while x <= nx - p2:
                i00 = base_y + x * ox
                i01 = i00 + col_step      # right
                i10 = i00 + row_step      # down
                i11 = i10 + col_step
                # Vertical pairs first, then horizontal (decode order).
                v00, v10 = dec(a[i00], a[i10])
                v01, v11 = dec(a[i01], a[i11])
                a[i00], a[i01] = dec(v00, v01)
                a[i10], a[i11] = dec(v10, v11)
                x += p2
            if nx & p:
                i00 = base_y + (nx - p) * ox
                i10 = i00 + row_step
                a[i00], a[i10] = dec(a[i00], a[i10])
            y += p2
        if ny & p:
            x = 0
            base_y = (ny - p) * oy
            while x <= nx - p2:
                i00 = base_y + x * ox
                i01 = i00 + col_step
                a[i00], a[i01] = dec(a[i00], a[i01])
                x += p2
        p2 = p
        p >>= 1
    return a


def reverse_lut_from_bitmap(bitmap: np.ndarray):
    """lut[compact] = original value. Value 0 is ALWAYS included
    (ImfPizCompressor reverseLutFromBitmap: i == 0 || bitmap bit set)."""
    bits = np.unpackbits(bitmap, bitorder="little")
    bits = bits[: 1 << 16].copy()
    bits[0] = 1
    present = np.nonzero(bits)[0]
    lut = np.zeros(1 << 16, np.uint16)
    lut[: len(present)] = present.astype(np.uint16)
    return lut, len(present)


def piz_uncompress(raw: bytes, channels, width: int, n_lines: int) -> bytes:
    """Decompress one PIZ chunk -> raw scanline bytes (channels alphabetical,
    per scanline, like uncompressed EXR layout).

    channels: list of (name, pixel_type) sorted alphabetically;
    pixel_type: 0=uint32, 1=half, 2=float. PIZ stores everything as u16
    planes (2 u16s for float/uint).
    """
    pos = 0
    min_nz, max_nz = struct.unpack_from("<HH", raw, pos)
    pos += 4
    bitmap = np.zeros(8192, np.uint8)
    if min_nz <= max_nz:
        n = max_nz - min_nz + 1
        bitmap[min_nz : max_nz + 1] = np.frombuffer(raw, np.uint8, n, pos)
        pos += n
    lut, _ = reverse_lut_from_bitmap(bitmap)

    (length,) = struct.unpack_from("<i", raw, pos)
    pos += 4

    # Total u16 count over all channel planes.
    sizes = {0: 2, 1: 1, 2: 2}  # u16s per pixel component
    total = 0
    chan_info = []
    for name, ptype in channels:
        n16 = sizes[ptype]
        count = width * n_lines * n16
        chan_info.append((name, ptype, n16, count))
        total += count

    data = huf_uncompress(raw[pos : pos + length], total)

    # Wavelet-decode each channel plane, then apply LUT.
    offset = 0
    planes = {}
    for name, ptype, n16, count in chan_info:
        plane = data[offset : offset + count].copy()
        offset += count
        # For half: one plane (ny, nx). For float/uint: stored as nx*2 u16s/px.
        nx = width * n16
        ny = n_lines
        maxv = int(plane.max()) if len(plane) else 0
        wav2_decode(plane, nx, 1, ny, nx, maxv)
        plane = lut[plane]
        planes[name] = (plane.reshape(ny, nx), ptype, n16)

    # Interleave to EXR scanline layout: per line, channels alphabetical.
    out = bytearray()
    for y in range(n_lines):
        for name, ptype, n16, count in chan_info:
            plane, _, _ = planes[name]
            out += plane[y].tobytes()
    return bytes(out)

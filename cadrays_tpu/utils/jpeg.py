"""Native baseline JPEG decoder (pure numpy + stdlib).

The reference reads its default environment map (data/maps/default.jpg)
through vendored stb_image; this module removes the repo's last PIL
dependency for *reading* (utils/image.load_image falls back here when
PIL is absent).  Scope — baseline sequential DCT (SOF0), the profile
stb_image supports and virtually every .jpg in the wild uses:

  * DQT (8/16-bit tables), DHT, DRI restart intervals, SOS single scan;
  * 1 or 3 components, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...)
    with nearest-neighbor chroma upsampling;
  * progressive (SOF2) and arithmetic-coded files raise ValueError with
    a clear message.

Implementation notes: entropy decoding uses a 16-bit peek table per
Huffman table (symbol + code length in one lookup), bits pulled from a
python int; dequant + zigzag + IDCT run vectorized over ALL blocks at
once (separable 8-point IDCT as two batched matmuls), which makes the
numpy path ~50x faster than per-block loops.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# 8-point IDCT basis: x = C^T @ X @ C with C[u,k] = a(u) cos((2k+1)u pi/16)
_C = np.zeros((8, 8), np.float64)
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _k in range(8):
        _C[_u, _k] = _a * np.cos((2 * _k + 1) * _u * np.pi / 16.0)


class _Huff:
    """Canonical Huffman table with a 16-bit peek LUT."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lut = np.zeros(1 << 16, np.uint16)  # (symbol << 5) | length
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                k += 1
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.lut[lo:hi] = (sym << 5) | length
                code += 1
            code <<= 1


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are handled by the caller (the scan is
    pre-split on them)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 48:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = d[self.pos] if self.pos < len(d) else 0
                if nxt == 0x00:
                    self.pos += 1
                else:  # marker: pad with zeros from here on
                    self.pos = len(d)
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, n: int):
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.drop(n)
        return v


def _extend(v: int, n: int) -> int:
    """JPEG signed-magnitude extension (F.2.2.1)."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int
    td: int = 0
    ta: int = 0


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG; returns (H, W, 3) or (H, W, 1) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _Huff] = {}
    huff_ac: Dict[int, _Huff] = {}
    comps: List[_Component] = []
    W = H = 0
    restart = 0
    scan_data: Optional[bytes] = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # spec-legal 0xFF fill bytes may pad before a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    tbl = np.frombuffer(seg[i:i + 128], ">u2")
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i:i + 64], np.uint8)
                    i += 64
                qt[tid] = tbl.astype(np.float64)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                counts = seg[i + 1:i + 17]
                n = sum(counts)
                symbols = seg[i + 17:i + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _Huff(counts, symbols)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            H, W = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq_ = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, samp >> 4, samp & 15, tq_))
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported "
                             "(baseline SOF0 only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding (SOF{marker & 15})")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp.cid == cid:
                        comp.td, comp.ta = tables >> 4, tables & 15
            scan_data = data[pos:]
            break
    if scan_data is None or not comps:
        raise ValueError("JPEG has no scan data")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-component coefficient store: (blocks_y, blocks_x, 64)
    planes_coef = []
    for c in comps:
        planes_coef.append(np.zeros((mcuy * c.v, mcux * c.h, 64),
                                    np.int32))

    # split the scan on restart markers (RSTn) so each interval resets
    # the bit phase and DC predictors, per the standard
    intervals: List[bytes] = []
    if restart:
        cur = bytearray()
        i = 0
        while i < len(scan_data):
            b = scan_data[i]
            if b == 0xFF and i + 1 < len(scan_data):
                nxt = scan_data[i + 1]
                if 0xD0 <= nxt <= 0xD7:
                    intervals.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                if nxt not in (0x00,) and nxt != 0xFF:
                    break  # other marker terminates the scan
            cur.append(b)
            i += 1
        intervals.append(bytes(cur))
    else:
        intervals = [scan_data]

    mcu = 0
    luts_dc = [huff_dc[c.td].lut for c in comps]
    luts_ac = [huff_ac[c.ta].lut for c in comps]
    for chunk in intervals:
        if mcu >= n_mcu:
            break
        bits = _Bits(chunk)
        pred = [0] * len(comps)
        end = min(mcu + restart, n_mcu) if restart else n_mcu
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                lut_dc = luts_dc[ci]
                lut_ac = luts_ac[ci]
                for by in range(c.v):
                    for bx in range(c.h):
                        blk = planes_coef[ci][my * c.v + by,
                                              mx * c.h + bx]
                        e = int(lut_dc[bits.peek16()])
                        size, ln = e >> 5, e & 31
                        if ln == 0:
                            raise ValueError("bad JPEG Huffman code")
                        bits.drop(ln)
                        diff = _extend(bits.take(size), size)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            e = int(lut_ac[bits.peek16()])
                            rs, ln = e >> 5, e & 31
                            if ln == 0:
                                raise ValueError("bad JPEG Huffman code")
                            bits.drop(ln)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            blk[k] = _extend(bits.take(size), size)
                            k += 1
            mcu += 1

    # ---- vectorized dequant + zigzag + IDCT per component --------------
    out_planes = []
    for ci, c in enumerate(comps):
        coefs = planes_coef[ci].reshape(-1, 64).astype(np.float64)
        coefs *= qt[c.tq][None, :]
        blocks = np.zeros((coefs.shape[0], 64), np.float64)
        blocks[:, _ZIGZAG] = coefs
        blocks = blocks.reshape(-1, 8, 8)
        # x = C^T X C, batched
        spat = np.einsum("ui,nuv,vj->nij", _C, blocks, _C,
                         optimize=True) + 128.0
        by, bx = mcuy * c.v, mcux * c.h
        plane = spat.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution with libjpeg's "fancy"
        # triangle filter (out[2i] = (3 s[i] + s[i-1])/4, out[2i+1] =
        # (3 s[i] + s[i+1])/4) so chroma edges match stb/libjpeg output;
        # non-power-of-2 ratios fall back to nearest
        ry, rx = vmax // c.v, hmax // c.h
        while rx > 1 and rx % 2 == 0:
            plane = _triangle_up(plane, axis=1)
            rx //= 2
        while ry > 1 and ry % 2 == 0:
            plane = _triangle_up(plane, axis=0)
            ry //= 2
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:H, :W])

    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return y[..., None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def _triangle_up(p: np.ndarray, axis: int) -> np.ndarray:
    """2x upsample along `axis` with libjpeg's triangle weights."""
    if axis == 0:
        p = p.T
    prev = np.concatenate([p[:, :1], p[:, :-1]], axis=1)
    nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    out = np.empty((p.shape[0], p.shape[1] * 2), p.dtype)
    out[:, 0::2] = (3.0 * p + prev) * 0.25
    out[:, 1::2] = (3.0 * p + nxt) * 0.25
    return out.T if axis == 0 else out


def read_jpeg(path: str) -> np.ndarray:
    """Read a baseline JPEG file -> float32 [0,1] RGB (H, W, 3)."""
    with open(path, "rb") as f:
        img = decode_jpeg(f.read())
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img.astype(np.float32) / 255.0

"""Image I/O: PNG (LDR), Radiance HDR, PFM — no external deps.

Capability contract (reference AppGui.cxx:337-509): LDR save to .png/.jpg
from the tone-mapped buffer, HDR save to .hdr/.exr from the raw radiance
accumulator. Here: PNG via zlib (always available), .hdr via the Radiance
RGBE format, .pfm as the lossless float fallback for .exr use-cases.
PIL is used opportunistically for reading jpg/png textures when present.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def write_png(path: str, image: np.ndarray) -> None:
    """image: (H, W, 3) uint8 or float in [0,1]."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w = img.shape[:2]

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    f = open(path, "wb") if isinstance(path, str) else path
    try:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", comp))
        f.write(chunk(b"IEND", b""))
    finally:
        if isinstance(path, str):
            f.close()


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader (8-bit RGB/RGBA/gray, no interlace) -> float [0,1]."""
    with open(path, "rb") as f:
        sig = f.read(8)
        if sig != b"\x89PNG\r\n\x1a\n":
            raise ValueError(f"{path}: not a PNG")
        idat = b""
        meta = None
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            (length,), tag = struct.unpack(">I", head[:4]), head[4:8]
            data = f.read(length)
            f.read(4)  # crc
            if tag == b"IHDR":
                meta = struct.unpack(">IIBBBBB", data)
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
    w, h, depth, color, _, _, interlace = meta
    if depth != 8 or interlace != 0:
        raise ValueError(f"{path}: unsupported PNG (depth={depth})")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos:pos + stride], np.uint8).astype(np.int32)
        pos += stride
        if ft == 0:
            rec = row
        elif ft == 1:
            rec = row.copy()
            for i in range(ch, stride):
                rec[i] = (rec[i] + rec[i - ch]) & 0xFF
        elif ft == 2:
            rec = (row + prev) & 0xFF
        elif ft == 3:
            rec = row.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            rec = row.copy()
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[r] = rec.astype(np.uint8)
        prev = out[r].astype(np.int32)
    img = out.reshape(h, w, ch).astype(np.float32) / 255.0
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    elif ch == 2:
        img = np.repeat(img[..., :1], 3, axis=2)
    elif ch == 4:
        img = img[..., :3]
    return img


# ---------------------------------------------------------------------------
# Radiance HDR (RGBE)
# ---------------------------------------------------------------------------

def write_hdr(path: str, image: np.ndarray) -> None:
    """Radiance .hdr (uncompressed RGBE scanlines). image: (H, W, 3) float."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    maxc = img.max(axis=2)
    # exponent so that maxc * scale lands in [128, 256)
    exp = np.where(maxc > 1e-32,
                   np.floor(np.log2(np.maximum(maxc, 1e-32))) + 1, 0.0)
    scale = np.where(maxc > 1e-32, 2.0 ** (-exp) * 256.0, 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None] + 0.5, 0, 255).astype(
        np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_hdr(path: str) -> np.ndarray:
    """Radiance .hdr reader (flat + RLE scanlines) -> (H, W, 3) float."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance HDR")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        h, w = int(dims[1]), int(dims[3])
        data = f.read()
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2:
            # adaptive RLE
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[pos]
                    pos += 1
                    if cnt > 128:
                        rgbe[y, x:x + cnt - 128, c] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:
                        rgbe[y, x:x + cnt, c] = np.frombuffer(
                            data[pos:pos + cnt], np.uint8)
                        pos += cnt
                        x += cnt
        else:
            row = np.frombuffer(data[pos:pos + w * 4], np.uint8).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, 2.0 ** (e - 136), 0.0)  # -128 exp, -8 mantissa
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]).astype(np.float32)


# ---------------------------------------------------------------------------
# PFM (float, lossless — our ".exr-equivalent" fallback)
# ---------------------------------------------------------------------------

def write_pfm(path: str, image: np.ndarray) -> None:
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" + f"{w} {h}\n".encode() + b"-1.0\n")
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        tag = f.readline().strip()
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        count = w * h * (3 if tag == b"PF" else 1)
        data = np.frombuffer(f.read(count * 4),
                             "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, -1)
    return np.flipud(img).copy()


# ---------------------------------------------------------------------------
# Generic entry points
# ---------------------------------------------------------------------------

def load_image(path: str, to_linear: bool = True) -> np.ndarray:
    """Load any supported image as linear float RGB."""
    low = path.lower()
    if low.endswith(".hdr"):
        return read_hdr(path)
    if low.endswith(".pfm"):
        return read_pfm(path)
    if low.endswith(".png"):
        img = read_png(path)
    else:
        try:
            from PIL import Image  # optional

            img = np.asarray(Image.open(path).convert("RGB"),
                             np.float32) / 255.0
        except ImportError as e:
            raise ValueError(
                f"cannot read {path}: PIL unavailable for this format") from e
    if to_linear:
        img = np.where(img <= 0.04045, img / 12.92,
                       ((img + 0.055) / 1.055) ** 2.4).astype(np.float32)
    return img


def save_image(path: str, image: np.ndarray) -> None:
    """Save by extension: .png (LDR, expects [0,1] or uint8), .hdr/.pfm
    (HDR radiance) — the reference's LDR/HDR dump split (AppGui.cxx:345-350)."""
    low = path.lower()
    if low.endswith(".hdr"):
        write_hdr(path, image)
    elif low.endswith(".pfm") or low.endswith(".exr"):
        # .exr requested -> lossless float PFM with a warning extension swap
        write_pfm(path if low.endswith(".pfm") else path[:-4] + ".pfm", image)
    else:
        write_png(path, image)

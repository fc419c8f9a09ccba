"""Image I/O: PNG (LDR), Radiance HDR, OpenEXR, PFM — no external deps.

Capability contract (reference AppGui.cxx:337-509): LDR save to .png/.jpg
from the tone-mapped buffer, HDR save to .hdr/.exr from the raw radiance
accumulator. Here: PNG via zlib (always available), .hdr via the Radiance
RGBE format, .exr via a minimal scanline OpenEXR codec, .pfm as an extra
lossless float format. PIL is used opportunistically for reading
jpg textures when present.
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
# OpenEXR (scanline, uncompressed, float32 RGB)
# ---------------------------------------------------------------------------
#
# Reference capability: HDR image save to .exr from the raw radiance
# accumulator (AppGui.cxx:345-350, Graphic3d_BT_RGB_RayTraceHdrLeft).
# Minimal self-contained OpenEXR 2.0 codec: single part, scanline storage,
# no compression, three FLOAT channels. Readable by any EXR consumer.

def _exr_attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<I", len(data)) + data


def write_exr(path: str, image: np.ndarray) -> None:
    """OpenEXR v2 scanline file, uncompressed float32 RGB."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w = img.shape[:2]
    # channel list: alphabetical (B, G, R), pixel type 2 = FLOAT
    chan = b""
    for c in (b"B", b"G", b"R"):
        chan += c + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)
    chan += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b"".join([
        _exr_attr(b"channels", b"chlist", chan),
        _exr_attr(b"compression", b"compression", b"\0"),  # NO_COMPRESSION
        _exr_attr(b"dataWindow", b"box2i", box),
        _exr_attr(b"displayWindow", b"box2i", box),
        _exr_attr(b"lineOrder", b"lineOrder", b"\0"),  # INCREASING_Y
        _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0)),
        _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
        b"\0",
    ])
    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    scan_bytes = w * 4 * 3
    table_pos = len(magic) + len(header)
    data_pos = table_pos + 8 * h
    offsets = [data_pos + y * (8 + scan_bytes) for y in range(h)]
    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<ii", y, scan_bytes))
            # channels alphabetical: B, G, R — full row each
            f.write(img[y, :, 2].astype("<f4").tobytes())
            f.write(img[y, :, 1].astype("<f4").tobytes())
            f.write(img[y, :, 0].astype("<f4").tobytes())


def read_exr(path: str) -> np.ndarray:
    """Reader for the subset write_exr emits (+ HALF pixels) -> (H,W,3)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<II", buf, 0)
    if magic != 20000630:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{path}: multi-part EXR unsupported")
    pos = 8
    channels = []
    data_window = None
    compression = None
    while buf[pos] != 0:
        name_end = buf.index(b"\0", pos)
        name = buf[pos:name_end]
        pos = name_end + 1
        typ_end = buf.index(b"\0", pos)
        pos = typ_end + 1
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        data = buf[pos:pos + size]
        pos += size
        if name == b"channels":
            cp = 0
            while data[cp] != 0:
                ce = data.index(b"\0", cp)
                cname = data[cp:ce].decode()
                ptype = struct.unpack_from("<i", data, ce + 1)[0]
                channels.append((cname, ptype))
                cp = ce + 17
        elif name == b"dataWindow":
            data_window = struct.unpack("<iiii", data)
        elif name == b"compression":
            compression = data[0]
    pos += 1  # header terminator
    if compression != 0:
        raise ValueError(f"{path}: only uncompressed EXR supported")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    pos += 8 * h  # skip offset table
    psize = {1: 2, 2: 4}  # HALF, FLOAT
    out = {c: np.zeros((h, w), np.float32) for c, _ in channels}
    for _ in range(h):
        y, nbytes = struct.unpack_from("<ii", buf, pos)
        pos += 8
        for cname, ptype in channels:  # alphabetical in file
            n = w * psize[ptype]
            row = np.frombuffer(buf[pos:pos + n],
                                "<f2" if ptype == 1 else "<f4")
            out[cname][y - y0] = row.astype(np.float32)
            pos += n
    if all(k in out for k in "RGB"):
        return np.stack([out["R"], out["G"], out["B"]], axis=-1)
    first = next(iter(out.values()))
    return np.repeat(first[..., None], 3, axis=2)


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
    if low.endswith(".exr"):
        return read_exr(path)
    if low.endswith(".png"):
        img = read_png(path)
    elif low.endswith((".jpg", ".jpeg")):
        # native baseline decoder (utils/jpeg.py) — the reference reads
        # its default env map via vendored stb_image (no PIL); only
        # progressive/arithmetic files fall through to PIL
        try:
            from cadrays_tpu.utils.jpeg import read_jpeg

            img = read_jpeg(path)
        except (ValueError, struct.error, IndexError, KeyError):
            # progressive/arithmetic files raise ValueError; malformed or
            # truncated ones can surface struct/index errors — all fall
            # back to PIL like the pre-native behavior
            img = _read_via_pil(path)
    else:
        img = _read_via_pil(path)
    if to_linear:
        img = np.where(img <= 0.04045, img / 12.92,
                       ((img + 0.055) / 1.055) ** 2.4).astype(np.float32)
    return img


def _read_via_pil(path: str) -> np.ndarray:
    try:
        from PIL import Image  # optional

        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0
    except ImportError as e:
        raise ValueError(
            f"cannot read {path}: PIL unavailable for this format") from e


def save_image(path: str, image: np.ndarray) -> None:
    """Save by extension: .png (LDR, expects [0,1] or uint8), .hdr/.pfm
    (HDR radiance) — the reference's LDR/HDR dump split (AppGui.cxx:345-350)."""
    low = path.lower()
    if low.endswith(".hdr"):
        write_hdr(path, image)
    elif low.endswith(".exr"):
        write_exr(path, image)
    elif low.endswith(".pfm"):
        write_pfm(path, image)
    elif low.endswith((".jpg", ".jpeg", ".bmp", ".tga")):
        # LDR formats the reference saves via stb (AppGui.cxx:337-433);
        # delegated to PIL when present, since these codecs aren't native.
        try:
            from PIL import Image
        except ImportError as e:
            raise ValueError(
                f"saving {path} needs PIL (not installed); "
                "use .png for native LDR output") from e
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        Image.fromarray(arr, "RGB").save(path)
    else:
        write_png(path, image)

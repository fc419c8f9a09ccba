#!/usr/bin/env python
"""Generate tests/data/parts.blend — a minimal but structurally honest
.blend fixture for the DNA-driven loader (geometry/loaders/blend.py).

The file follows the real format end-to-end: BLENDER header (8-byte
little-endian pointers), file blocks with (code, size, old_addr,
sdna_idx, count) headers, pointer-chased DATA arrays, and a DNA1 SDNA
catalog (NAME/TYPE/TLEN/STRC) that the loader must actually consult —
field offsets in this catalog are deliberately non-trivial (structs
carry dummy fields before the interesting ones, like real Blender
structs do), so hard-coded offsets would read garbage.

Content: two mesh objects —
  * "Cube": unit cube, quads, two material slots split by mat_nr,
    rotated 90 deg about Z and translated (1, 2, 3) via obmat;
  * "Fin":  a single triangle with per-loop UVs, identity transform.
Run from the repo root:  python tests/gen_blend_fixture.py
"""
from __future__ import annotations

import os
import struct

import numpy as np

PTR = 8


class DNA:
    """Tiny SDNA builder: register structs, emit the DNA1 payload."""

    BASE = {"char": 1, "short": 2, "int": 4, "float": 4}

    def __init__(self):
        self.names: list[str] = []
        self.types: list[str] = list(self.BASE)
        self.tlen: dict[str, int] = dict(self.BASE)
        self.structs: list[tuple[str, list[tuple[str, str]]]] = []

    def _name_idx(self, n):
        if n not in self.names:
            self.names.append(n)
        return self.names.index(n)

    def _type_idx(self, t):
        if t not in self.types:
            self.types.append(t)
        return self.types.index(t)

    def field_size(self, ftype: str, fname: str) -> int:
        count = 1
        for d in fname.replace("]", "[").split("["):
            if d.isdigit():
                count *= int(d)
        base = PTR if fname.startswith("*") else self.tlen[ftype]
        return base * count

    def struct(self, name: str, fields: list[tuple[str, str]]):
        self._type_idx(name)
        size = sum(self.field_size(t, n) for t, n in fields)
        self.tlen[name] = size
        self.structs.append((name, fields))
        for t, n in fields:
            self._type_idx(t)
            self._name_idx(n)
        return size

    def sdna_index(self, name: str) -> int:
        for i, (n, _) in enumerate(self.structs):
            if n == name:
                return i
        raise KeyError(name)

    def payload(self) -> bytes:
        def align4(b):
            return b + b"\0" * (-len(b) % 4)

        out = b"SDNA"
        out += b"NAME" + struct.pack("<i", len(self.names))
        out = align4(out + b"".join(n.encode() + b"\0" for n in self.names))
        out += b"TYPE" + struct.pack("<i", len(self.types))
        out = align4(out + b"".join(t.encode() + b"\0" for t in self.types))
        out += b"TLEN" + struct.pack(
            f"<{len(self.types)}h", *(self.tlen[t] for t in self.types))
        out = align4(out)
        out += b"STRC" + struct.pack("<i", len(self.structs))
        for name, fields in self.structs:
            out += struct.pack("<hh", self._type_idx(name), len(fields))
            for t, n in fields:
                out += struct.pack("<hh", self._type_idx(t),
                                   self._name_idx(n))
        return out


def build_dna() -> DNA:
    dna = DNA()
    dna.struct("ID", [("char", "name[66]"), ("short", "flag"),
                      ("int", "us")])
    dna.struct("MVert", [("float", "co[3]"), ("short", "no[3]"),
                         ("char", "flag"), ("char", "bweight")])
    dna.struct("MPoly", [("int", "loopstart"), ("int", "totloop"),
                         ("short", "mat_nr"), ("char", "flag"),
                         ("char", "_pad")])
    dna.struct("MLoop", [("int", "v"), ("int", "e")])
    dna.struct("MLoopUV", [("float", "uv[2]"), ("int", "flag")])
    dna.struct("Material", [
        ("ID", "id"), ("short", "_pad0"), ("short", "_pad1"),
        ("float", "r"), ("float", "g"), ("float", "b"),
        ("float", "specr"), ("float", "specg"), ("float", "specb"),
        ("float", "spec"), ("float", "roughness")])
    dna.struct("Mesh", [
        ("ID", "id"), ("Material", "**mat"), ("int", "_pad2"),
        ("MVert", "*mvert"), ("MPoly", "*mpoly"), ("MLoop", "*mloop"),
        ("MLoopUV", "*mloopuv"),
        ("int", "totvert"), ("int", "totpoly"), ("int", "totloop"),
        ("int", "totcol")])
    dna.struct("Object", [
        ("ID", "id"), ("short", "type"), ("short", "partype"),
        ("int", "_pad3"), ("void", "*data"),
        ("float", "loc[3]"), ("float", "obmat[4][4]")])
    dna.tlen["void"] = 0
    dna._type_idx("void")
    return dna


class Writer:
    def __init__(self, dna: DNA):
        self.dna = dna
        self.blocks: list[bytes] = []
        self._addr = 0x1000

    def addr(self) -> int:
        self._addr += 0x100
        return self._addr

    def block(self, code: bytes, sdna: int, count: int, data: bytes,
              addr: int = 0):
        hdr = code.ljust(4, b"\0") + struct.pack(
            "<iQii", len(data), addr, sdna, count)
        self.blocks.append(hdr + data)

    def save(self, path: str):
        out = b"BLENDER-v305"  # 8-byte ptrs, little-endian, "3.05"
        out += b"".join(self.blocks)
        out += b"ENDB" + struct.pack("<iQii", 0, 0, 0, 0)
        with open(path, "wb") as f:
            f.write(out)


def pack_struct(dna: DNA, name: str, values: dict) -> bytes:
    """Pack one struct instance; embedded structs via nested dicts."""
    _, fields = dna.structs[dna.sdna_index(name)]
    out = b""
    for t, n in fields:
        size = dna.field_size(t, n)
        key = n.lstrip("*").split("[")[0]
        v = values.get(key)
        if v is None:
            out += b"\0" * size
        elif isinstance(v, bytes):
            out += v.ljust(size, b"\0")[:size]
        elif isinstance(v, dict):
            out += pack_struct(dna, t, v).ljust(size, b"\0")[:size]
        elif n.startswith("*"):
            if isinstance(v, (list, tuple)):
                out += struct.pack(f"<{len(v)}Q", *v)
            else:
                out += struct.pack("<Q", v)
        else:
            fmt = {"char": "b", "short": "h", "int": "i",
                   "float": "f"}[t]
            if isinstance(v, (list, tuple, np.ndarray)):
                flat = np.asarray(v).reshape(-1)
                out += struct.pack(f"<{flat.size}{fmt}", *flat.tolist())
            else:
                out += struct.pack(f"<{fmt}", v)
    return out


def mvert_rows(dna, verts, norms):
    rows = b""
    for co, no in zip(verts, norms):
        rows += pack_struct(dna, "MVert", {
            "co": co, "no": (np.asarray(no) * 32767).astype(np.int16)})
    return rows


def main():
    dna = build_dna()
    w = Writer(dna)

    # ---- materials ------------------------------------------------------
    ma_red = w.addr()
    w.block(b"MA", dna.sdna_index("Material"), 1, pack_struct(
        dna, "Material", {"id": {"name": b"MARed"},
                          "r": 0.8, "g": 0.1, "b": 0.1,
                          "specr": 1.0, "specg": 1.0, "specb": 1.0,
                          "spec": 0.25, "roughness": 0.4}), ma_red)
    ma_blue = w.addr()
    w.block(b"MA", dna.sdna_index("Material"), 1, pack_struct(
        dna, "Material", {"id": {"name": b"MABlue"},
                          "r": 0.1, "g": 0.2, "b": 0.9,
                          "specr": 1.0, "specg": 1.0, "specb": 1.0,
                          "spec": 0.5, "roughness": 0.2}), ma_blue)

    # ---- cube mesh ------------------------------------------------------
    cv = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                   for x in (0, 1)], np.float32)
    cn = (cv - 0.5)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    quads = [  # (verts, mat_nr): -Z, +Z red; sides blue
        ([0, 2, 3, 1], 0), ([4, 5, 7, 6], 0),
        ([0, 1, 5, 4], 1), ([2, 6, 7, 3], 1),
        ([0, 4, 6, 2], 1), ([1, 3, 7, 5], 1),
    ]
    loops = []
    polys = b""
    for vs, mat_nr in quads:
        polys += pack_struct(dna, "MPoly", {
            "loopstart": len(loops), "totloop": 4, "mat_nr": mat_nr})
        loops += vs
    mloops = b"".join(pack_struct(dna, "MLoop", {"v": v}) for v in loops)

    a_mv, a_mp, a_ml, a_mat = w.addr(), w.addr(), w.addr(), w.addr()
    w.block(b"DATA", dna.sdna_index("MVert"), 8,
            mvert_rows(dna, cv, cn), a_mv)
    w.block(b"DATA", dna.sdna_index("MPoly"), len(quads), polys, a_mp)
    w.block(b"DATA", dna.sdna_index("MLoop"), len(loops), mloops, a_ml)
    w.block(b"DATA", 0, 2, struct.pack("<2Q", ma_red, ma_blue), a_mat)
    me_cube = w.addr()
    w.block(b"ME", dna.sdna_index("Mesh"), 1, pack_struct(dna, "Mesh", {
        "id": {"name": b"MECube"}, "mat": a_mat, "mvert": a_mv,
        "mpoly": a_mp, "mloop": a_ml, "totvert": 8,
        "totpoly": len(quads), "totloop": len(loops), "totcol": 2,
    }), me_cube)

    # ---- fin (single triangle, UVs, identity transform) -----------------
    fv = np.float32([[0, 0, 0], [1, 0, 0], [0, 0, 1]])
    fn = np.float32([[0, -1, 0]] * 3)
    a_fv, a_fp, a_fl, a_fuv = w.addr(), w.addr(), w.addr(), w.addr()
    w.block(b"DATA", dna.sdna_index("MVert"), 3,
            mvert_rows(dna, fv, fn), a_fv)
    w.block(b"DATA", dna.sdna_index("MPoly"), 1, pack_struct(
        dna, "MPoly", {"loopstart": 0, "totloop": 3, "mat_nr": 0}), a_fp)
    w.block(b"DATA", dna.sdna_index("MLoop"), 3, b"".join(
        pack_struct(dna, "MLoop", {"v": v}) for v in (0, 1, 2)), a_fl)
    w.block(b"DATA", dna.sdna_index("MLoopUV"), 3, b"".join(
        pack_struct(dna, "MLoopUV", {"uv": uv})
        for uv in ([0, 0], [1, 0], [0, 1])), a_fuv)
    me_fin = w.addr()
    w.block(b"ME", dna.sdna_index("Mesh"), 1, pack_struct(dna, "Mesh", {
        "id": {"name": b"MEFin"}, "mvert": a_fv, "mpoly": a_fp,
        "mloop": a_fl, "mloopuv": a_fuv, "totvert": 3, "totpoly": 1,
        "totloop": 3, "totcol": 0,
    }), me_fin)

    # ---- objects --------------------------------------------------------
    # world = Rz(90) then translate (1,2,3); stored obmat is the numpy
    # matrix TRANSPOSED (translation in floats 12..14, Blender layout)
    world = np.eye(4, dtype=np.float32)
    world[:3, :3] = np.float32([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    world[:3, 3] = (1, 2, 3)
    ob_cube = w.addr()
    w.block(b"OB", dna.sdna_index("Object"), 1, pack_struct(
        dna, "Object", {"id": {"name": b"OBCube"}, "type": 1,
                        "data": me_cube, "obmat": world.T}), ob_cube)
    ob_fin = w.addr()
    w.block(b"OB", dna.sdna_index("Object"), 1, pack_struct(
        dna, "Object", {"id": {"name": b"OBFin"}, "type": 1,
                        "data": me_fin,
                        "obmat": np.eye(4, dtype=np.float32)}), ob_fin)
    # a non-mesh object (camera) the loader must skip
    w.block(b"OB", dna.sdna_index("Object"), 1, pack_struct(
        dna, "Object", {"id": {"name": b"OBCamera"}, "type": 11,
                        "obmat": np.eye(4, dtype=np.float32)}), w.addr())

    w.block(b"DNA1", 0, 1, dna.payload())
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "parts.blend")
    w.save(out)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()

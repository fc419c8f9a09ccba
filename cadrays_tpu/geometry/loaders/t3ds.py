"""Autodesk 3DS loader (own chunk parser, no assimp).

Capability contract: the reference's import dialog offers .3ds through
Assimp (ImportSettingsEditor.cxx:199-277, `rtmeshread`); here the classic
chunk format is parsed natively. Covered: multiple named TriMesh objects
(0x4000/0x4100), vertex list 0x4110, face list 0x4120, per-face material
assignment 0x4130 (faces grouped per material like MeshImporter.cxx:
112-145), texture coords 0x4140, mesh matrix 0x4160, material blocks
0xAFFF with diffuse/specular colors 0xA020/0xA030, shininess 0xA040 and
diffuse texture map 0xA200/0xA300. Smooth normals are generated when the
file carries none (3DS never stores normals).
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional

import numpy as np

from cadrays_tpu.geometry.loaders.obj import LoadedPart
from cadrays_tpu.geometry.mesh import TriangleMesh

_MAIN = 0x4D4D
_EDIT3DS = 0x3D3D
_OBJECT = 0x4000
_TRIMESH = 0x4100
_VERTS = 0x4110
_FACES = 0x4120
_FACE_MAT = 0x4130
_UVS = 0x4140
_MESH_MATRIX = 0x4160
_MAT_BLOCK = 0xAFFF
_MAT_NAME = 0xA000
_MAT_DIFFUSE = 0xA020
_MAT_SPECULAR = 0xA030
_MAT_SHININESS = 0xA040
_MAT_TEXMAP = 0xA200
_MAT_MAPFILE = 0xA300
_COLOR_F = 0x0010
_COLOR_24 = 0x0011
_PCT_I = 0x0030
_PCT_F = 0x0031


def _read_cstr(buf: bytes, off: int):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("latin-1"), end + 1


def _read_color(buf: bytes, off: int, end: int):
    col = None
    while off + 6 <= end:
        cid, clen = struct.unpack_from("<HI", buf, off)
        if cid == _COLOR_F:
            col = struct.unpack_from("<3f", buf, off + 6)
        elif cid == _COLOR_24:
            col = tuple(b / 255.0 for b in buf[off + 6:off + 9])
        off += max(clen, 6)
    return col


def _read_pct(buf: bytes, off: int, end: int) -> Optional[float]:
    while off + 6 <= end:
        cid, clen = struct.unpack_from("<HI", buf, off)
        if cid == _PCT_I:
            return struct.unpack_from("<h", buf, off + 6)[0] / 100.0
        if cid == _PCT_F:
            return struct.unpack_from("<f", buf, off + 6)[0]
        off += max(clen, 6)
    return None


class _TriObject:
    def __init__(self, name: str):
        self.name = name
        self.verts: Optional[np.ndarray] = None
        self.faces: Optional[np.ndarray] = None
        self.uvs: Optional[np.ndarray] = None
        self.face_mats: Dict[str, np.ndarray] = {}


def load_3ds(path: str) -> List[LoadedPart]:
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 6 or struct.unpack_from("<H", buf, 0)[0] != _MAIN:
        raise ValueError(f"{path}: not a 3DS file (bad magic)")

    objects: List[_TriObject] = []
    materials: Dict[str, dict] = {}

    def parse(off: int, end: int, ctx) -> None:
        while off + 6 <= end:
            cid, clen = struct.unpack_from("<HI", buf, off)
            if clen < 6 or off + clen > end:
                break  # corrupt chunk: stop at this level
            body, bend = off + 6, off + clen
            if cid in (_MAIN, _EDIT3DS):
                parse(body, bend, ctx)
            elif cid == _OBJECT:
                name, p = _read_cstr(buf, body)
                obj = _TriObject(name)
                parse(p, bend, obj)
                if obj.verts is not None and obj.faces is not None:
                    objects.append(obj)
            elif cid == _TRIMESH:
                parse(body, bend, ctx)
            elif cid == _VERTS and isinstance(ctx, _TriObject):
                n = struct.unpack_from("<H", buf, body)[0]
                ctx.verts = np.frombuffer(
                    buf, "<f4", n * 3, body + 2).reshape(n, 3).copy()
            elif cid == _FACES and isinstance(ctx, _TriObject):
                n = struct.unpack_from("<H", buf, body)[0]
                faces = np.frombuffer(buf, "<u2", n * 4, body + 2)
                ctx.faces = faces.reshape(n, 4)[:, :3].astype(np.int32)
                parse(body + 2 + n * 8, bend, ctx)  # sub: FACE_MAT runs
            elif cid == _FACE_MAT and isinstance(ctx, _TriObject):
                mname, p = _read_cstr(buf, body)
                n = struct.unpack_from("<H", buf, p)[0]
                ctx.face_mats[mname] = np.frombuffer(
                    buf, "<u2", n, p + 2).astype(np.int64)
            elif cid == _UVS and isinstance(ctx, _TriObject):
                n = struct.unpack_from("<H", buf, body)[0]
                ctx.uvs = np.frombuffer(
                    buf, "<f4", n * 2, body + 2).reshape(n, 2).copy()
            elif cid == _MAT_BLOCK:
                mat: dict = {}
                parse(body, bend, mat)
                materials[mat.get("name", f"mat{len(materials)}")] = mat
            elif cid == _MAT_NAME and isinstance(ctx, dict):
                ctx["name"], _ = _read_cstr(buf, body)
            elif cid == _MAT_DIFFUSE and isinstance(ctx, dict):
                ctx["diffuse"] = _read_color(buf, body, bend)
            elif cid == _MAT_SPECULAR and isinstance(ctx, dict):
                ctx["specular"] = _read_color(buf, body, bend)
            elif cid == _MAT_SHININESS and isinstance(ctx, dict):
                pct = _read_pct(buf, body, bend)
                if pct is not None:
                    ctx["shininess"] = pct * 128.0
            elif cid == _MAT_TEXMAP and isinstance(ctx, dict):
                parse(body, bend, ctx)
            elif cid == _MAT_MAPFILE and isinstance(ctx, dict):
                ctx["texture"], _ = _read_cstr(buf, body)
            off += clen

    parse(0, len(buf), None)

    parts: List[LoadedPart] = []
    base_dir = os.path.dirname(os.path.abspath(path))
    for obj in objects:
        groups = obj.face_mats or {"": np.arange(len(obj.faces))}
        for mname, fidx in sorted(groups.items()):
            fidx = fidx[fidx < len(obj.faces)]
            if fidx.size == 0:
                continue
            tris = obj.faces[fidx]
            used = np.unique(tris)
            remap = np.full(len(obj.verts), -1, np.int32)
            remap[used] = np.arange(used.size, dtype=np.int32)
            mesh = TriangleMesh(
                obj.verts[used], remap[tris], None,
                obj.uvs[used] if obj.uvs is not None else None)
            mesh.compute_vertex_normals()
            mat = materials.get(mname, {})
            tex = mat.get("texture")
            if tex is not None:
                cand = os.path.join(base_dir, tex)
                tex = cand if os.path.exists(cand) else None
            parts.append(LoadedPart(
                mesh=mesh, material_name=mname,
                diffuse=mat.get("diffuse"), specular=mat.get("specular"),
                shininess=mat.get("shininess"), texture_path=tex))
    if not parts:
        raise ValueError(f"{path}: no triangle meshes found")
    return parts


def save_3ds(path: str, mesh: TriangleMesh, name: str = "mesh") -> None:
    """Minimal single-object 3DS writer (round-trip/testing aid)."""
    name_b = name.encode("latin-1")[:10] + b"\x00"
    v = np.ascontiguousarray(mesh.vertices, "<f4")
    f = np.zeros((mesh.num_triangles, 4), "<u2")
    f[:, :3] = mesh.indices
    verts_chunk = struct.pack("<HIH", _VERTS, 8 + v.nbytes, len(v)) + v.tobytes()
    faces_chunk = struct.pack("<HIH", _FACES, 8 + f.nbytes, len(f)) + f.tobytes()
    uv_chunk = b""
    if mesh.uvs is not None:
        uv = np.ascontiguousarray(mesh.uvs, "<f4")
        uv_chunk = struct.pack("<HIH", _UVS, 8 + uv.nbytes, len(uv)) + uv.tobytes()
    tm_body = verts_chunk + faces_chunk + uv_chunk
    tm = struct.pack("<HI", _TRIMESH, 6 + len(tm_body)) + tm_body
    obj = struct.pack("<HI", _OBJECT, 6 + len(name_b) + len(tm)) + name_b + tm
    edit = struct.pack("<HI", _EDIT3DS, 6 + len(obj)) + obj
    main = struct.pack("<HI", _MAIN, 6 + len(edit)) + edit
    with open(path, "wb") as out:
        out.write(main)

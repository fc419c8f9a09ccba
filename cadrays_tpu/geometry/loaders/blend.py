"""Native bounded-subset Blender `.blend` reader.

Reference parity: the reference imports BLEND through its Assimp-based
mesh importer (`rtmeshread`), and BLEND is the one format whose object
transformations are auto-pre-baked into the meshes
(/root/reference/src/Launcher/ImportSettingsEditor.cxx:62-65, import
flags at :199-277).  This module implements the same contract natively:

  * DNA-driven: a .blend file embeds its own schema (the SDNA catalog in
    the DNA1 block — names, types, type sizes, struct layouts), so field
    offsets are computed from the FILE's catalog, never hard-coded.
    Files written by different Blender versions parse correctly as long
    as they use the classic mesh layout.
  * Bounded subset (documented): little-endian files, 4- or 8-byte
    pointers, `Object` blocks of type mesh with their `obmat` world
    matrices, `Mesh` blocks in the MVert/MPoly/MLoop(+MLoopUV) layout
    (Blender ~2.63 through 3.x), `Material` diffuse/specular/roughness.
    Blender >= 3.5 moved vertex storage into generic attribute layers;
    such files (no `*mvert` field in the catalog's Mesh) raise with the
    converter hint, as do big-endian files.
  * Auto-pretransform: every object's mesh is returned in WORLD space
    (obmat applied to vertices, inverse-transpose to normals) — the
    BLEND-specific semantics the reference hard-codes.

Layout notes (verified against Blender's DNA conventions):
  * block header: code[4] size[i4] old_addr[ptr] sdna_idx[i4] count[i4];
  * `obmat[4][4]` is stored column-major with respect to the usual
    "matrix @ column-vector" convention: obmat[3][0..2] is the
    translation, so the numpy world matrix is the stored (4,4) transposed;
  * MVert.no[3] are int16 normals scaled by 32767.
"""
from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry.loaders.obj import LoadedPart
from cadrays_tpu.geometry.mesh import TriangleMesh

_OB_MESH = 1  # Object.type for mesh objects


@dataclass
class _Field:
    type_name: str
    name: str          # raw DNA name, e.g. "*mvert", "co[3]", "obmat[4][4]"
    offset: int
    size: int
    is_ptr: bool
    count: int         # total array element count (product of dims)


@dataclass
class _Struct:
    type_name: str
    size: int
    fields: Dict[str, _Field] = field(default_factory=dict)


class _SDNA:
    """Parsed DNA1 catalog: struct layouts with computed field offsets."""

    def __init__(self, data: bytes, ptr_size: int):
        self.ptr_size = ptr_size
        if data[:4] != b"SDNA":
            raise ValueError("DNA1 block does not start with SDNA")
        pos = 4

        def align4(p):
            return (p + 3) & ~3

        def read_strings(tag):
            nonlocal pos
            if data[pos:pos + 4] != tag:
                raise ValueError(f"SDNA: expected {tag!r} at {pos}")
            pos += 4
            (n,) = struct.unpack_from("<i", data, pos)
            pos += 4
            out = []
            for _ in range(n):
                end = data.index(b"\0", pos)
                out.append(data[pos:end].decode("ascii", "replace"))
                pos = end + 1
            pos = align4(pos)
            return out

        names = read_strings(b"NAME")
        types = read_strings(b"TYPE")
        if data[pos:pos + 4] != b"TLEN":
            raise ValueError("SDNA: expected TLEN")
        pos += 4
        tlen = list(struct.unpack_from(f"<{len(types)}h", data, pos))
        pos = align4(pos + 2 * len(types))
        if data[pos:pos + 4] != b"STRC":
            raise ValueError("SDNA: expected STRC")
        pos += 4
        (n_str,) = struct.unpack_from("<i", data, pos)
        pos += 4

        self.structs: List[_Struct] = []
        self.by_name: Dict[str, int] = {}
        for _ in range(n_str):
            t_idx, n_fields = struct.unpack_from("<hh", data, pos)
            pos += 4
            st = _Struct(type_name=types[t_idx], size=tlen[t_idx])
            off = 0
            for _ in range(n_fields):
                ft, fn = struct.unpack_from("<hh", data, pos)
                pos += 4
                raw = names[fn]
                is_ptr = raw.startswith("*")
                count = 1
                for dim in re.findall(r"\[(\d+)\]", raw):
                    count *= int(dim)
                base = (self.ptr_size if is_ptr
                        else (ptr_size if "(*" in raw  # function pointer
                              else tlen[ft]))
                size = base * count
                key = raw.lstrip("*").split("[")[0].split("(")[-1] \
                    .rstrip(")")
                st.fields[key] = _Field(types[ft], raw, off, size,
                                        is_ptr, count)
                off += size
            self.structs.append(st)
            self.by_name[st.type_name] = len(self.structs) - 1


@dataclass
class _Block:
    code: bytes
    sdna_idx: int
    count: int
    data: bytes


class _BlendFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        if raw[:7] != b"BLENDER":
            # compressed .blend (gzip/zstd) — bounded subset: raise
            if raw[:2] == b"\x1f\x8b":
                import gzip

                raw = gzip.decompress(raw)
                if raw[:7] != b"BLENDER":
                    raise ValueError("not a .blend file after gunzip")
            else:
                raise ValueError(
                    "not an uncompressed .blend file (zstd-compressed "
                    "saves need `blender -b file.blend -o out.glb`)")
        ptr_ch, endian = raw[7:8], raw[8:9]
        if endian != b"v":
            raise ValueError(".blend big-endian files are not supported")
        self.ptr_size = 8 if ptr_ch == b"-" else 4
        self.version = raw[9:12].decode("ascii", "replace")
        ptr_fmt = "<Q" if self.ptr_size == 8 else "<I"

        self.blocks: List[_Block] = []
        self.by_addr: Dict[int, _Block] = {}
        self.sdna: Optional[_SDNA] = None
        pos = 12
        head = 16 + self.ptr_size
        while pos + head <= len(raw):
            code = raw[pos:pos + 4]
            (size,) = struct.unpack_from("<i", raw, pos + 4)
            (addr,) = struct.unpack_from(ptr_fmt, raw, pos + 8)
            sdna_idx, count = struct.unpack_from(
                "<ii", raw, pos + 8 + self.ptr_size)
            pos += head
            if code == b"ENDB":
                break
            data = raw[pos:pos + size]
            pos += size
            blk = _Block(code, sdna_idx, count, data)
            self.blocks.append(blk)
            if addr:
                self.by_addr[addr] = blk
            if code == b"DNA1":
                self.sdna = _SDNA(data, self.ptr_size)
        if self.sdna is None:
            raise ValueError(".blend file has no DNA1 catalog")

    # -- field readers ----------------------------------------------------
    def struct_of(self, blk: _Block) -> _Struct:
        return self.sdna.structs[blk.sdna_idx]

    def _unpack(self, fmt_ch: str, size: int, data: bytes, off: int,
                n: int):
        return struct.unpack_from(f"<{n}{fmt_ch}", data, off)

    _FMT = {"char": ("b", 1), "uchar": ("B", 1), "short": ("h", 2),
            "ushort": ("H", 2), "int": ("i", 4), "uint": ("I", 4),
            "float": ("f", 4), "double": ("d", 8),
            "int64_t": ("q", 8), "uint64_t": ("Q", 8)}

    def read(self, blk: _Block, fieldname: str, index: int = 0):
        """Read a scalar/array field of element `index` of the block."""
        st = self.struct_of(blk)
        f = st.fields.get(fieldname)
        if f is None:
            return None
        base = index * st.size + f.offset
        if f.is_ptr:
            fmt = "Q" if self.ptr_size == 8 else "I"
            vals = struct.unpack_from(f"<{f.count}{fmt}", blk.data, base)
            return vals[0] if f.count == 1 else vals
        fmt, _ = self._FMT.get(f.type_name, (None, None))
        if fmt is None:
            return None  # embedded struct — not needed in the subset
        vals = struct.unpack_from(f"<{f.count}{fmt}", blk.data, base)
        return vals[0] if f.count == 1 else vals

    def read_name(self, blk: _Block) -> str:
        """ID.name (first embedded field of ID-bearing structs): 2-char
        type tag + name, NUL-terminated."""
        st = self.struct_of(blk)
        f = st.fields.get("id")
        off = f.offset if f is not None else 0
        id_st = self.sdna.structs[self.sdna.by_name.get("ID", 0)]
        nf = id_st.fields.get("name")
        if nf is None:
            return ""
        raw = blk.data[off + nf.offset:off + nf.offset + nf.size]
        s = raw.split(b"\0", 1)[0].decode("utf-8", "replace")
        return s[2:] if len(s) > 2 else s

    def deref(self, addr) -> Optional[_Block]:
        if not addr:
            return None
        return self.by_addr.get(int(addr))

    def array_of(self, blk: _Block, struct_name: str):
        """Interpret a DATA block as `count` rows of the named struct
        (DATA blocks carry the element struct's sdna index when written
        by Blender; trust it when set, else use the requested layout)."""
        st = (self.struct_of(blk) if blk.sdna_idx > 0
              else self.sdna.structs[self.sdna.by_name[struct_name]])
        if st.type_name != struct_name:
            st = self.sdna.structs[self.sdna.by_name[struct_name]]
        return st, blk.count


def _material_part(bf: _BlendFile, mat_blk) -> dict:
    if mat_blk is None:
        return {}
    out = {"material_name": bf.read_name(mat_blk)}
    r, g, b = (bf.read(mat_blk, "r"), bf.read(mat_blk, "g"),
               bf.read(mat_blk, "b"))
    if r is not None:
        out["diffuse"] = (float(r), float(g or 0.0), float(b or 0.0))
    sr = bf.read(mat_blk, "specr")
    if sr is not None:
        s = float(bf.read(mat_blk, "spec") or 1.0)
        out["specular"] = (s * float(sr),
                           s * float(bf.read(mat_blk, "specg") or 0.0),
                           s * float(bf.read(mat_blk, "specb") or 0.0))
    rough = bf.read(mat_blk, "roughness")
    if rough is not None:
        # shininess convention of LoadedPart (AisMesh.cxx:304-346 maps
        # shininess e -> roughness sqrt(2/(e+2))); invert it here
        r2 = max(float(rough), 1e-3) ** 2
        out["shininess"] = max(2.0 / r2 - 2.0, 0.0)
    return out


def _mesh_materials(bf: _BlendFile, me_blk) -> List[Optional[dict]]:
    totcol = bf.read(me_blk, "totcol") or 0
    mat_ptr = bf.read(me_blk, "mat")
    mats: List[Optional[dict]] = []
    arr = bf.deref(mat_ptr) if totcol else None
    if arr is not None:
        fmt = "Q" if bf.ptr_size == 8 else "I"
        ptrs = struct.unpack_from(f"<{totcol}{fmt}", arr.data, 0)
        for p in ptrs:
            mats.append(_material_part(bf, bf.deref(p)))
    while len(mats) < max(totcol, 1):
        mats.append(None)
    return mats


def _read_mesh(bf: _BlendFile, me_blk, world: np.ndarray,
               obj_name: str) -> List[LoadedPart]:
    st = bf.struct_of(me_blk)
    if "mvert" not in st.fields:
        raise ValueError(
            ".blend mesh uses the attribute-based layout (Blender >= "
            "3.5); export to glTF/OBJ first — e.g. "
            "`blender -b file.blend -o out.glb`.")
    totvert = bf.read(me_blk, "totvert") or 0
    totpoly = bf.read(me_blk, "totpoly") or 0
    totloop = bf.read(me_blk, "totloop") or 0
    vb = bf.deref(bf.read(me_blk, "mvert"))
    pb = bf.deref(bf.read(me_blk, "mpoly"))
    lb = bf.deref(bf.read(me_blk, "mloop"))
    if vb is None or pb is None or lb is None or not totpoly:
        return []

    def _strided(blk, count, row_size, offset, dtype, n):
        """Vectorized field extraction: view the DATA block as (count,
        row_size) bytes and reinterpret a column slice — one numpy op
        instead of `count` struct.unpack calls (a 1M-vertex mesh would
        otherwise spend tens of seconds in the interpreter)."""
        width = np.dtype(dtype).itemsize * n
        raw = np.frombuffer(blk.data, np.uint8,
                            count=count * row_size).reshape(count, row_size)
        return raw[:, offset:offset + width].copy().view(dtype) \
            .reshape(count, n)

    v_st, _ = bf.array_of(vb, "MVert")
    co_f = v_st.fields["co"]
    verts = _strided(vb, totvert, v_st.size, co_f.offset,
                     "<f4", 3).astype(np.float32)
    no_f = v_st.fields.get("no")
    if no_f is not None and no_f.type_name == "short":
        normals = _strided(vb, totvert, v_st.size, no_f.offset,
                           "<i2", 3).astype(np.float32) / 32767.0
    else:
        # unknown normal encoding: treat as absent so vertex normals
        # are recomputed (zeros would ship black shading)
        normals = None

    p_st, _ = bf.array_of(pb, "MPoly")
    ls_f = p_st.fields["loopstart"]
    tl_f = p_st.fields["totloop"]
    mn_f = p_st.fields.get("mat_nr")
    l_st, _ = bf.array_of(lb, "MLoop")
    lv_f = l_st.fields["v"]

    uvb = bf.deref(bf.read(me_blk, "mloopuv"))
    uvs = None
    if uvb is not None and "MLoopUV" in bf.sdna.by_name:
        uv_st, _ = bf.array_of(uvb, "MLoopUV")
        uv_f = uv_st.fields["uv"]
        uvs = _strided(uvb, totloop, uv_st.size, uv_f.offset,
                       "<f4", 2).astype(np.float32)

    loops = _strided(lb, totloop, l_st.size, lv_f.offset,
                     "<i4", 1).astype(np.int64).reshape(-1)

    # fan-triangulate each polygon, grouped by material slot
    starts = _strided(pb, totpoly, p_st.size, ls_f.offset,
                      "<i4", 1).reshape(-1)
    nloops = _strided(pb, totpoly, p_st.size, tl_f.offset,
                      "<i4", 1).reshape(-1)
    if mn_f is not None:
        mat_nrs = _strided(
            pb, totpoly, p_st.size, mn_f.offset,
            "<i2" if mn_f.type_name == "short" else "<i4", 1).reshape(-1)
    else:
        mat_nrs = np.zeros(totpoly, np.int32)
    by_mat: Dict[int, List[Tuple[int, int, int]]] = {}
    for p in range(totpoly):
        start, n = int(starts[p]), int(nloops[p])
        tris = by_mat.setdefault(int(mat_nrs[p]), [])
        for k in range(1, n - 1):
            tris.append((start, start + k, start + k + 1))

    # world transform (auto-pretransform: ImportSettingsEditor.cxx:62-65)
    lin = world[:3, :3]
    nrm_m = np.linalg.inv(lin).T if abs(np.linalg.det(lin)) > 1e-12 \
        else lin
    wverts = verts @ lin.T + world[:3, 3]
    wnorms = None
    if normals is not None:
        wnorms = normals @ nrm_m.T
        ln = np.linalg.norm(wnorms, axis=-1, keepdims=True)
        wnorms = np.where(ln > 1e-12, wnorms / np.maximum(ln, 1e-12),
                          wnorms).astype(np.float32)

    mats = _mesh_materials(bf, me_blk)
    parts: List[LoadedPart] = []
    for mat_nr in sorted(by_mat):
        tri_loops = np.asarray(by_mat[mat_nr], np.int64)  # (T, 3) loop ids
        tri_v = loops[tri_loops]  # (T, 3) vertex ids
        used = np.unique(tri_v)
        remap = np.zeros(totvert, np.int64)
        remap[used] = np.arange(used.size)
        mesh_v = wverts[used].astype(np.float32)
        mesh_n = wnorms[used] if wnorms is not None else None
        mesh_uv = None
        if uvs is not None:
            # per-loop UVs -> per-vertex (last loop of a vertex wins;
            # faithful splitting would duplicate vertices — bounded)
            mesh_uv = np.zeros((used.size, 2), np.float32)
            mesh_uv[remap[tri_v.reshape(-1)]] = uvs[
                tri_loops.reshape(-1)]
        idx = remap[tri_v].astype(np.int32)
        m = TriangleMesh(mesh_v, idx, mesh_n, mesh_uv)
        if mesh_n is None:
            m.compute_vertex_normals()
        info = mats[mat_nr] if mat_nr < len(mats) and mats[mat_nr] \
            else {}
        parts.append(LoadedPart(
            mesh=m,
            material_name=info.get("material_name", "") or obj_name,
            diffuse=info.get("diffuse"),
            specular=info.get("specular"),
            shininess=info.get("shininess"),
        ))
    return parts


def load_blend(path: str) -> List[LoadedPart]:
    """Read mesh objects from a .blend file, world-space (pre-transformed).

    Returns one LoadedPart per (object, material slot), matching the
    other loaders' grouping so `rtmeshread` flags apply uniformly.
    """
    bf = _BlendFile(path)
    parts: List[LoadedPart] = []
    for blk in bf.blocks:
        if blk.code != b"OB\0\0" and blk.code[:2] != b"OB":
            continue
        if bf.struct_of(blk).type_name != "Object":
            continue
        if (bf.read(blk, "type") or 0) != _OB_MESH:
            continue
        me = bf.deref(bf.read(blk, "data"))
        if me is None or bf.struct_of(me).type_name != "Mesh":
            continue
        obmat = bf.read(blk, "obmat")
        world = (np.asarray(obmat, np.float32).reshape(4, 4).T
                 if obmat is not None else np.eye(4, dtype=np.float32))
        parts.extend(_read_mesh(bf, me, world, bf.read_name(blk)))
    if not parts:
        raise ValueError(
            "no mesh objects found in .blend file (only the classic "
            "MVert/MPoly/MLoop layout is supported)")
    return parts

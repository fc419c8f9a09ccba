"""Native FBX reader — ASCII (FBX 7.x text) AND Kaydara binary.

Closes the reference's Assimp import matrix (FBX entry,
src/Launcher/ImportSettingsEditor.cxx:199-277): Geometry nodes
(Vertices / PolygonVertexIndex / LayerElementNormal / LayerElementUV),
Model local TRS, Materials (Diffuse/Specular/Emissive color, Shininess)
and the OO/OP Connections wiring them together. Binary files parse into
the same node tree (zlib-deflated arrays, 32-bit <2016 and 64-bit
>=2016 record layouts, the "name\\x00\\x01class" string convention), so
the whole semantics layer is shared between the two containers.

Coordinate convention: FBX is Y-up by default; the importer converts to
the framework's Z-up (the reference applies the same fix-up via its
up-axis combo, ImportSettingsEditor.cxx:73-150). GlobalSettings'
UpAxis/UpAxisSign are honored when present.
"""
from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry.loaders.obj import LoadedPart
from cadrays_tpu.geometry.mesh import TriangleMesh


class FbxNode:
    __slots__ = ("name", "props", "children")

    def __init__(self, name: str):
        self.name = name
        self.props: list = []
        self.children: List["FbxNode"] = []

    def find(self, name: str) -> Optional["FbxNode"]:
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str) -> List["FbxNode"]:
        return [c for c in self.children if c.name == name]


_TOKEN = re.compile(
    r'"(?:[^"\\]|\\.)*"'      # quoted string
    r"|[{}]"                   # braces
    r"|[A-Za-z_][A-Za-z0-9_]*:"  # key
    r"|[-+0-9.eE*][-+0-9.eEXx]*"  # number / *count
    r"|,")


def _parse_ascii(text: str) -> FbxNode:
    # strip comments
    lines = []
    for ln in text.splitlines():
        i = ln.find(";")
        lines.append(ln if i < 0 else ln[:i])
    toks = _TOKEN.findall("\n".join(lines))
    root = FbxNode("")
    stack = [root]
    cur: Optional[FbxNode] = None
    for t in toks:
        if t == "{":
            stack.append(cur)
        elif t == "}":
            stack.pop()
        elif t == ",":
            continue
        elif t.endswith(":") and not t[0].isdigit():
            if t == "a:":  # array payload: keep appending to current node
                continue
            cur = FbxNode(t[:-1])
            stack[-1].children.append(cur)
        elif cur is not None:
            if t.startswith('"'):
                cur.props.append(t[1:-1])
            elif t.startswith("*"):
                continue  # array length hint
            else:
                try:
                    cur.props.append(float(t) if ("." in t or "e" in t
                                                  or "E" in t)
                                     else int(t))
                except ValueError:
                    pass
    return root


def _parse_binary(data: bytes) -> FbxNode:
    """Kaydara FBX Binary -> the same FbxNode tree `_parse_ascii` builds,
    so the whole semantics layer (Geometry/Model/Material/Connections)
    is shared. Array properties may be zlib-deflated (Encoding=1);
    strings use the binary "name\\x00\\x01class" convention, normalized
    here to the ASCII "class::name" form."""
    import struct
    import zlib

    version = struct.unpack_from("<I", data, 23)[0]
    wide = version >= 7500  # 64-bit offsets from FBX 2016 on
    offs_fmt = "<QQQB" if wide else "<IIIB"
    offs_len = struct.calcsize(offs_fmt)

    def norm_str(b: bytes):
        try:
            s = b.decode("utf-8", errors="replace")
        except Exception:
            return ""
        if "\x00\x01" in s:
            name, cls = s.split("\x00\x01", 1)
            return f"{cls}::{name}"
        return s

    def read_props(pos: int, count: int, out: list) -> int:
        for _ in range(count):
            tc = data[pos:pos + 1]
            pos += 1
            if tc == b"Y":
                out.append(struct.unpack_from("<h", data, pos)[0])
                pos += 2
            elif tc == b"C":
                out.append(int(data[pos]))
                pos += 1
            elif tc == b"I":
                out.append(struct.unpack_from("<i", data, pos)[0])
                pos += 4
            elif tc == b"F":
                out.append(struct.unpack_from("<f", data, pos)[0])
                pos += 4
            elif tc == b"D":
                out.append(struct.unpack_from("<d", data, pos)[0])
                pos += 8
            elif tc == b"L":
                out.append(struct.unpack_from("<q", data, pos)[0])
                pos += 8
            elif tc in (b"f", b"d", b"l", b"i", b"b"):
                n, enc, clen = struct.unpack_from("<III", data, pos)
                pos += 12
                dty = {b"f": "<f4", b"d": "<f8", b"l": "<i8",
                       b"i": "<i4", b"b": "u1"}[tc]
                if enc == 1:
                    raw = zlib.decompress(data[pos:pos + clen])
                    pos += clen
                else:
                    nbytes = n * np.dtype(dty).itemsize
                    raw = data[pos:pos + nbytes]
                    pos += nbytes
                arr = np.frombuffer(raw, dtype=dty, count=n)
                out.extend(float(x) if tc in (b"f", b"d") else int(x)
                           for x in arr)
            elif tc == b"S":
                n = struct.unpack_from("<I", data, pos)[0]
                pos += 4
                out.append(norm_str(data[pos:pos + n]))
                pos += n
            elif tc == b"R":
                n = struct.unpack_from("<I", data, pos)[0]
                pos += 4
                # keep positional indexing stable for later props in the
                # record (Properties70 'P' payloads embed raw blobs)
                out.append(data[pos:pos + n])
                pos += n
            else:
                raise ValueError(f"fbx: unknown property type {tc!r}")
        return pos

    def read_node(pos: int, parent: FbxNode) -> int:
        """Parse one node record; returns position after it (0 = null)."""
        end, n_props, _plen, name_len = struct.unpack_from(
            offs_fmt, data, pos)
        pos += offs_len
        if end == 0:  # null terminator record
            return 0
        name = data[pos:pos + name_len].decode("ascii", errors="replace")
        pos += name_len
        node = FbxNode(name)
        parent.children.append(node)
        pos = read_props(pos, n_props, node.props)
        while pos < end:
            nxt = read_node(pos, node)
            if nxt == 0:
                pos += offs_len  # consumed the null record
                break
            pos = nxt
        return end

    root = FbxNode("")
    pos = 27  # magic(21) + [0x1a, 0x00] + version(4)
    while pos + offs_len <= len(data):
        nxt = read_node(pos, root)
        if nxt == 0 or nxt <= pos:
            break
        pos = nxt
    return root


def _nums(node: Optional[FbxNode]) -> np.ndarray:
    if node is None:
        return np.zeros(0)
    vals = [p for p in node.props if isinstance(p, (int, float))]
    # FBX 7.x wraps the payload in `a:` child-less form already handled;
    # some exporters put the array in a child named 'a'
    a = node.find("a")
    if a is not None:
        vals = [p for p in a.props if isinstance(p, (int, float))]
    return np.asarray(vals, np.float64)


def _rot_matrix(rx, ry, rz):
    """FBX Lcl Rotation: XYZ euler, degrees."""
    cx, sx = math.cos(math.radians(rx)), math.sin(math.radians(rx))
    cy, sy = math.cos(math.radians(ry)), math.sin(math.radians(ry))
    cz, sz = math.cos(math.radians(rz)), math.sin(math.radians(rz))
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ my @ mx


def _prop70(node: FbxNode, name: str) -> Optional[list]:
    p70 = node.find("Properties70")
    if p70 is None:
        return None
    for p in p70.find_all("P"):
        if p.props and p.props[0] == name:
            return p.props
    return None


def _triangulate_polys(poly_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """PolygonVertexIndex -> (tri vertex ids, source polygon-vertex ids).

    Negative entries terminate a polygon and encode ~index. Fan
    triangulation; also returns, per triangle corner, the index into the
    polygon-vertex stream (for ByPolygonVertex attribute mapping)."""
    tris = []
    corners = []
    poly: List[int] = []
    cidx: List[int] = []
    for i, v in enumerate(poly_idx.astype(np.int64)):
        last = v < 0
        vi = int(~v if last else v)
        poly.append(vi)
        cidx.append(i)
        if last:
            for k in range(1, len(poly) - 1):
                tris.append((poly[0], poly[k], poly[k + 1]))
                corners.append((cidx[0], cidx[k], cidx[k + 1]))
            poly = []
            cidx = []
    return (np.asarray(tris, np.int64).reshape(-1, 3),
            np.asarray(corners, np.int64).reshape(-1, 3))


def load_fbx(path: str) -> List[LoadedPart]:
    with open(path, "rb") as f:
        blob = f.read()
    if blob.startswith(b"Kaydara FBX Binary"):
        root = _parse_binary(blob)
    else:
        root = _parse_ascii(blob.decode("utf-8", errors="replace"))

    objects = root.find("Objects")
    if objects is None:
        raise ValueError("no Objects section: not an ASCII FBX file")

    # --- global axis --------------------------------------------------
    up_axis, up_sign = 1, 1  # FBX default Y-up
    gs = root.find("GlobalSettings")
    if gs is not None:
        ua = _prop70(gs, "UpAxis")
        us = _prop70(gs, "UpAxisSign")
        if ua is not None:
            up_axis = int(ua[-1])
        if us is not None:
            up_sign = int(us[-1])

    geoms: Dict[int, FbxNode] = {}
    models: Dict[int, FbxNode] = {}
    materials: Dict[int, FbxNode] = {}
    for c in objects.children:
        if not c.props or not isinstance(c.props[0], (int, float)):
            continue
        oid = int(c.props[0])
        if c.name == "Geometry":
            geoms[oid] = c
        elif c.name == "Model":
            models[oid] = c
        elif c.name == "Material":
            materials[oid] = c

    # --- connections ---------------------------------------------------
    geom_of_model: Dict[int, int] = {}
    mats_of_model: Dict[int, List[int]] = {}
    parent_of_model: Dict[int, int] = {}
    conns = root.find("Connections")
    for c in (conns.children if conns is not None else []):
        if c.name != "C" or len(c.props) < 3:
            continue
        kind, a, b = c.props[0], int(c.props[1]), int(c.props[2])
        if kind != "OO":
            continue
        if a in geoms and b in models:
            geom_of_model[b] = a
        elif a in materials and b in models:
            mats_of_model.setdefault(b, []).append(a)
        elif a in models:
            parent_of_model[a] = b  # b == 0 -> scene root

    def model_matrix(mid: int) -> np.ndarray:
        m = np.eye(4)
        node = models.get(mid)
        while node is not None:
            t = _prop70(node, "Lcl Translation")
            r = _prop70(node, "Lcl Rotation")
            s = _prop70(node, "Lcl Scaling")
            loc = np.eye(4)
            if s is not None:
                loc[:3, :3] = np.diag(s[-3:])
            if r is not None:
                loc[:3, :3] = _rot_matrix(*r[-3:]) @ loc[:3, :3]
            if t is not None:
                loc[:3, 3] = t[-3:]
            m = loc @ m
            pid = parent_of_model.get(int(node.props[0]), 0)
            node = models.get(pid)
        return m

    # Y-up (FBX default) -> Z-up; X-up and Z-up sources handled too
    axis_fix = np.eye(4)
    if up_axis == 1:
        axis_fix[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                                    np.float64) * 1.0
    elif up_axis == 0:
        axis_fix[:3, :3] = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]],
                                    np.float64)
    if up_sign < 0:
        # Source up points along the NEGATIVE axis: pre-rotate 180 deg
        # about a horizontal source axis (negate the up column and one
        # other) — a proper rotation, unlike negating the whole matrix,
        # which mirrors the geometry (det -1).
        d = np.ones(3)
        d[up_axis] = -1.0
        d[(up_axis + 1) % 3] = -1.0
        axis_fix[:3, :3] = axis_fix[:3, :3] * d[None, :]

    parts: List[LoadedPart] = []
    for mid, gid in geom_of_model.items():
        g = geoms[gid]
        verts = _nums(g.find("Vertices")).reshape(-1, 3)
        poly = _nums(g.find("PolygonVertexIndex"))
        if verts.size == 0 or poly.size == 0:
            continue
        tris, corners = _triangulate_polys(poly)

        # normals / uvs (ByPolygonVertex or ByVertice mapping)
        normals = uvs = None
        ln = g.find("LayerElementNormal")
        if ln is not None:
            nvals = _nums(ln.find("Normals")).reshape(-1, 3)
            mapping = (ln.find("MappingInformationType").props[0]
                       if ln.find("MappingInformationType") else
                       "ByPolygonVertex")
            if mapping == "ByVertice" and len(nvals) == len(verts):
                normals = nvals
        luv = g.find("LayerElementUV")
        uv_vals = uv_index = None
        if luv is not None:
            uv_vals = _nums(luv.find("UV")).reshape(-1, 2)
            ui = luv.find("UVIndex")
            if ui is not None:
                uv_index = _nums(ui).astype(np.int64)

        m = axis_fix @ model_matrix(mid)
        v4 = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
        verts_w = (v4 @ m.T)[:, :3]

        # per-polygon-vertex attributes force a vertex split; keep the
        # simple path (per-vertex) when possible
        if uv_vals is not None and uv_index is not None \
                and len(uv_index) >= int(corners.max(initial=-1)) + 1:
            flat_v = verts_w[tris.reshape(-1)]
            flat_uv = uv_vals[uv_index[corners.reshape(-1)]]
            idx = np.arange(len(flat_v), dtype=np.int32).reshape(-1, 3)
            mesh = TriangleMesh(flat_v.astype(np.float32), idx,
                                uvs=flat_uv.astype(np.float32))
        else:
            mesh = TriangleMesh(
                verts_w.astype(np.float32), tris.astype(np.int32),
                normals=None if normals is None else
                normals.astype(np.float32),
                uvs=None)

        part = LoadedPart(mesh=mesh)
        for matid in mats_of_model.get(mid, [])[:1]:
            mat = materials[matid]
            name = str(mat.props[1]) if len(mat.props) > 1 else ""
            part.material_name = name.replace("Material::", "")
            dc = _prop70(mat, "DiffuseColor")
            sc = _prop70(mat, "SpecularColor")
            ec = _prop70(mat, "EmissiveColor")
            sh = _prop70(mat, "Shininess") or _prop70(mat,
                                                     "ShininessExponent")
            if dc is not None:
                part.diffuse = tuple(float(x) for x in dc[-3:])
            if sc is not None:
                part.specular = tuple(float(x) for x in sc[-3:])
            if ec is not None:
                part.emission = tuple(float(x) for x in ec[-3:])
            if sh is not None:
                part.shininess = float(sh[-1])
        parts.append(part)

    if not parts:
        raise ValueError("ASCII FBX contained no mesh geometry")
    return parts

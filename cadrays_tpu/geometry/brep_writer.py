"""OCCT text .brep WRITER — the inverse of geometry/brep.py's reader.

Capability contract: the reference persists CAD shapes as
`shapes/<name>.brep` + `restore` on scene export so parametric identity
survives the round-trip (src/ImportExport/ImportExport.cxx:69-81). Here
modeling-kernel shapes (mesh-backed solids with face ids, planar faces;
planar FaceShapes; compounds of either) are serialized as genuine
topology: one Plane surface per face, boundary wires of line edges with
3D curves + pcurves, shells/solids/compounds — the exact dialect
`parse_brep` consumes, and a valid "CASCADE Topology V1" subset.

Curved face groups have no analytic surface to recover from a triangle
mesh, so `shape_to_brep` returns None for them and the scene exporter
falls back to PLY for that node (documented limitation; the reference
has the original TopoDS_Shape in hand and never faces this).

`load_brep_solid` restores a .brep straight into a modeling SolidShape
(face ids = file face order), so `restore` keeps typed explode and the
rest of the DRAW semantics working on re-imported shapes.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_TOL = 1e-7


def _fmt(x: float) -> str:
    return f"{float(x):.12g}"


def _v3(v) -> str:
    return f"{_fmt(v[0])} {_fmt(v[1])} {_fmt(v[2])}"


class _Writer:
    """Collects TShape records; renders with end-relative references."""

    def __init__(self):
        self.curves: List[str] = []    # 3D curve records
        self.curves2d: List[str] = []  # pcurve records
        self.surfaces: List[str] = []  # surface records
        self.records: List[str] = []   # TShape bodies (without refs)
        self.subs: List[List[Tuple[str, int]]] = []  # per record

    def add_curve(self, a, b) -> int:
        """3D segment a->b as a line, param range [0,1]."""
        self.curves.append(f"1 {_v3(a)} {_v3(np.asarray(b) - np.asarray(a))}")
        return len(self.curves)

    def add_pcurve(self, a2, b2) -> int:
        d = (float(b2[0] - a2[0]), float(b2[1] - a2[1]))
        self.curves2d.append(
            f"1 {_fmt(a2[0])} {_fmt(a2[1])} {_fmt(d[0])} {_fmt(d[1])}")
        return len(self.curves2d)

    def add_plane(self, origin, normal, xdir) -> int:
        n = np.asarray(normal, np.float64)
        x = np.asarray(xdir, np.float64)
        y = np.cross(n, x)
        self.surfaces.append(
            f"1 {_v3(origin)} {_v3(n)} {_v3(x)} {_v3(y)}")
        return len(self.surfaces)

    def add_record(self, body: str, subs: List[Tuple[str, int]]) -> int:
        """Returns the 0-based record index."""
        self.records.append(body)
        self.subs.append(subs)
        return len(self.records) - 1

    def vertex(self, p) -> int:
        return self.add_record(f"Ve\n{_fmt(_TOL)}\n{_v3(p)}\n0 0", [])

    def edge(self, c3: int, c2: int, surf: int, v0: int, v1: int) -> int:
        body = (f"Ed\n {_fmt(_TOL)} 1 1 0\n"
                f"1 {c3} 0 0 1\n"
                f"2 {c2} {surf} 0 0 1\n"
                f"0")
        return self.add_record(body, [("+", v0), ("-", v1)])

    def wire(self, edges: List[int]) -> int:
        return self.add_record("Wi", [("+", e) for e in edges])

    def face(self, surf: int, wires: List[int]) -> int:
        return self.add_record(f"Fa\n0 {_fmt(_TOL)} {surf} 0",
                               [("+", w) for w in wires])

    def shell(self, faces: List[int]) -> int:
        return self.add_record("Sh", [("+", f) for f in faces])

    def solid(self, shells: List[int]) -> int:
        return self.add_record("So", [("+", s) for s in shells])

    def compound(self, children: List[int]) -> int:
        return self.add_record("Co", [("+", c) for c in children])

    def render(self) -> str:
        n = len(self.records)
        out = ["DBRep_DrawableShape", "",
               "CASCADE Topology V1, (c) Matra-Datavision",
               "Locations 0",
               f"Curve2ds {len(self.curves2d)}"]
        out += self.curves2d
        out.append(f"Curves {len(self.curves)}")
        out += self.curves
        out.append("Polygon3D 0")
        out.append("PolygonOnTriangulations 0")
        out.append(f"Surfaces {len(self.surfaces)}")
        out += self.surfaces
        out.append("Triangulations 0")
        out.append("")
        out.append(f"TShapes {n}")
        for i, (body, subs) in enumerate(zip(self.records, self.subs)):
            out.append(body)
            out.append("0101000")
            ref = " ".join(f"{sgn}{n - j} 0" for sgn, j in subs)
            out.append(f"{ref} *".strip())
            out.append("")
        out.append(f"+1 0")  # root = last record
        return "\n".join(out) + "\n"


def _face_groups(verts: np.ndarray, tris: np.ndarray,
                 face_id: np.ndarray):
    """Per face id: fitted plane + boundary loops in plane UV.

    Returns None when any face group is non-planar (no analytic surface
    to write)."""
    from cadrays_tpu.modeling.ops import _region_loops

    scale = max(float(np.max(np.ptp(verts, axis=0))), 1e-9)
    tol = 1e-5 * scale
    groups = []
    for f in np.unique(face_id):
        sel = tris[face_id == f]
        p0, p1, p2 = verts[sel[:, 0]], verts[sel[:, 1]], verts[sel[:, 2]]
        ncross = np.cross(p1 - p0, p2 - p0)
        n = ncross.sum(axis=0)
        ln = np.linalg.norm(n)
        if ln < 1e-20:
            return None
        n /= ln
        orig = verts[np.unique(sel)].mean(axis=0)
        d = (verts[np.unique(sel)] - orig) @ n
        if np.max(np.abs(d)) > tol:
            return None  # curved face group: not plane-representable
        # plane frame
        x = np.cross(n, [0.0, 0.0, 1.0])
        if np.linalg.norm(x) < 1e-6:
            x = np.cross(n, [0.0, 1.0, 0.0])
        x /= np.linalg.norm(x)
        y = np.cross(n, x)
        # boundary = directed edges used exactly once
        from collections import Counter
        cnt = Counter()
        for a, b, c in sel:
            for e in ((a, b), (b, c), (c, a)):
                cnt[e] += 1
        segs = []
        for (a, b), k in cnt.items():
            if cnt.get((b, a), 0) == 0 and k == 1:
                a2 = np.array([(verts[a] - orig) @ x, (verts[a] - orig) @ y])
                b2 = np.array([(verts[b] - orig) @ x, (verts[b] - orig) @ y])
                segs.append((a2, b2))
        loops = _region_loops(segs)
        if not loops:
            return None
        groups.append((f, orig, n, x, y, loops))
    return groups


def _emit_face(w: _Writer, orig, n, x, y, loops) -> int:
    surf = w.add_plane(orig, n, x)
    wires = []
    for loop in loops:
        pts3 = [orig + u * x + v * y for (u, v) in loop]
        vids = [w.vertex(p) for p in pts3]
        eids = []
        m = len(loop)
        for i in range(m):
            j = (i + 1) % m
            c3 = w.add_curve(pts3[i], pts3[j])
            c2 = w.add_pcurve(loop[i], loop[j])
            eids.append(w.edge(c3, c2, surf, vids[i], vids[j]))
        wires.append(w.wire(eids))
    return w.face(surf, wires)


def shape_to_brep(shape) -> Optional[str]:
    """Serialize a modeling shape to OCCT-text .brep; None if it carries
    curved faces (no analytic surface recoverable from the mesh)."""
    from cadrays_tpu.modeling.topo import (CompoundShape, FaceShape,
                                           SolidShape)

    w = _Writer()

    def emit_solid(s: SolidShape) -> Optional[int]:
        from cadrays_tpu.modeling.topo import shape_mesh

        v, t, fid = shape_mesh(s)  # world-space, location baked
        groups = _face_groups(np.asarray(v, np.float64),
                              np.asarray(t), np.asarray(fid))
        if groups is None:
            return None
        fids = [_emit_face(w, orig, n, x, y, loops)
                for (_, orig, n, x, y, loops) in groups]
        return w.solid([w.shell(fids)])

    def emit_faceshape(fs: FaceShape) -> int:
        fb = fs.baked()
        pl = fb.plane
        loops = [np.asarray(l, np.float64) for l in fb.loops]
        return _emit_face(w, pl.origin, pl.normal, pl.xdir,
                          [list(map(tuple, l)) for l in loops])

    if isinstance(shape, SolidShape):
        if emit_solid(shape) is None:
            return None
    elif isinstance(shape, FaceShape):
        emit_faceshape(shape)
    elif isinstance(shape, CompoundShape):
        kids = []
        for child in getattr(shape, "parts", []):
            if isinstance(child, SolidShape):
                r = emit_solid(child)
                if r is None:
                    return None
                kids.append(r)
            elif isinstance(child, FaceShape):
                kids.append(emit_faceshape(child))
            else:
                return None
        if not kids:
            return None
        w.compound(kids)
    else:
        return None
    return w.render()


def save_brep(shape, path: str) -> bool:
    txt = shape_to_brep(shape)
    if txt is None:
        return False
    with open(path, "w") as f:
        f.write(txt)
    return True


def load_brep_solid(path: str):
    """Restore a .brep as a modeling SolidShape (face ids = face order in
    the file), so typed explode / booleans keep working after a
    round-trip — DRAW `restore` parity."""
    from cadrays_tpu.geometry.brep import (_auto_deflection, _collect_faces,
                                           _compose_loc, _shape,
                                           _tessellate_face, parse_brep)
    from cadrays_tpu.modeling.topo import SolidShape

    with open(path, "r", errors="replace") as f:
        text = f.read()
    model = parse_brep(text)
    if not model.shapes:
        raise ValueError(f"{path}: no TShapes parsed")
    root_ref = model.root if model.root else len(model.shapes)
    faces: list = []
    _collect_faces(model, root_ref, 1, model.location(model.root_loc), faces)
    if not faces:
        faces = [(sh, (np.eye(3), np.zeros(3)), 1)
                 for sh in model.shapes if sh.kind == "Fa"]
    if not faces:
        raise ValueError(f"{path}: no faces")
    defl = _auto_deflection(model)
    V, T, F = [], [], []
    voff = 0
    for fi, (face, loc, orient) in enumerate(faces):
        part = _tessellate_face(model, face, loc, orient, defl)
        if part is None:
            continue
        v, t = part[0], part[3]
        V.append(np.asarray(v, np.float64))
        T.append(np.asarray(t, np.int64) + voff)
        F.append(np.full(len(t), fi, np.int32))
        voff += len(v)
    if not V:
        raise ValueError(f"{path}: no tessellatable faces")
    return SolidShape(np.concatenate(V), np.concatenate(T),
                      np.concatenate(F))

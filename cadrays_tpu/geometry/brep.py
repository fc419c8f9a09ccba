"""Native OCCT .brep (text "CASCADE Topology" format) reader + tessellator.

The reference restores .brep files through DRAW's `restore` command
(ImportSettingsEditor.cxx:290-316) and exports shapes as
`shapes/<name>.brep` in scene checkpoints (ImportExport.cxx:69-81). This
module reads the documented BREP text format (OCCT specification
"brep_format": Locations / Curve2ds / Curves / Surfaces / TShapes
sections), resolves the topology (Face -> Wire -> Edge -> 3D curve), and
triangulates each trimmed face with the generic tessellator — the same
back half as the STEP/IGES readers.

Supported geometry records:
  curves:   1 line, 2 circle, 3 ellipse, 6 Bezier, 7 B-spline,
            8 trimmed, 9 offset (base approximation)
  surfaces: 1 plane, 2 cylinder, 3 cone, 4 sphere, 5 torus,
            6 linear extrusion, 7 revolution, 8 Bezier, 9 B-spline,
            10 rectangular trimmed, 11 offset (base approximation)
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry import tessellate as tz
from cadrays_tpu.geometry.iges import XformCurve, XformSurface
from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.geometry.nurbs import BSplineCurve, BSplineSurface
from cadrays_tpu.geometry.step import _merge_parts

TWO_PI = 2.0 * math.pi


class _Tokens:
    """Whitespace token stream over the file body."""

    def __init__(self, text: str):
        self.toks = text.split()
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def num(self) -> float:
        return float(self.next().replace("D", "E").replace("d", "e"))

    def int(self) -> int:
        return int(self.next())

    def vec3(self) -> np.ndarray:
        return np.array([self.num(), self.num(), self.num()], np.float64)

    def skip_to(self, word: str) -> bool:
        """Advance just past the next occurrence of `word`."""
        while self.i < len(self.toks):
            if self.toks[self.i] == word:
                self.i += 1
                return True
            self.i += 1
        return False


# --------------------------------------------------------------------------
# geometry records
# --------------------------------------------------------------------------


def _read_curve(ts: _Tokens) -> Optional[tz.ParamCurve]:
    t = ts.int()
    if t == 1:  # line: P D
        p, d = ts.vec3(), ts.vec3()
        c = tz.LineCurve(p, d)
        c.domain = (0.0, 1.0)
        return c
    if t == 2:  # circle: P N Dx Dy r
        p, n, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()  # Dy (implied by right-handed frame)
        r = ts.num()
        c = tz.CircleCurve(tz.Frame(p, n, dx), r)
        c.domain = (0.0, TWO_PI)
        return c
    if t == 3:  # ellipse: P N Dx Dy rmaj rmin
        p, n, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        rmaj, rmin = ts.num(), ts.num()
        c = tz.EllipseCurve(tz.Frame(p, n, dx), rmaj, rmin)
        c.domain = (0.0, TWO_PI)
        return c
    if t in (4, 5):  # parabola / hyperbola: frame + focal params (skip)
        ts.vec3(), ts.vec3(), ts.vec3(), ts.vec3()
        ts.num()
        if t == 5:
            ts.num()
        return None
    if t == 6:  # Bezier: rational degree poles[+w]
        rational = ts.int()
        deg = ts.int()
        poles = np.zeros((deg + 1, 3))
        w = np.ones(deg + 1)
        for i in range(deg + 1):
            poles[i] = ts.vec3()
            if rational:
                w[i] = ts.num()
        knots = np.concatenate([np.zeros(deg + 1), np.ones(deg + 1)])
        c = tz.BSplineCurveAdapter(
            BSplineCurve(deg, knots, poles, w if rational else None))
        c.domain = (0.0, 1.0)
        return c
    if t == 7:  # B-spline: rational periodic degree npoles nknots ...
        rational = ts.int()
        ts.int()  # periodic flag (knot vector already encodes it)
        deg = ts.int()
        npoles = ts.int()
        nknots = ts.int()
        poles = np.zeros((npoles, 3))
        w = np.ones(npoles)
        for i in range(npoles):
            poles[i] = ts.vec3()
            if rational:
                w[i] = ts.num()
        kv, km = [], []
        for _ in range(nknots):
            kv.append(ts.num())
            km.append(ts.int())
        full = np.repeat(kv, km)
        c = tz.BSplineCurveAdapter(
            BSplineCurve(deg, full, poles, w if rational else None))
        c.domain = (float(kv[0]), float(kv[-1]))
        return c
    if t == 8:  # trimmed: first last <curve>
        a, b = ts.num(), ts.num()
        base = _read_curve(ts)
        if base is None:
            return None
        base.domain = (a, b)
        return base
    if t == 9:  # offset: distance <direction> <curve> — base approx
        ts.num()
        ts.vec3()
        return _read_curve(ts)
    return None


def _read_curve2d(ts: _Tokens) -> Optional[tz.ParamCurve]:
    """2D pcurve records (same tags, 2D points) -> curve in (u, v, 0)."""
    t = ts.int()

    def v2():
        return np.array([ts.num(), ts.num(), 0.0], np.float64)

    if t == 1:
        p, d = v2(), v2()
        c = tz.LineCurve(p, d)
        c.domain = (0.0, 1.0)
        return c
    if t == 2:
        p = v2()
        dx, dy = v2(), v2()
        r = ts.num()
        frame = tz.Frame(p, np.array([0.0, 0, 1]), dx)
        frame.y = dy / max(np.linalg.norm(dy), 1e-300)
        c = tz.CircleCurve(frame, r)
        c.domain = (0.0, TWO_PI)
        return c
    if t == 3:
        p = v2()
        dx, dy = v2(), v2()
        rmaj, rmin = ts.num(), ts.num()
        frame = tz.Frame(p, np.array([0.0, 0, 1]), dx)
        frame.y = dy / max(np.linalg.norm(dy), 1e-300)
        c = tz.EllipseCurve(frame, rmaj, rmin)
        c.domain = (0.0, TWO_PI)
        return c
    if t in (4, 5):
        v2(), v2(), v2()
        ts.num()
        if t == 5:
            ts.num()
        return None
    if t == 6:
        rational = ts.int()
        deg = ts.int()
        poles = np.zeros((deg + 1, 3))
        w = np.ones(deg + 1)
        for i in range(deg + 1):
            poles[i] = v2()
            if rational:
                w[i] = ts.num()
        knots = np.concatenate([np.zeros(deg + 1), np.ones(deg + 1)])
        c = tz.BSplineCurveAdapter(
            BSplineCurve(deg, knots, poles, w if rational else None))
        c.domain = (0.0, 1.0)
        return c
    if t == 7:
        rational = ts.int()
        ts.int()
        deg = ts.int()
        npoles = ts.int()
        nknots = ts.int()
        poles = np.zeros((npoles, 3))
        w = np.ones(npoles)
        for i in range(npoles):
            poles[i] = v2()
            if rational:
                w[i] = ts.num()
        kv, km = [], []
        for _ in range(nknots):
            kv.append(ts.num())
            km.append(ts.int())
        c = tz.BSplineCurveAdapter(
            BSplineCurve(deg, np.repeat(kv, km), poles,
                         w if rational else None))
        c.domain = (float(kv[0]), float(kv[-1]))
        return c
    if t == 8:
        a, b = ts.num(), ts.num()
        base = _read_curve2d(ts)
        if base is None:
            return None
        base.domain = (a, b)
        return base
    if t == 9:
        ts.num()
        return _read_curve2d(ts)
    return None


def _read_surface(ts: _Tokens) -> Optional[tz.ParamSurface]:
    t = ts.int()
    if t == 1:  # plane: P N Dx Dy
        p, n, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        return tz.PlaneSurface(tz.Frame(p, n, dx))
    if t == 2:  # cylinder
        p, z, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        r = ts.num()
        return tz.CylinderSurface(tz.Frame(p, z, dx), r)
    if t == 3:  # cone
        p, z, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        r, ang = ts.num(), ts.num()
        return tz.ConeSurface(tz.Frame(p, z, dx), r, ang)
    if t == 4:  # sphere
        p, z, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        r = ts.num()
        return tz.SphereSurface(tz.Frame(p, z, dx), r)
    if t == 5:  # torus
        p, z, dx = ts.vec3(), ts.vec3(), ts.vec3()
        ts.vec3()
        r1, r2 = ts.num(), ts.num()
        return tz.TorusSurface(tz.Frame(p, z, dx), r1, r2)
    if t == 6:  # linear extrusion: D <curve>
        d = ts.vec3()
        c = _read_curve(ts)
        if c is None:
            return None
        s = tz.ExtrusionSurface(c, d)
        s.domain = (getattr(c, "domain", (0.0, 1.0)), (0.0, 1.0))
        return s
    if t == 7:  # revolution: P D <curve>
        p, d = ts.vec3(), ts.vec3()
        c = _read_curve(ts)
        if c is None:
            return None
        s = tz.RevolutionSurface(c, p, d)
        s.domain = ((0.0, TWO_PI), getattr(c, "domain", (0.0, 1.0)))
        return s
    if t == 8:  # Bezier surface
        urat, vrat = ts.int(), ts.int()
        udeg, vdeg = ts.int(), ts.int()
        nu, nv = udeg + 1, vdeg + 1
        net = np.zeros((nu, nv, 3))
        w = np.ones((nu, nv))
        for i in range(nu):
            for j in range(nv):
                net[i, j] = ts.vec3()
                if urat or vrat:
                    w[i, j] = ts.num()
        ku = np.concatenate([np.zeros(nu), np.ones(nu)])
        kv = np.concatenate([np.zeros(nv), np.ones(nv)])
        s = tz.BSplineSurfaceAdapter(BSplineSurface(
            udeg, vdeg, ku, kv, net, w if (urat or vrat) else None))
        s.domain = ((0.0, 1.0), (0.0, 1.0))
        return s
    if t == 9:  # B-spline surface
        urat, vrat = ts.int(), ts.int()
        ts.int(), ts.int()  # periodic flags
        udeg, vdeg = ts.int(), ts.int()
        nu, nv = ts.int(), ts.int()
        nku, nkv = ts.int(), ts.int()
        net = np.zeros((nu, nv, 3))
        w = np.ones((nu, nv))
        rational = urat or vrat
        for i in range(nu):
            for j in range(nv):
                net[i, j] = ts.vec3()
                if rational:
                    w[i, j] = ts.num()
        kuv, kum = [], []
        for _ in range(nku):
            kuv.append(ts.num())
            kum.append(ts.int())
        kvv, kvm = [], []
        for _ in range(nkv):
            kvv.append(ts.num())
            kvm.append(ts.int())
        s = tz.BSplineSurfaceAdapter(BSplineSurface(
            udeg, vdeg, np.repeat(kuv, kum), np.repeat(kvv, kvm), net,
            w if rational else None))
        s.domain = ((float(kuv[0]), float(kuv[-1])),
                    (float(kvv[0]), float(kvv[-1])))
        return s
    if t == 10:  # rectangular trimmed: u1 u2 v1 v2 <surface>
        u1, u2, v1, v2 = ts.num(), ts.num(), ts.num(), ts.num()
        base = _read_surface(ts)
        if base is None:
            return None
        base.domain = ((u1, u2), (v1, v2))
        return base
    if t == 11:  # offset: distance <surface> — base approximation
        ts.num()
        return _read_surface(ts)
    return None


# --------------------------------------------------------------------------
# topology
# --------------------------------------------------------------------------


class BrepShape:
    def __init__(self, kind: str):
        self.kind = kind          # Ve Ed Wi Fa Sh So CS Co
        self.point: Optional[np.ndarray] = None       # vertex
        self.curves: List[Tuple[int, int, float, float]] = []  # edge 3D reps
        self.pcurves: List[Tuple[int, int, float, float]] = []  # edge 2D reps
        self.degenerated = False
        self.surface = 0          # face: surface index
        self.location = 0         # face: location index
        self.subs: List[Tuple[int, int, int]] = []  # (index, orient, loc)


class BrepModel:
    def __init__(self):
        self.locations: List[np.ndarray] = []  # (3, 4) each, 1-based
        self.curves: List[Optional[tz.ParamCurve]] = []
        self.curves2d: List[Optional[tz.ParamCurve]] = []
        self.surfaces: List[Optional[tz.ParamSurface]] = []
        self.shapes: List[BrepShape] = []      # file order, 1-based refs
        self.root: int = 0
        self.root_loc: int = 0

    def location(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if idx <= 0 or idx > len(self.locations):
            return np.eye(3), np.zeros(3)
        m = self.locations[idx - 1]
        return m[:, :3], m[:, 3]


def parse_brep(text: str) -> BrepModel:
    model = BrepModel()
    ts = _Tokens(text)

    if ts.skip_to("Locations"):
        n = ts.int()
        for _ in range(n):
            t = ts.int()
            if t == 1:
                m = np.zeros((3, 4))
                for r in range(3):
                    for c in range(4):
                        m[r, c] = ts.num()
                model.locations.append(m)
            else:  # composed: pairs (loc power) terminated by 0
                m = np.eye(3, 4)
                while True:
                    li = ts.int()
                    if li == 0:
                        break
                    power = ts.int()
                    R, t3 = model.location(li)
                    sub = np.concatenate([R, t3[:, None]], axis=1)
                    step = sub
                    if power < 0:
                        Ri = np.linalg.inv(R)
                        step = np.concatenate([Ri, (-Ri @ t3)[:, None]], 1)
                        power = -power
                    for _ in range(power):
                        Rm, tm = m[:, :3], m[:, 3]
                        m = np.concatenate(
                            [Rm @ step[:, :3],
                             (Rm @ step[:, 3] + tm)[:, None]], axis=1)
                model.locations.append(m)

    if ts.skip_to("Curve2ds"):
        n = ts.int()
        for _ in range(n):
            try:
                model.curves2d.append(_read_curve2d(ts))
            except Exception:
                model.curves2d.append(None)

    if ts.skip_to("Curves"):
        n = ts.int()
        for _ in range(n):
            try:
                model.curves.append(_read_curve(ts))
            except Exception:
                model.curves.append(None)

    if ts.skip_to("Surfaces"):
        n = ts.int()
        for _ in range(n):
            try:
                model.surfaces.append(_read_surface(ts))
            except Exception:
                model.surfaces.append(None)

    if not ts.skip_to("TShapes"):
        return model
    n = ts.int()
    kinds = {"Ve", "Ed", "Wi", "Fa", "Sh", "So", "CS", "Co"}
    for _ in range(n):
        while ts.peek() is not None and ts.peek() not in kinds:
            ts.next()
        if ts.peek() is None:
            break
        sh = BrepShape(ts.next())
        if sh.kind == "Ve":
            ts.num()  # tolerance
            sh.point = ts.vec3()
            # vertex representations: records until "0 0"
            while True:
                a = ts.next()
                if a == "0":
                    b = ts.next()
                    if b == "0":
                        break
        elif sh.kind == "Ed":
            ts.num()  # tolerance
            ts.int()  # same parameter
            ts.int()  # same range
            sh.degenerated = bool(ts.int())
            while True:
                rt = ts.int()
                if rt == 0:
                    break
                if rt == 1:  # curve3d: <curve> <loc> <first> <last>
                    ci, li = ts.int(), ts.int()
                    a, b = ts.num(), ts.num()
                    sh.curves.append((ci, li, a, b))
                elif rt == 2:  # pcurve: <pcurve> <surf> <loc> <f> <l>
                    ci = ts.int()
                    ts.int()
                    li = ts.int()
                    a, b = ts.num(), ts.num()
                    sh.pcurves.append((ci, li, a, b))
                elif rt == 3:  # pcurve on closed surface: two pcurves
                    ci = ts.int()
                    ts.int()  # second pcurve
                    ts.next()  # continuity code
                    ts.int()
                    li = ts.int()
                    a, b = ts.num(), ts.num()
                    sh.pcurves.append((ci, li, a, b))
                elif rt in (4, 5, 6, 7):
                    # polygon / triangulation representations: skip the
                    # record conservatively (ints/floats until next known
                    # record tag is ambiguous) — bail out of this edge.
                    break
                else:
                    break
        elif sh.kind == "Fa":
            ts.int()  # natural restriction flag
            ts.num()  # tolerance
            sh.surface = ts.int()
            sh.location = ts.int()
        # flags line: a 7-digit binary word; skip tokens until we meet it
        while ts.peek() is not None:
            tok = ts.peek()
            if len(tok) == 7 and set(tok) <= {"0", "1"}:
                ts.next()
                break
            if tok in kinds or tok == "*":
                break
            ts.next()
        # subshape refs until "*"
        while ts.peek() is not None and ts.peek() != "*":
            tok = ts.next()
            if not tok or tok[0] not in "+-ie0123456789":
                break
            if tok[0] in "+-ie":
                orient = {"+": 1, "-": -1, "i": 2, "e": 3}[tok[0]]
                idx = int(tok[1:])
            else:
                orient = 1
                idx = int(tok)
            loc = int(ts.next())
            if idx != 0:
                sh.subs.append((idx, orient, loc))
        if ts.peek() == "*":
            ts.next()
        model.shapes.append(sh)
    # final root reference: e.g. "+5 0"
    while ts.peek() is not None:
        tok = ts.next()
        if tok and tok[0] in "+-ie" and tok[1:].isdigit():
            model.root = int(tok[1:])
            nxt = ts.peek()
            if nxt is not None and nxt.lstrip("-").isdigit():
                model.root_loc = ts.int()
            break
    return model


# --------------------------------------------------------------------------
# faces -> triangles
# --------------------------------------------------------------------------


def _shape(model: BrepModel, ref: int) -> Optional[BrepShape]:
    """Subshape references count from the END of the TShapes section:
    reference 1 = last TShape record (BRepTools_ShapeSet numbering)."""
    idx = len(model.shapes) - ref
    if 0 <= idx < len(model.shapes):
        return model.shapes[idx]
    return None


def _compose_loc(model: BrepModel, outer: Tuple[np.ndarray, np.ndarray],
                 loc_idx: int) -> Tuple[np.ndarray, np.ndarray]:
    R0, t0 = outer
    R1, t1 = model.location(loc_idx)
    return R0 @ R1, R0 @ t1 + t0


def _edge_polyline(model: BrepModel, edge: BrepShape, orient: int,
                   loc: Tuple[np.ndarray, np.ndarray],
                   deflection: float) -> Optional[np.ndarray]:
    if edge.degenerated or not edge.curves:
        return None
    ci, li, a, b = edge.curves[0]
    if not (1 <= ci <= len(model.curves)):
        return None
    c = model.curves[ci - 1]
    if c is None:
        return None
    R, t = _compose_loc(model, loc, li)
    ts_arr = tz.sample_curve(c, a, b, deflection, min_pts=8)
    pts = c.eval(ts_arr) @ R.T + t
    if orient == -1:
        pts = pts[::-1]
    return pts


def _tessellate_face(model: BrepModel, face: BrepShape,
                     loc: Tuple[np.ndarray, np.ndarray],
                     orient: int, deflection: float):
    if not (1 <= face.surface <= len(model.surfaces)):
        return None
    surf = model.surfaces[face.surface - 1]
    if surf is None:
        return None
    R, t = _compose_loc(model, loc, face.location)
    if not np.allclose(R, np.eye(3)) or not np.allclose(t, 0.0):
        surf = XformSurface(surf, R, t)
    loops: List[tz.TrimLoop] = []
    for wref, worient, wloc in face.subs:
        wire = _shape(model, wref)
        if wire is None or wire.kind != "Wi":
            continue
        wl = _compose_loc(model, loc, wloc)
        segs = []
        for eref, eorient, eloc in wire.subs:
            edge = _shape(model, eref)
            if edge is None or edge.kind != "Ed":
                continue
            el = _compose_loc(model, wl, eloc)
            pl = _edge_polyline(model, edge, eorient, el, deflection)
            if pl is not None and len(pl) >= 2:
                segs.append(pl)
        if not segs:
            continue
        pts = [segs[0]]
        for s in segs[1:]:
            if np.allclose(s[0], pts[-1][-1], atol=1e-6):
                s = s[1:]
            elif np.allclose(s[-1], pts[-1][-1], atol=1e-6):
                s = s[::-1][1:]
            pts.append(s)
        poly = np.vstack(pts)
        if len(poly) > 1 and np.allclose(poly[0], poly[-1], atol=1e-9):
            poly = poly[:-1]
        if len(poly) >= 3:
            loops.append(tz.TrimLoop(surf.inverse(poly), poly))
    if not loops:
        dom = getattr(surf, "domain", None)
        if dom is None:
            return None
        (u0, u1), (v0, v1) = dom
        us = np.linspace(u0, u1, 8)
        vs = np.linspace(v0, v1, 8)
        uv = np.concatenate([
            np.stack([us, np.full(8, v0)], 1)[:-1],
            np.stack([np.full(8, u1), vs], 1)[:-1],
            np.stack([us[::-1], np.full(8, v1)], 1)[:-1],
            np.stack([np.full(8, u0), vs[::-1]], 1)[:-1]])
        loops = [tz.TrimLoop(uv, surf.eval(uv))]
    try:
        return tz.tessellate_face(surf, loops, deflection,
                                  same_sense=(orient != -1))
    except Exception:
        return None


def _collect_faces(model: BrepModel, ref: int, orient: int,
                   loc: Tuple[np.ndarray, np.ndarray], out: list,
                   depth: int = 0) -> None:
    if depth > 64:
        return
    sh = _shape(model, ref)
    if sh is None:
        return
    if sh.kind == "Fa":
        out.append((sh, loc, orient))
        return
    for sref, sorient, sloc in sh.subs:
        sub_loc = _compose_loc(model, loc, sloc)
        o = sorient if orient != -1 else -sorient
        _collect_faces(model, sref, o, sub_loc, out, depth + 1)


def load_brep(path: str, deflection: float = 0.0) -> List[TriangleMesh]:
    """Read an OCCT .brep file into TriangleMesh parts (one per root
    solid/shell child, or one mesh for a bare face/wire-level shape)."""
    with open(path, "r", errors="replace") as f:
        text = f.read()
    if "CASCADE Topology" not in text:
        raise ValueError(
            f"{path}: not an OCCT text .brep (missing 'CASCADE Topology' "
            "header); binary .brep is not supported — re-save as text or "
            "register a CAD backend via register_tessellator")
    model = parse_brep(text)
    if not model.shapes:
        raise ValueError(f"{path}: no TShapes parsed")

    root_ref = model.root if model.root else len(model.shapes)
    root_loc = model.location(model.root_loc)
    root = _shape(model, root_ref)

    groups: List[list] = []
    if root is not None and root.kind in ("Co", "CS"):
        # one mesh per compound child
        for sref, sorient, sloc in root.subs:
            faces: list = []
            _collect_faces(model, sref, sorient,
                           _compose_loc(model, root_loc, sloc), faces)
            if faces:
                groups.append(faces)
    if not groups:
        faces = []
        _collect_faces(model, root_ref, 1, root_loc, faces)
        if faces:
            groups.append(faces)
    if not groups:
        # orphan faces anywhere in the file
        faces = [(sh, (np.eye(3), np.zeros(3)), 1)
                 for sh in model.shapes if sh.kind == "Fa"]
        if faces:
            groups.append(faces)

    if deflection <= 0:
        deflection = _auto_deflection(model)

    meshes = []
    for faces in groups:
        parts = [_tessellate_face(model, f, loc, o, deflection)
                 for (f, loc, o) in faces]
        mesh = _merge_parts(parts)
        if mesh is not None:
            meshes.append(mesh)
    if not meshes:
        raise ValueError(
            f"{path}: no tessellatable faces "
            f"({len(model.shapes)} shapes, {len(model.surfaces)} surfaces "
            "parsed)")
    return meshes


def _auto_deflection(model: BrepModel) -> float:
    pts = [sh.point for sh in model.shapes
           if sh.kind == "Ve" and sh.point is not None]
    if not pts:
        return 0.01
    arr = np.stack(pts[:20000])
    diag = float(np.linalg.norm(arr.max(0) - arr.min(0)))
    return max(diag * 0.004, 1e-6)

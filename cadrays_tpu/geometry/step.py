"""Native STEP (ISO 10303-21, AP203/AP214) reader + tessellator.

The reference imports STEP through OCCT's `testreadstep` DRAW command
(ImportSettingsEditor.cxx:317-343) and only ever consumes the tessellated
triangles (SURVEY.md §2.5 "Two-level BVH over tessellated CAD"). This
module is the framework's own L1 path: parse the Part-21 DATA section,
resolve the B-rep topology (MANIFOLD_SOLID_BREP / SHELL_BASED_SURFACE_MODEL
→ ADVANCED_FACE → FACE_BOUND → EDGE_LOOP → EDGE_CURVE), evaluate the
analytic / NURBS geometry, and triangulate each trimmed face with the
generic tessellator in `tessellate.py`.

Supported surfaces: PLANE, CYLINDRICAL/CONICAL/SPHERICAL/TOROIDAL_SURFACE,
SURFACE_OF_LINEAR_EXTRUSION, SURFACE_OF_REVOLUTION,
B_SPLINE_SURFACE_WITH_KNOTS (incl. rational complex-entity form).
Supported curves: LINE, CIRCLE, ELLIPSE, POLYLINE,
B_SPLINE_CURVE_WITH_KNOTS (incl. rational). Triangles already present as
TRIANGULATED_FACE / TESSELLATED_* entities (AP242) are passed through.
"""
from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.geometry import tessellate as tz
from cadrays_tpu.geometry.nurbs import BSplineCurve, BSplineSurface

# --------------------------------------------------------------------------
# Part-21 parsing
# --------------------------------------------------------------------------


class Ref(int):
    """An entity reference (#123) — distinct from a plain int arg."""
    __slots__ = ()


@dataclass
class Entity:
    id: int
    type: str          # upper-case simple type, or "" for complex records
    args: list         # parsed argument tree
    complex: Optional[List[Tuple[str, list]]] = None   # complex record parts


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<ref>\#\d+)
      | (?P<str>'(?:''|[^'])*')
      | (?P<enum>\.[A-Za-z0-9_]+\.)
      | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct>[(),*$=;])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        yield kind, val


class _Parser:
    def __init__(self, tokens):
        self.toks = list(tokens)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_args(self) -> list:
        """Parse a parenthesized argument list starting at '('."""
        kind, val = self.next()
        assert val == "(", f"expected ( got {val}"
        out = []
        while True:
            kind, val = self.peek()
            if val == ")":
                self.next()
                return out
            if val == ",":
                self.next()
                continue
            out.append(self.parse_value())

    def parse_value(self):
        kind, val = self.next()
        if kind == "ref":
            return Ref(int(val[1:]))
        if kind == "str":
            return val[1:-1].replace("''", "'")
        if kind == "enum":
            return val            # '.T.', '.F.', '.UNSPECIFIED.', ...
        if kind == "num":
            s = val.replace("D", "E").replace("d", "e")
            return float(s) if any(c in s for c in ".eE") else int(s)
        if kind == "punct":
            if val == "(":
                # nested list
                out = []
                while True:
                    k2, v2 = self.peek()
                    if v2 == ")":
                        self.next()
                        return out
                    if v2 == ",":
                        self.next()
                        continue
                    out.append(self.parse_value())
            if val in ("*", "$"):
                return None
        if kind == "name":
            # typed value inside a complex record or select: NAME(...)
            k2, v2 = self.peek()
            if v2 == "(":
                return (val.upper(), self.parse_args())
            return val
        return None


def _parse_data_section(text: str) -> Dict[int, Entity]:
    """Parse all `#id = ...;` records in the DATA section."""
    m = re.search(r"\bDATA\s*;", text)
    start = m.end() if m else 0
    m2 = re.search(r"\bENDSEC\s*;", text[start:])
    body = text[start:start + m2.start()] if m2 else text[start:]
    entities: Dict[int, Entity] = {}
    # split on ';' at top level — strings can contain ';', so scan
    records = []
    depth = 0
    in_str = False
    rec_start = 0
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if in_str:
            if c == "'":
                if i + 1 < n and body[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == ";":
            records.append(body[rec_start:i])
            rec_start = i + 1
        i += 1
    for rec in records:
        rec = rec.strip()
        if not rec.startswith("#"):
            continue
        eq = rec.find("=")
        if eq < 0:
            continue
        try:
            eid = int(rec[1:eq].strip())
        except ValueError:
            continue
        rhs = rec[eq + 1:].strip()
        p = _Parser(_tokenize(rhs))
        kind, val = p.peek()
        if kind == "name":
            p.next()
            etype = val.upper()
            args = p.parse_args()
            entities[eid] = Entity(eid, etype, args)
        elif val == "(":
            # complex record: ( A(...) B(...) ... )
            p.next()
            parts = []
            while True:
                k2, v2 = p.peek()
                if v2 == ")" or k2 is None:
                    break
                if k2 == "name":
                    p.next()
                    pname = v2.upper()
                    k3, v3 = p.peek()
                    pargs = p.parse_args() if v3 == "(" else []
                    parts.append((pname, pargs))
                else:
                    p.next()
            entities[eid] = Entity(eid, "", [], complex=parts)
    return entities


# --------------------------------------------------------------------------
# geometry resolution
# --------------------------------------------------------------------------


class StepModel:
    def __init__(self, entities: Dict[int, Entity]):
        self.e = entities
        self._curve_cache: Dict[int, tz.ParamCurve] = {}
        self._surf_cache: Dict[int, tz.ParamSurface] = {}

    def get(self, ref) -> Optional[Entity]:
        return self.e.get(int(ref))

    def _complex_part(self, ent: Entity, name: str) -> Optional[list]:
        if ent.complex:
            for pname, pargs in ent.complex:
                if pname == name:
                    return pargs
        return None

    # ---- points / directions / placements ----

    def point(self, ref) -> np.ndarray:
        ent = self.get(ref)
        coords = ent.args[1]
        return np.asarray([float(c) for c in coords], np.float64)

    def direction(self, ref) -> np.ndarray:
        ent = self.get(ref)
        return np.asarray([float(c) for c in ent.args[1]], np.float64)

    def frame(self, ref) -> tz.Frame:
        ent = self.get(ref)   # AXIS2_PLACEMENT_3D(name, location, axis, ref_dir)
        origin = self.point(ent.args[1])
        z = (self.direction(ent.args[2]) if ent.args[2] is not None
             else np.array([0.0, 0, 1]))
        x = (self.direction(ent.args[3]) if len(ent.args) > 3
             and ent.args[3] is not None else None)
        if x is None:
            x = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0.0, 1, 0])
        return tz.Frame(origin, z, x)

    def axis1(self, ref) -> Tuple[np.ndarray, np.ndarray]:
        ent = self.get(ref)   # AXIS1_PLACEMENT(name, location, axis)
        origin = self.point(ent.args[1])
        z = (self.direction(ent.args[2]) if ent.args[2] is not None
             else np.array([0.0, 0, 1]))
        return origin, z

    # ---- curves ----

    def curve(self, ref) -> Optional[tz.ParamCurve]:
        key = int(ref)
        if key in self._curve_cache:
            return self._curve_cache[key]
        c = self._curve_uncached(ref)
        if c is not None:
            self._curve_cache[key] = c
        return c

    def _curve_uncached(self, ref) -> Optional[tz.ParamCurve]:
        ent = self.get(ref)
        if ent is None:
            return None
        t = ent.type
        if t == "LINE":
            origin = self.point(ent.args[1])
            vec = self.get(ent.args[2])       # VECTOR(name, direction, mag)
            d = self.direction(vec.args[1]) * float(vec.args[2])
            return tz.LineCurve(origin, d)
        if t == "CIRCLE":
            return tz.CircleCurve(self._placement_frame(ent.args[1]),
                                  float(ent.args[2]))
        if t == "ELLIPSE":
            return tz.EllipseCurve(self._placement_frame(ent.args[1]),
                                   float(ent.args[2]), float(ent.args[3]))
        if t == "POLYLINE":
            pts = np.stack([self.point(r) for r in ent.args[1]])
            return tz.PolylineCurve(pts)
        if t in ("B_SPLINE_CURVE_WITH_KNOTS", "RATIONAL_B_SPLINE_CURVE"):
            return self._bspline_curve(ent)
        if ent.complex is not None:
            if self._complex_part(ent, "B_SPLINE_CURVE") is not None:
                return self._bspline_curve_complex(ent)
        if t in ("SURFACE_CURVE", "SEAM_CURVE", "INTERSECTION_CURVE"):
            # (name, curve_3d, associated_geometry, master_representation)
            return self.curve(ent.args[1])
        if t == "TRIMMED_CURVE":
            base = self.curve(ent.args[1])
            return base
        return None

    def _placement_frame(self, ref) -> tz.Frame:
        ent = self.get(ref)
        if ent.type == "AXIS2_PLACEMENT_3D":
            return self.frame(ref)
        raise ValueError(f"unsupported placement {ent.type}")

    def _bspline_curve(self, ent: Entity) -> tz.ParamCurve:
        # B_SPLINE_CURVE_WITH_KNOTS(name, degree, ctrl_pts, form, closed,
        #   self_intersect, multiplicities, knots, spec)
        degree = int(ent.args[1])
        ctrl = np.stack([self.point(r) for r in ent.args[2]])
        mults = [int(m) for m in ent.args[6]]
        knots = [float(k) for k in ent.args[7]]
        full = np.repeat(knots, mults)
        return tz.BSplineCurveAdapter(BSplineCurve(degree, full, ctrl))

    def _bspline_curve_complex(self, ent: Entity) -> tz.ParamCurve:
        base = self._complex_part(ent, "B_SPLINE_CURVE")
        knots_part = self._complex_part(ent, "B_SPLINE_CURVE_WITH_KNOTS")
        rat = self._complex_part(ent, "RATIONAL_B_SPLINE_CURVE")
        degree = int(base[0])
        ctrl = np.stack([self.point(r) for r in base[1]])
        mults = [int(m) for m in knots_part[0]]
        knots = [float(k) for k in knots_part[1]]
        full = np.repeat(knots, mults)
        weights = (np.asarray([float(w) for w in rat[0]])
                   if rat else None)
        return tz.BSplineCurveAdapter(
            BSplineCurve(degree, full, ctrl, weights))

    # ---- surfaces ----

    def surface(self, ref) -> Optional[tz.ParamSurface]:
        key = int(ref)
        if key in self._surf_cache:
            return self._surf_cache[key]
        s = self._surface_uncached(ref)
        if s is not None:
            self._surf_cache[key] = s
        return s

    def _surface_uncached(self, ref) -> Optional[tz.ParamSurface]:
        ent = self.get(ref)
        if ent is None:
            return None
        t = ent.type
        if t == "PLANE":
            return tz.PlaneSurface(self.frame(ent.args[1]))
        if t == "CYLINDRICAL_SURFACE":
            return tz.CylinderSurface(self.frame(ent.args[1]),
                                      float(ent.args[2]))
        if t == "CONICAL_SURFACE":
            return tz.ConeSurface(self.frame(ent.args[1]),
                                  float(ent.args[2]), float(ent.args[3]))
        if t == "SPHERICAL_SURFACE":
            return tz.SphereSurface(self.frame(ent.args[1]),
                                    float(ent.args[2]))
        if t in ("TOROIDAL_SURFACE", "DEGENERATE_TOROIDAL_SURFACE"):
            return tz.TorusSurface(self.frame(ent.args[1]),
                                   float(ent.args[2]), float(ent.args[3]))
        if t == "SURFACE_OF_LINEAR_EXTRUSION":
            curve = self.curve(ent.args[1])
            vec = self.get(ent.args[2])
            d = self.direction(vec.args[1]) * float(vec.args[2])
            return tz.ExtrusionSurface(curve, d) if curve else None
        if t == "SURFACE_OF_REVOLUTION":
            curve = self.curve(ent.args[1])
            origin, axis = self.axis1(ent.args[2])
            return (tz.RevolutionSurface(curve, origin, axis)
                    if curve else None)
        if t == "B_SPLINE_SURFACE_WITH_KNOTS":
            return self._bspline_surface(ent)
        if ent.complex is not None:
            if self._complex_part(ent, "B_SPLINE_SURFACE") is not None:
                return self._bspline_surface_complex(ent)
        if t in ("RECTANGULAR_TRIMMED_SURFACE", "CURVE_BOUNDED_SURFACE"):
            return self.surface(ent.args[1])
        if t == "OFFSET_SURFACE":
            return self.surface(ent.args[1])   # approximation: base surface
        return None

    def _ctrl_net(self, rows) -> np.ndarray:
        return np.stack([np.stack([self.point(r) for r in row])
                         for row in rows])

    def _bspline_surface(self, ent: Entity) -> tz.ParamSurface:
        # (name, deg_u, deg_v, ctrl, form, closed_u, closed_v, self_int,
        #  mults_u, mults_v, knots_u, knots_v, spec)
        du, dv = int(ent.args[1]), int(ent.args[2])
        ctrl = self._ctrl_net(ent.args[3])
        ku = np.repeat([float(k) for k in ent.args[10]],
                       [int(m) for m in ent.args[8]])
        kv = np.repeat([float(k) for k in ent.args[11]],
                       [int(m) for m in ent.args[9]])
        return tz.BSplineSurfaceAdapter(BSplineSurface(du, dv, ku, kv, ctrl))

    def _bspline_surface_complex(self, ent: Entity) -> tz.ParamSurface:
        base = self._complex_part(ent, "B_SPLINE_SURFACE")
        knots_part = self._complex_part(ent, "B_SPLINE_SURFACE_WITH_KNOTS")
        rat = self._complex_part(ent, "RATIONAL_B_SPLINE_SURFACE")
        du, dv = int(base[0]), int(base[1])
        ctrl = self._ctrl_net(base[2])
        ku = np.repeat([float(k) for k in knots_part[2]],
                       [int(m) for m in knots_part[0]])
        kv = np.repeat([float(k) for k in knots_part[3]],
                       [int(m) for m in knots_part[1]])
        weights = None
        if rat:
            weights = np.asarray([[float(w) for w in row] for row in rat[0]])
        return tz.BSplineSurfaceAdapter(
            BSplineSurface(du, dv, ku, kv, ctrl, weights))


# --------------------------------------------------------------------------
# topology → triangles
# --------------------------------------------------------------------------

def _edge_polyline(model: StepModel, edge_ref, same_sense: bool,
                   deflection: float) -> Optional[np.ndarray]:
    """Sample an ORIENTED_EDGE's EDGE_CURVE into a 3D polyline (start→end
    respecting orientation)."""
    oe = model.get(edge_ref)
    if oe.type == "ORIENTED_EDGE":
        # (name, start*, end*, edge_element, orientation)
        flip = (oe.args[4] == ".F.")
        ec = model.get(oe.args[3])
    else:
        flip = False
        ec = oe
    if ec is None or ec.type != "EDGE_CURVE":
        return None
    # EDGE_CURVE(name, start_vertex, end_vertex, curve, same_sense)
    v1 = model.point(model.get(ec.args[1]).args[1])
    v2 = model.point(model.get(ec.args[2]).args[1])
    curve_sense = (ec.args[4] != ".F.")
    curve = model.curve(ec.args[3])
    if curve is None:
        pts = np.stack([v1, v2])
    else:
        t1 = curve.param_of(v1)
        t2 = curve.param_of(v2)
        if curve.period is not None:
            # closed-curve edges: wrap so the walk follows curve direction
            if curve_sense:
                while t2 <= t1 + 1e-12:
                    t2 += curve.period
            else:
                while t1 <= t2 + 1e-12:
                    t1 += curve.period
            # full circle (vertex1 == vertex2)
            if abs(t2 - t1) < 1e-9 or np.allclose(v1, v2):
                t2 = t1 + (curve.period if curve_sense else -curve.period)
        ts = tz.sample_curve(curve, t1, t2, deflection, min_pts=8)
        pts = curve.eval(ts)
        pts[0], pts[-1] = v1, v2
    if flip:
        pts = pts[::-1]
    return pts


def _face_loops(model: StepModel, face: Entity,
                surface: tz.ParamSurface,
                deflection: float) -> List[tz.TrimLoop]:
    loops = []
    for bound_ref in face.args[1]:
        bnd = model.get(bound_ref)   # FACE_BOUND / FACE_OUTER_BOUND
        loop_ent = model.get(bnd.args[1])
        bound_sense = (bnd.args[2] != ".F.")
        if loop_ent.type == "EDGE_LOOP":
            segs = []
            for oe_ref in loop_ent.args[1]:
                pl = _edge_polyline(model, oe_ref, True, deflection)
                if pl is not None and len(pl) >= 2:
                    segs.append(pl)
            if not segs:
                continue
            # chain segments; edges are listed in loop order
            pts = [segs[0]]
            for s in segs[1:]:
                pts.append(s[1:] if np.allclose(s[0], pts[-1][-1], atol=1e-6)
                           else s)
            poly = np.vstack(pts)
            # drop duplicated closing point
            if len(poly) > 1 and np.allclose(poly[0], poly[-1], atol=1e-9):
                poly = poly[:-1]
        elif loop_ent.type == "VERTEX_LOOP":
            continue
        elif loop_ent.type == "POLY_LOOP":
            poly = np.stack([model.point(r) for r in loop_ent.args[1]])
        else:
            continue
        if not bound_sense:
            poly = poly[::-1]
        if len(poly) < 3:
            continue
        uv = surface.inverse(poly)
        loops.append(tz.TrimLoop(uv, poly))
    return loops


def _merge_parts(parts) -> Optional[TriangleMesh]:
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    v_off = 0
    V, N, U, T, ranges = [], [], [], [], []
    t_off = 0
    for (v, n, uvs, t) in parts:
        V.append(v)
        N.append(n)
        U.append(uvs)
        T.append(t + v_off)
        ranges.append((t_off, t_off + len(t)))
        v_off += len(v)
        t_off += len(t)
    # UVs are the raw surface parameters of each face; per-part [0,1]
    # normalization (DataNode::Parameterize parity) happens at texture
    # attach time via parameterize_mesh (geometry/parameterize.py).
    uv = np.vstack(U)
    mesh = TriangleMesh(np.vstack(V), np.vstack(T),
                        normals=np.vstack(N), uvs=uv.astype(np.float32))
    mesh.part_ranges = np.asarray(ranges, np.int32)
    mesh.raw_uvs = True  # raw surface parameters, see parameterize_mesh
    return mesh


def _faces_of_shell(model: StepModel, shell_ref) -> List[Entity]:
    shell = model.get(shell_ref)
    if shell is None:
        return []
    if shell.type in ("ORIENTED_CLOSED_SHELL", "ORIENTED_OPEN_SHELL"):
        # (name, shell_element: Ref, orientation) — wraps the real shell
        # (written by OCCT for BREP_WITH_VOIDS void shells). The element
        # ref is the first Ref argument whichever slot it lands in.
        for a in shell.args[1:]:
            if isinstance(a, Ref):
                return _faces_of_shell(model, a)
        return []
    if shell.type in ("CLOSED_SHELL", "OPEN_SHELL"):
        refs = shell.args[1]
        out = []
        for r in refs:
            f = model.get(r)
            if f is not None and f.type in ("ADVANCED_FACE", "FACE_SURFACE"):
                out.append(f)
        return out
    return []


def tessellate_step_face(model: StepModel, face: Entity, deflection: float):
    surf = model.surface(face.args[2])
    if surf is None:
        return None
    same_sense = (face.args[3] != ".F.")
    loops = _face_loops(model, face, surf, deflection)
    if not loops:
        return None
    try:
        return tz.tessellate_face(surf, loops, deflection,
                                  same_sense=same_sense)
    except Exception:
        return None


def load_step(path: str, deflection: float = 0.0,
              max_faces: int = 100000) -> List[TriangleMesh]:
    """Read a STEP file into one TriangleMesh per solid/shell.

    `deflection` <= 0 picks 0.4% of the model diagonal (OCCT-like
    default). Face ranges are recorded in `part_ranges` so `explode`
    splits a CAD shape into faces like the reference
    (DataNode::Explode, DataNode.cxx:479-564).
    """
    with open(path, "r", errors="replace") as f:
        text = f.read()
    entities = _parse_data_section(text)
    model = StepModel(entities)

    # collect shells per solid (MANIFOLD_SOLID_BREP / BREP_WITH_VOIDS /
    # SHELL_BASED_SURFACE_MODEL / standalone shells)
    groups: List[List[Entity]] = []
    used_faces = set()
    for ent in entities.values():
        if ent.type in ("MANIFOLD_SOLID_BREP", "BREP_WITH_VOIDS",
                        "FACETED_BREP"):
            faces = _faces_of_shell(model, ent.args[1])
            for extra in (ent.args[2] if ent.type == "BREP_WITH_VOIDS"
                          and len(ent.args) > 2 and ent.args[2] else []):
                faces += _faces_of_shell(model, extra)
            if faces:
                groups.append(faces)
                used_faces.update(f.id for f in faces)
        elif ent.type == "SHELL_BASED_SURFACE_MODEL":
            faces = []
            for sh in ent.args[1]:
                faces += _faces_of_shell(model, sh)
            if faces:
                groups.append(faces)
                used_faces.update(f.id for f in faces)
    # orphan shells / faces not claimed by a solid
    for ent in entities.values():
        if ent.type in ("CLOSED_SHELL", "OPEN_SHELL"):
            faces = [f for f in _faces_of_shell(model, Ref(ent.id))
                     if f.id not in used_faces]
            if faces:
                groups.append(faces)
                used_faces.update(f.id for f in faces)
    if not groups:
        faces = [e for e in entities.values()
                 if e.type in ("ADVANCED_FACE", "FACE_SURFACE")
                 and e.id not in used_faces]
        if faces:
            groups = [faces]

    if deflection <= 0:
        deflection = _auto_deflection(model, groups)

    meshes = []
    for faces in groups:
        parts = [tessellate_step_face(model, f, deflection)
                 for f in faces[:max_faces]]
        mesh = _merge_parts(parts)
        if mesh is not None:
            meshes.append(mesh)
    if not meshes:
        raise ValueError(
            f"{path}: no tessellatable B-rep found "
            f"({len(entities)} entities parsed). The native STEP reader "
            "covers AP203/AP214 analytic + NURBS B-rep and AP242 "
            "tessellated entities; for exotic entity mixes register a CAD "
            "tessellation backend via "
            "cadrays_tpu.geometry.cad.register_tessellator.")
    return meshes


def _auto_deflection(model: StepModel, groups) -> float:
    # STEP files routinely mix 3D points with 2D pcurve points
    # (DEFINITIONAL_REPRESENTATION geometry) — keep only the 3D ones.
    pts = []
    for e in model.e.values():
        if e.type == "CARTESIAN_POINT":
            p = model.point(Ref(e.id))
            if p.shape == (3,):
                pts.append(p)
            if len(pts) >= 20000:
                break
    if not pts:
        return 0.01
    arr = np.stack(pts)
    diag = float(np.linalg.norm(arr.max(0) - arr.min(0)))
    return max(diag * 0.004, 1e-6)

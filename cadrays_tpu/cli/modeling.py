"""DRAW modeling commands — the construction half of the command surface.

Mixin for `cli.commands.Console`. Together with the embedded Tcl
interpreter (cli/tcl.py) this runs the reference's five modeling demo
scripts unmodified: data/scripts/Bottle.tcl, Cpu.tcl, Cutter.tcl,
Drill.tcl, Shape.tcl. Geometry is built by cadrays_tpu.modeling (mesh-
backed, not a BRep port — see that package's docstring).

Numeric arguments are DRAW expressions (`thickness/12`, `2*pi`,
`sqrt(a*a+H*H)`) evaluated against `dset` variables — the reference's
Draw::Atof contract.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.modeling import curves as mcur
from cadrays_tpu.modeling import ops as mops
from cadrays_tpu.modeling import surfaces as msur
from cadrays_tpu.modeling.csg import (INTERSECT, SUBTRACT, UNION,
                                      face_boolean, face_cross_section,
                                      solid_boolean)
from cadrays_tpu.modeling.topo import (CompoundShape, CurveShape, EdgeShape,
                                       FaceShape, Shape, SolidShape,
                                       SurfaceShape, VertexShape, WireShape,
                                       chain_polylines, shape_mesh,
                                       to_triangle_mesh)

_NUM_NS = {k: getattr(math, k) for k in dir(math) if not k.startswith("_")}
_NUM_NS["pi"] = math.pi


class ModelingError(Exception):
    pass


def _err(msg):
    from cadrays_tpu.cli.commands import CommandError

    return CommandError(msg)


class ModelingMixin:
    """cmd_* handlers for the DRAW modeling kernel; mixed into Console."""

    # -- numeric expressions ------------------------------------------------
    def _num(self, tok: str) -> float:
        try:
            return float(tok)
        except ValueError:
            pass
        try:
            v = eval(tok, {"__builtins__": {}},
                     {**_NUM_NS, **self.session.vars})
            return float(v)
        except Exception:
            raise _err(f"bad numeric expression '{tok}'")

    def _nums(self, toks) -> List[float]:
        return [self._num(t) for t in toks]

    def cmd_dset(self, args):
        """dset var1 value1 [var2 value2 ...] (DRAW numeric variables)."""
        for i in range(0, len(args) - 1, 2):
            self.session.vars[args[i]] = self._num(args[i + 1])
        return ""

    def cmd_dval(self, args):
        return repr(self._num(args[0]))

    # -- registry helpers ---------------------------------------------------
    def _stage(self, name: str, obj) -> None:
        from cadrays_tpu.scene.model import NodeType

        self.session.staging[name] = (obj, NodeType.CAD_SHAPE)

    def _get(self, name: str):
        staged = self.session.staging.get(name)
        if staged is None:
            raise _err(f"no staged object '{name}'")
        return staged[0]

    def _get_opt(self, name: str):
        staged = self.session.staging.get(name)
        return None if staged is None else staged[0]

    def _shape(self, name: str) -> Shape:
        """Staged object as a modeling shape (legacy meshes wrapped)."""
        obj = self._get(name)
        if isinstance(obj, Shape):
            return obj
        # legacy TriangleMesh from the primitive commands
        return SolidShape(np.asarray(obj.vertices, np.float64),
                          obj.indices)

    def _solid_like(self, name: str) -> Shape:
        s = self._shape(name)
        if isinstance(s, (SolidShape, CompoundShape, FaceShape)):
            return s
        raise _err(f"'{name}' is a {s.kind}, need a solid/face")

    def _curve(self, name: str) -> mcur.Curve:
        obj = self._get(name)
        if isinstance(obj, CurveShape):
            return obj.curve
        if isinstance(obj, EdgeShape):
            return obj.curve
        raise _err(f"'{name}' is not a curve")

    def _point(self, name: str) -> np.ndarray:
        obj = self._get(name)
        if isinstance(obj, VertexShape):
            return obj.world_point
        raise _err(f"'{name}' is not a point/vertex")

    def _surface(self, name: str):
        obj = self._get(name)
        if isinstance(obj, SurfaceShape):
            return obj.surface
        raise _err(f"'{name}' is not a surface")

    def _plane_of(self, name: str) -> msur.Plane:
        s = self._surface(name)
        if not isinstance(s, msur.Plane):
            raise _err(f"'{name}' is not a plane")
        return s

    def _as_wire(self, name: str) -> WireShape:
        """Promote curve/edge -> wire (DRAW commands accept any)."""
        obj = self._get(name)
        if isinstance(obj, WireShape):
            return obj
        if isinstance(obj, EdgeShape):
            w = WireShape([obj])
            w.loc = obj.loc.copy()
            obj2 = obj.copy()
            obj2.loc = np.eye(4)
            w.edges = [obj2]
            w.loc = obj.loc.copy()
            return w
        if isinstance(obj, CurveShape):
            c = obj.curve
            if c.dim == 2:
                raise _err(f"2D curve '{name}' needs a plane (to3d/mkface)")
            w = WireShape([EdgeShape(c)])
            w.loc = obj.loc.copy()
            return w
        raise _err(f"'{name}' is not wire-like")

    # =======================================================================
    # points / curves
    # =======================================================================
    def cmd_vertex(self, args):
        name = args[0]
        self._stage(name, VertexShape(self._nums(args[1:4])))
        return ""

    def cmd_point(self, args):
        name = args[0]
        vals = self._nums(args[1:])
        self._stage(name, VertexShape(vals if len(vals) >= 3
                                      else [vals[0], vals[1], 0.0]))
        return ""

    def cmd_line(self, args):
        """line name x y [z] dx dy [dz] — 2D with 4 numbers, 3D with 6."""
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 4:
            c = mcur.Line(v[0:2], v[2:4])
        elif len(v) >= 6:
            c = mcur.Line(v[0:3], v[3:6])
        else:
            raise _err("line: need 4 (2D) or 6 (3D) numbers")
        self._stage(name, CurveShape(c))
        return ""

    def cmd_circle(self, args):
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 3:  # 2D: x y r
            c = mcur.Circle(v[0:2], v[2])
        elif len(v) == 4:  # 3D: x y z r (normal = +Z)
            c = mcur.Circle(v[0:3], v[3])
        elif len(v) == 7:  # center + normal + r
            c = mcur.Circle(v[0:3], v[6], normal=v[3:6])
        elif len(v) == 10:  # center + normal + xdir + r
            c = mcur.Circle(v[0:3], v[9], normal=v[3:6], xdir=v[6:9])
        else:
            raise _err(f"circle: unsupported arg count {len(v)}")
        self._stage(name, CurveShape(c))
        return ""

    def cmd_ellipse(self, args):
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 4:  # 2D: x y major minor
            c = mcur.Ellipse(v[0:2], v[2], v[3])
        elif len(v) == 5:  # 3D: x y z major minor
            c = mcur.Ellipse(v[0:3], v[3], v[4])
        elif len(v) == 6:  # 2D: x y dx dy major minor
            c = mcur.Ellipse(v[0:2], v[4], v[5], xdir=v[2:4])
        elif len(v) == 9:  # 3D: center + normal + major minor
            c = mcur.Ellipse(v[0:3], v[7], v[8], normal=v[3:6])
        else:
            raise _err(f"ellipse: unsupported arg count {len(v)}")
        self._stage(name, CurveShape(c))
        return ""

    def cmd_beziercurve(self, args):
        """beziercurve name npoles x1 y1 z1 [w1] ... (rational when each
        pole carries a weight — Shape.tcl:59)."""
        name = args[0]
        n = int(self._num(args[1]))
        rest = self._nums(args[2:])
        if len(rest) == 4 * n:
            poles = np.asarray(rest, np.float64).reshape(n, 4)
            c = mcur.Bezier(poles[:, 0:3], poles[:, 3])
        elif len(rest) == 3 * n:
            c = mcur.Bezier(np.asarray(rest).reshape(n, 3))
        elif len(rest) == 2 * n:
            c = mcur.Bezier(np.asarray(rest).reshape(n, 2))
        else:
            raise _err("beziercurve: pole count mismatch")
        self._stage(name, CurveShape(c))
        return ""

    def cmd_polyline(self, args):
        name = args[0]
        v = self._nums(args[1:])
        pts = np.asarray(v, np.float64).reshape(-1, 3)
        self._stage(name, CurveShape(mcur.Polyline(pts)))
        return ""

    def cmd_gcarc(self, args):
        """gcarc name cir|seg p1 p2 p3 — arc through three points
        (Bottle.tcl:19)."""
        name = args[0]
        pts = [self._point(a) for a in args[2:5]]
        if args[1] == "seg":
            c = mcur.Polyline(np.stack(pts))
        else:
            c = mcur.arc_through_3_points(*pts)
        self._stage(name, CurveShape(c))
        return ""

    def cmd_trim(self, args):
        """trim result curve u1 u2."""
        name, src = args[0], args[1]
        u1, u2 = self._num(args[2]), self._num(args[3])
        c = self._curve(src)
        self._stage(name, CurveShape(mcur.TrimmedCurve(c, u1, u2)))
        return ""

    def cmd_reverse(self, args):
        for n in args:
            obj = self._get(n)
            if isinstance(obj, CurveShape):
                self._stage(n, CurveShape(obj.curve.reversed()))
            elif isinstance(obj, EdgeShape):
                e = EdgeShape(obj.curve.reversed())
                e.loc = obj.loc.copy()
                self._stage(n, e)
            else:
                raise _err(f"reverse: '{n}' is not a curve")
        return ""

    def cmd_cvalue(self, args):
        """cvalue curve u xvar yvar zvar — evaluate, store DRAW vars."""
        c = self._curve(args[0])
        u = self._num(args[1])
        p = np.asarray(c.value(u), np.float64).ravel()
        for i, vn in enumerate(args[2:5]):
            self.session.vars[vn] = float(p[i]) if i < len(p) else 0.0
        return ""

    def cmd_2dcvalue(self, args):
        c = self._curve(args[0])
        u = self._num(args[1])
        p = np.asarray(c.value(u), np.float64).ravel()
        for i, vn in enumerate(args[2:4]):
            self.session.vars[vn] = float(p[i])
        return ""

    def cmd_parameters(self, args):
        """parameters curve x y [z] tol Uvar — closest-point parameter."""
        c = self._curve(args[0])
        rest = args[1:]
        uvar = rest[-1]
        tol = self._num(rest[-2])
        pt = self._nums(rest[:-2])
        self.session.vars[uvar] = float(c.project(np.asarray(pt), tol))
        return ""

    def cmd_mkcurve(self, args):
        """mkcurve name edge — edge geometry as a curve on [0, 1]."""
        name, src = args[0], args[1]
        obj = self._get(src)
        if isinstance(obj, EdgeShape):
            pts = obj.polyline()
        elif isinstance(obj, WireShape):
            pts = obj.chains()[0][0]
        elif isinstance(obj, CurveShape):
            self._stage(name, obj.copy())
            return ""
        else:
            raise _err(f"mkcurve: '{src}' has no curve")
        c = mcur.Polyline(pts)
        # normalize parameter range to [0, 1] (Drill.tcl:52-56 relies on
        # section curves being 0..1)
        c.cum = c.cum / max(c.cum[-1], 1e-15)
        c.t0, c.t1 = 0.0, 1.0
        self._stage(name, CurveShape(c))
        return ""

    def cmd_lintan(self, args):
        """lintan name c1 c2 — common tangent lines as name_1.. ."""
        name = args[0]
        c1 = self._curve(args[1])
        c2 = self._curve(args[2])
        if not (isinstance(c1, mcur.Circle) and isinstance(c2, mcur.Circle)):
            raise _err("lintan: need two 2D circles")
        lines = mcur.tangent_lines(c1, c2)
        for i, l in enumerate(lines):
            self._stage(f"{name}_{i + 1}", CurveShape(l))
        return f"{len(lines)} solutions"

    def cmd_to3d(self, args):
        """to3d result curve2d plane."""
        name, src = args[0], args[1]
        pl = self._plane_of(args[2]) if len(args) > 2 else msur.Plane()
        c = self._curve(src)
        if c.dim != 2:
            raise _err(f"to3d: '{src}' is not 2D")
        self._stage(name, CurveShape(msur.PlanarCurve3d(c, pl)))
        return ""

    # =======================================================================
    # surfaces
    # =======================================================================
    def cmd_plane(self, args):
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 0:
            pl = msur.Plane()
        elif len(v) == 3:
            pl = msur.Plane(v[0:3])
        elif len(v) == 6:
            pl = msur.Plane(v[0:3], v[3:6])
        elif len(v) >= 9:
            pl = msur.Plane(v[0:3], v[3:6], v[6:9])
        else:
            raise _err("plane: bad arg count")
        self._stage(name, SurfaceShape(pl))
        return ""

    def cmd_cylinder(self, args):
        """cylinder name x y z dx dy dz [xx xy xz] r — infinite cylinder
        *surface* (Bottle threading, Cutter/Drill guides)."""
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 8:
            s = msur.Cylinder(v[0:3], v[3:6], v[7], xdir=None)
            # v[6] unused in this form? treat as radius-first ambiguity
            s = msur.Cylinder(v[0:3], v[3:6], v[-1])
        elif len(v) == 7:
            s = msur.Cylinder(v[0:3], v[3:6], v[6])
        elif len(v) == 10:
            s = msur.Cylinder(v[0:3], v[3:6], v[9], xdir=v[6:9])
        else:
            raise _err(f"cylinder: unsupported arg count {len(v)}")
        self._stage(name, SurfaceShape(s))
        return ""

    def cmd_cone(self, args):
        """cone name x y z dx dy dz semi-angle(deg) radius — surface."""
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 8:
            s = msur.Cone(v[0:3], v[3:6], math.radians(v[6]), v[7])
        else:
            raise _err("cone: need 8 numbers")
        self._stage(name, SurfaceShape(s))
        return ""

    # =======================================================================
    # topology: edges / wires / faces
    # =======================================================================
    def cmd_edge(self, args):
        """edge name v1 v2 — straight edge between vertices."""
        name = args[0]
        p1 = self._point(args[1])
        p2 = self._point(args[2])
        self._stage(name, EdgeShape(mcur.Polyline(np.stack([p1, p2]))))
        return ""

    def cmd_mkedge(self, args):
        """mkedge name curve [surface] [u1 u2 | v1 v2-vertices]."""
        name = args[0]
        c = self._curve(args[1])
        rest = args[2:]
        surface = None
        if rest and isinstance(self._get_opt(rest[0]), SurfaceShape):
            surface = self._surface(rest[0])
            rest = rest[1:]
        if c.dim == 2:
            if surface is None:
                raise _err("mkedge: 2D curve needs a surface")
            c3 = msur.CurveOnSurface(c, surface)
        else:
            c3 = c
        t0, t1 = c3.t0, c3.t1
        if len(rest) >= 2:
            o0 = self._get_opt(rest[0])
            if isinstance(o0, VertexShape):
                p1 = self._point(rest[0])
                p2 = self._point(rest[1])
                t0 = c3.project(p1)
                t1 = c3.project(p2)
            else:
                t0, t1 = self._num(rest[0]), self._num(rest[1])
        e = EdgeShape(c3, t0, t1)
        self._stage(name, e)
        return ""

    def cmd_wire(self, args):
        """wire name e1 [e2 ...] — also accepts wires/curves (merged)."""
        name = args[0]
        edges: List[EdgeShape] = []
        for a in args[1:]:
            obj = self._get(a)
            if isinstance(obj, WireShape):
                for e in obj.edges:
                    e2 = e.copy()
                    e2.loc = obj.loc @ e2.loc
                    edges.append(e2)
            elif isinstance(obj, EdgeShape):
                edges.append(obj.copy())
            elif isinstance(obj, CurveShape) and obj.curve.dim == 3:
                edges.append(EdgeShape(obj.curve))
            else:
                raise _err(f"wire: '{a}' is not an edge/wire")
        self._stage(name, WireShape(edges))
        return ""

    def cmd_mkedgecurve(self, args):
        return ""  # wires chain geometrically already

    def _wire_loops_2d(self, wire_name: str, plane: msur.Plane
                       ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Wire chains -> (closed 2D loops on plane, per-edge 2D pieces)."""
        w = self._as_wire(wire_name)
        chains = w.chains()
        loops = []
        for pts, closed in chains:
            uv = plane.to_2d(pts)
            loops.append(uv)
        edges2d = [plane.to_2d(p) for p in w.edge_polylines()]
        return loops, edges2d

    def cmd_mkplane(self, args):
        """mkplane name wire — planar face from a closed wire, plane
        fitted from the wire (Bottle.tcl:34)."""
        name, src = args[0], args[1]
        w = self._as_wire(src)
        chains = w.chains()
        if not chains:
            raise _err(f"mkplane: wire '{src}' is empty")
        allp = np.concatenate([c[0] for c in chains])
        centroid = allp.mean(axis=0)
        A = allp - centroid
        _, _, vt = np.linalg.svd(A, full_matrices=False)
        normal = vt[2]
        if abs(normal[2]) > 1e-9 and normal[2] < 0:
            normal = -normal
        pl = msur.Plane(centroid, normal, xdir=vt[0])
        loops = [pl.to_2d(c[0]) for c in chains]
        edges2d = [pl.to_2d(p) for p in w.edge_polylines()]
        self._stage(name, FaceShape(pl, loops, edges2d=edges2d))
        return ""

    def cmd_mkface(self, args):
        """mkface name surface wire...  |  mkface name plane u1 u2 v1 v2."""
        name = args[0]
        pl = self._plane_of(args[1])
        rest = args[2:]
        if len(rest) == 4 and all(self._get_opt(r) is None for r in rest):
            u1, u2, v1, v2 = self._nums(rest)
            loop = np.array([[u1, v1], [u2, v1], [u2, v2], [u1, v2]])
            self._stage(name, FaceShape(pl, [loop]))
            return ""
        loops: List[np.ndarray] = []
        edges2d: List[np.ndarray] = []
        for r in rest:
            obj = self._get(r)
            if isinstance(obj, CurveShape) and obj.curve.dim == 2:
                pts = obj.curve.sample()
                if np.linalg.norm(pts[0] - pts[-1]) < 1e-9:
                    pts = pts[:-1]
                loops.append(pts)
                edges2d.append(np.concatenate([pts, pts[:1]]))
                continue
            l2, e2 = self._wire_loops_2d(r, pl)
            loops += l2
            edges2d += e2
        self._stage(name, FaceShape(pl, loops, edges2d=edges2d or None))
        return ""

    def cmd_mkoffset(self, args):
        """mkoffset result face nb dist — offset wires result_1..result_nb
        (Cpu.tcl:21)."""
        name, src = args[0], args[1]
        nb = int(self._num(args[2]))
        dist = self._num(args[3])
        f = self._shape(src)
        if not isinstance(f, FaceShape):
            raise _err(f"mkoffset: '{src}' is not a face")
        for k in range(1, nb + 1):
            loops = mops.offset_face_loops(f, dist * k)
            edges = []
            for l in loops:
                p3 = f.plane.to_3d(np.concatenate([l, l[:1]]))
                edges.append(EdgeShape(mcur.Polyline(p3)))
            self._stage(f"{name}_{k}", WireShape(edges))
        return ""

    # =======================================================================
    # solid construction
    # =======================================================================
    def cmd_box(self, args):
        """box name [x y z] dx dy dz (modeling solid with face ids)."""
        name = args[0]
        v = self._nums(args[1:])
        if len(v) >= 6:
            o, d = v[0:3], v[3:6]
        else:
            o, d = [0.0, 0.0, 0.0], v[0:3]
        s = _box_solid(o, d)
        self._stage(name, s)
        return ""

    def cmd_pcylinder(self, args):
        """pcylinder name [plane] r h."""
        name = args[0]
        rest = args[1:]
        pl = None
        if rest and isinstance(self._get_opt(rest[0]), SurfaceShape):
            pl = self._plane_of(rest[0])
            rest = rest[1:]
        r, h = self._num(rest[0]), self._num(rest[1])
        s = mops.cylinder_solid(r, h, pl)
        # face order [lateral, top, bottom]: prism gives walls first
        # already (wall=0, top=1, bottom=2)
        self._stage(name, s)
        return ""

    def cmd_pcone(self, args):
        """pcone name [plane] r1 r2 h."""
        name = args[0]
        rest = args[1:]
        pl = None
        if rest and isinstance(self._get_opt(rest[0]), SurfaceShape):
            pl = self._plane_of(rest[0])
            rest = rest[1:]
        v = self._nums(rest)
        r1, r2, h = v[0], v[1], v[2]
        self._stage(name, mops.cone_solid(r1, r2, h, pl))
        return ""

    def cmd_wedge(self, args):
        """wedge name [Ox Oy Oz Zx Zy Zz Xx Xy Xz] dx dy dz ltx."""
        name = args[0]
        v = self._nums(args[1:])
        if len(v) == 4:
            frame = (np.zeros(3), np.array([0.0, 0, 1]),
                     np.array([1.0, 0, 0]))
            dx, dy, dz, ltx = v
        elif len(v) == 13:
            frame = (np.asarray(v[0:3]), np.asarray(v[3:6]),
                     np.asarray(v[6:9]))
            dx, dy, dz, ltx = v[9:13]
        else:
            raise _err("wedge: need 4 or 13 numbers")
        self._stage(name, _wedge_solid(frame, dx, dy, dz, ltx))
        return ""

    def cmd_prism(self, args):
        """prism result face dx dy dz [flags]."""
        name, src = args[0], args[1]
        d = np.asarray(self._nums(args[2:5]), np.float64)
        base = self._shape(src)
        self._stage(name, _prism_any(base, d))
        return ""

    def cmd_revol(self, args):
        """revol result face x y z dx dy dz angle."""
        name, src = args[0], args[1]
        v = self._nums(args[2:9])
        f = self._shape(src)
        if not isinstance(f, FaceShape):
            raise _err(f"revol: '{src}' is not a face")
        self._stage(name, mops.revol(f, v[0:3], v[3:6], v[6]))
        return ""

    def cmd_thrusections(self, args):
        """thrusections [-N] result issolid isruled wire1 wire2 ..."""
        i = 0
        if args[i].startswith("-"):
            i += 1
        name = args[i]
        issolid = bool(int(self._num(args[i + 1])))
        _isruled = bool(int(self._num(args[i + 2])))
        loops = []
        for wn in args[i + 3:]:
            w = self._as_wire(wn)
            chains = w.chains()
            if not chains:
                raise _err(f"thrusections: empty wire '{wn}'")
            loops.append(chains[0][0])
        self._stage(name, mops.loft(loops, solid=issolid))
        return ""

    # -- sweep pipeline -----------------------------------------------------
    def cmd_mksweep(self, args):
        w = self._as_wire(args[0])
        chains = w.chains()
        if not chains:
            raise _err("mksweep: empty spine")
        self.session.sweep = mops.SweepBuilder(chains[0][0])
        return ""

    def cmd_setsweep(self, args):
        sw = getattr(self.session, "sweep", None)
        if sw is None:
            raise _err("setsweep: no sweep in progress (mksweep first)")
        i = 0
        while i < len(args):
            if args[i] == "-G":  # guide wire [ACR-mode rotation flags]
                g = self._as_wire(args[i + 1])
                chains = g.chains()
                pts = np.concatenate([c[0] for c in chains])
                sw.set_guide(pts)
                i += 4 if len(args) >= i + 4 else len(args)
            elif args[i] in ("-FR", "-CF", "-DX", "-DT"):
                i += 1
            else:
                i += 1
        return ""

    def cmd_addsweep(self, args):
        sw = getattr(self.session, "sweep", None)
        if sw is None:
            raise _err("addsweep: no sweep in progress")
        obj = self._get(args[0])
        if isinstance(obj, CurveShape):
            pts = np.asarray(obj.curve.sample(), np.float64)
        else:
            w = self._as_wire(args[0])
            chains = w.chains()
            pts, closed = chains[0]
            if closed:
                # add_section contract: closed loops repeat their first
                # point; open polylines (Drill's lip) do not
                pts = np.concatenate([pts, pts[:1]])
        sw.add_section(pts)
        return ""

    def cmd_buildsweep(self, args):
        sw = getattr(self.session, "sweep", None)
        if sw is None:
            raise _err("buildsweep: no sweep in progress")
        name = args[0]
        solid = "-S" in args
        self._stage(name, sw.build(solid=solid))
        self.session.sweep = None
        return ""

    # =======================================================================
    # booleans
    # =======================================================================
    def _boolean(self, name: str, a_name: str, b_name: str, op: int):
        a = self._solid_like(a_name)
        b = self._solid_like(b_name)
        a_face = isinstance(a, FaceShape)
        b_face = isinstance(b, FaceShape)
        if a_face and b_face:
            self._stage(name, face_boolean(a, b, op))
        elif a_face != b_face:
            # mixed face x solid: intersect the solid with the face's
            # plane -> a planar region, then a 2D boolean (Cpu.tcl cuts
            # a box out of the dgtop face)
            face = a if a_face else b
            solid = b if a_face else a
            region = _planar_region(solid, face)
            fa, fb = (face, region) if a_face else (region, face)
            self._stage(name, face_boolean(fa, fb, op))
        else:
            self._stage(name, solid_boolean(a, b, op))
        return ""

    def cmd_bcut(self, args):
        """bcut result a b  (result = a - b)."""
        if len(args) == 2:  # `bop`-less 2-arg form: result a (cut by bop)
            raise _err("bcut: need result a b")
        return self._boolean(args[0], args[1], args[2], SUBTRACT)

    def cmd_bfuse(self, args):
        return self._boolean(args[0], args[1], args[2], UNION)

    def cmd_bcommon(self, args):
        return self._boolean(args[0], args[1], args[2], INTERSECT)

    def cmd_fuse(self, args):
        """Old-style fuse (single result shape; 2D union for faces)."""
        return self._boolean(args[0], args[1], args[2], UNION)

    def cmd_cut(self, args):
        return self._boolean(args[0], args[1], args[2], SUBTRACT)

    def cmd_common(self, args):
        return self._boolean(args[0], args[1], args[2], INTERSECT)

    def cmd_bop(self, args):
        """bop a b — stage operands for bopfuse/bopcut/... (Bottle.tcl)."""
        self.session.bop_operands = (args[0], args[1])
        return ""

    def _bop_result(self, args, op, swap=False):
        ops_ = getattr(self.session, "bop_operands", None)
        if ops_ is None:
            raise _err("no preceding bop")
        a, b = (ops_[1], ops_[0]) if swap else ops_
        return self._boolean(args[0], a, b, op)

    def cmd_bopfuse(self, args):
        return self._bop_result(args, UNION)

    def cmd_bopcut(self, args):
        return self._bop_result(args, SUBTRACT)

    def cmd_boptuc(self, args):
        return self._bop_result(args, SUBTRACT, swap=True)

    def cmd_bopcommon(self, args):
        return self._bop_result(args, INTERSECT)

    def cmd_bsection(self, args):
        """bsection result shape face — intersection edges (Drill.tcl:44)."""
        name, a_name, b_name = args[0], args[1], args[2]
        a = self._solid_like(a_name)
        b = self._shape(b_name)
        if not isinstance(b, FaceShape):
            raise _err("bsection: second operand must be a planar face")
        v, t, _ = shape_mesh(a)
        chains = face_cross_section(v, t, b)
        # orient each chain: endpoint closer to the global origin first
        edges = []
        for pts, closed in chains:
            if not closed and (np.linalg.norm(pts[-1][:2])
                               < np.linalg.norm(pts[0][:2])):
                pts = pts[::-1]
            edges.append(EdgeShape(mcur.Polyline(pts)))
        self._stage(name, CompoundShape(edges))
        return ""

    # =======================================================================
    # offsets / fillets / shell
    # =======================================================================
    def cmd_offsetshape(self, args):
        """offsetshape result shape offset [tol] [removed-faces...]
        (Bottle.tcl:52)."""
        name, src = args[0], args[1]
        off = self._num(args[2])
        rest = args[3:]
        removed = []
        for r in rest:
            obj = self._get_opt(r)
            if isinstance(obj, (SolidShape, FaceShape)):
                if isinstance(obj, FaceShape):
                    v, t = obj.mesh()
                    obj = SolidShape(v, t)
                removed.append(obj)
        src_shape = self._solid_like(src)
        if isinstance(src_shape, CompoundShape):
            v, t, f = shape_mesh(src_shape)
            src_shape = SolidShape(v, t, f)
        if isinstance(src_shape, FaceShape):
            raise _err("offsetshape: need a solid")
        self._stage(name, mops.offset_shape(src_shape, off, removed))
        return ""

    def cmd_blend(self, args):
        """blend result shape r1 edge1 [r2 edge2 ...] (Bottle.tcl:39)."""
        name, src = args[0], args[1]
        solid = self._solid_like(src)
        if isinstance(solid, (CompoundShape, FaceShape)):
            v, t, f = shape_mesh(solid)
            solid = SolidShape(v, t, f)
        blends = []
        i = 2
        while i + 1 < len(args) + 1 and i < len(args):
            r = self._num(args[i])
            if i + 1 >= len(args):
                break
            edge = self._get(args[i + 1])
            chain = getattr(edge, "mesh_chain", None)
            if chain is not None and chain[0] is solid:
                blends.append((chain[1], chain[2], r))
            else:
                # locate the nearest feature chain geometrically
                target = None
                if isinstance(edge, EdgeShape):
                    mid = edge.polyline()
                    mid = mid[len(mid) // 2]
                    best = np.inf
                    for fe in mops.extract_feature_edges(solid):
                        pts = solid.verts[fe["chain"]]
                        d = float(np.min(np.linalg.norm(pts - mid, axis=1)))
                        if d < best:
                            best = d
                            target = fe
                if target is None:
                    raise _err(f"blend: cannot locate edge '{args[i + 1]}'")
                blends.append((target["chain"], target["closed"], r))
            i += 2
        self._stage(name, mops.fillet_edges(solid, blends))
        return ""

    def cmd_chfi2d(self, args):
        """chfi2d result face [e1 e2 F radius]... (Cpu.tcl:33-41)."""
        name, src = args[0], args[1]
        f = self._shape(src)
        if not isinstance(f, FaceShape) or not f.edges2d:
            raise _err("chfi2d: need a face built from a wire")
        pairs = []
        i = 2
        while i + 3 < len(args) + 1 and i + 3 <= len(args):
            e1, e2, kind, r = args[i], args[i + 1], args[i + 2], args[i + 3]
            idx1 = _edge_index(e1)
            idx2 = _edge_index(e2)
            if kind.upper() != "F":
                pass  # chamfers treated as fillets (visual parity)
            pairs.append((idx1, idx2, self._num(r)))
            i += 4
        self._stage(name, mops.chfi2d_fillet(f, pairs))
        return ""

    # =======================================================================
    # text
    # =======================================================================
    def cmd_text2brep(self, args):
        """text2brep name text [-font F] [-height H] [-pos X Y Z]
        [-aspect bold] [-valign V] [-composite on|off]  (also the legacy
        positional x=/y=/z= form)."""
        name = args[0]
        text = args[1]
        font = None
        height = 16.0
        pos = [0.0, 0.0, 0.0]
        bold = False
        valign = "bottom"
        i = 2
        while i < len(args):
            a = args[i]
            if a == "-font":
                font = args[i + 1]
                i += 2
            elif a == "-height":
                height = self._num(args[i + 1])
                i += 2
            elif a == "-pos":
                pos = self._nums(args[i + 1:i + 4])
                i += 4
            elif a == "-aspect":
                bold = args[i + 1].lower() in ("bold", "bolditalic")
                i += 2
            elif a == "-valign":
                valign = args[i + 1]
                i += 2
            elif a == "-composite":
                i += 2
            elif a.startswith(("x=", "y=", "z=")):
                k = "xyz".index(a[0])
                pos[k] = self._num(a[2:])
                i += 1
            else:
                i += 1
        self._stage(name, mops.text_faces(text, height, font=font,
                                          bold=bold, pos=pos,
                                          valign=valign))
        return ""

    # =======================================================================
    # explode (modeling shapes)
    # =======================================================================
    def _explode_shape(self, name: str, shape: Shape,
                       type_char: Optional[str]) -> str:
        """DRAW explode on a modeling shape: stage name_1..name_N.

        Types: so(lids) sh(ells) f(aces) w(ires) e(dges) v(ertices);
        untyped -> direct sub-shapes (compound parts, else faces)."""
        parts: List[Shape] = []
        t = (type_char or "").lower()[:2]
        if t in ("e",) or t == "ed":
            parts = self._shape_edges(shape)
        elif t in ("f", "fa"):
            parts = self._shape_faces(shape)
        elif t in ("w", "wi"):
            parts = self._shape_wires(shape)
        elif t in ("v", "ve"):
            parts = self._shape_vertices(shape)
        elif t in ("so", "sh"):
            parts = self._shape_solids(shape)
        else:  # untyped
            if isinstance(shape, CompoundShape):
                parts = [p.copy() for p in shape.parts]
                for p in parts:
                    p.loc = shape.loc @ p.loc
            elif isinstance(shape, SolidShape):
                parts = self._shape_faces(shape)
            elif isinstance(shape, WireShape):
                parts = self._shape_edges(shape)
            elif isinstance(shape, FaceShape):
                parts = self._shape_wires(shape)
            else:
                parts = [shape.copy()]
        for i, p in enumerate(parts):
            self._stage(f"{name}_{i + 1}", p)
        return " ".join(f"{name}_{i + 1}" for i in range(len(parts)))

    def _flatten_solids(self, shape: Shape) -> List[SolidShape]:
        if isinstance(shape, SolidShape):
            return [shape]
        if isinstance(shape, CompoundShape):
            out = []
            for p in shape.parts:
                for s in self._flatten_solids(p):
                    s2 = s.copy()
                    s2.loc = shape.loc @ s2.loc
                    out.append(s2)
            return out
        return []

    def _shape_solids(self, shape: Shape) -> List[Shape]:
        solids = self._flatten_solids(shape)
        out: List[Shape] = []
        for s in solids:
            # split into connected components (post-boolean compounds)
            comps = _connected_components(s)
            out += comps
        return out or [shape.copy()]

    def _shape_faces(self, shape: Shape) -> List[Shape]:
        out: List[Shape] = []
        if isinstance(shape, FaceShape):
            return [shape.copy()]
        if isinstance(shape, CompoundShape):
            for p in shape.parts:
                for f in self._shape_faces(p):
                    f.loc = shape.loc @ f.loc
                    out.append(f)
            return out
        if isinstance(shape, SolidShape):
            for fi in range(shape.n_faces()):
                sel = shape.face_id == fi
                if not np.any(sel):
                    continue
                # compact to the face's own vertices: keeping the whole
                # solid's vertex table made every face part span the
                # solid's bbox, which broke vfit/vfront camera framing
                # after `explode b FACE` + `vlocation` (the CornellBox.tcl
                # pixel golden caught it)
                tris = shape.tris[sel]
                used = np.unique(tris)
                remap = np.full(shape.verts.shape[0], -1, np.int64)
                remap[used] = np.arange(used.size)
                sub = SolidShape(shape.verts[used], remap[tris])
                sub.loc = shape.loc.copy()
                out.append(sub)
            return out
        return out

    def _shape_edges(self, shape: Shape) -> List[Shape]:
        out: List[Shape] = []
        if isinstance(shape, EdgeShape):
            return [shape.copy()]
        if isinstance(shape, WireShape):
            for e in shape.edges:
                e2 = e.copy()
                e2.loc = shape.loc @ e2.loc
                out.append(e2)
            return out
        if isinstance(shape, FaceShape):
            segs = shape.edges2d or [np.concatenate([l, l[:1]])
                                     for l in shape.loops]
            for i, s2 in enumerate(segs):
                p3 = shape.plane.to_3d(np.asarray(s2, np.float64))
                e = EdgeShape(mcur.Polyline(p3))
                e.loc = shape.loc.copy()
                e.edge2d_index = i + 1
                out.append(e)
            return out
        if isinstance(shape, CompoundShape):
            for p in shape.parts:
                for e in self._shape_edges(p):
                    e.loc = shape.loc @ e.loc
                    out.append(e)
            return out
        if isinstance(shape, SolidShape):
            if shape.feature_edges is not None:
                ordered = [e.copy() for e in shape.feature_edges]
                for e in ordered:
                    e.loc = shape.loc @ e.loc
                return ordered
            for fe in mops.extract_feature_edges(shape):
                pts = shape.verts[fe["chain"]]
                if fe["closed"]:
                    pts = np.concatenate([pts, pts[:1]])
                e = EdgeShape(mcur.Polyline(pts))
                e.loc = shape.loc.copy()
                e.mesh_chain = (shape, fe["chain"], fe["closed"])
                out.append(e)
            return out
        return out

    def _shape_wires(self, shape: Shape) -> List[Shape]:
        if isinstance(shape, FaceShape):
            out = []
            for l in shape.loops:
                p3 = shape.plane.to_3d(np.concatenate([l, l[:1]]))
                w = WireShape([EdgeShape(mcur.Polyline(p3))])
                w.loc = shape.loc.copy()
                out.append(w)
            return out
        if isinstance(shape, WireShape):
            return [shape.copy()]
        if isinstance(shape, CompoundShape):
            out = []
            for p in shape.parts:
                for w in self._shape_wires(p):
                    w.loc = shape.loc @ w.loc
                    out.append(w)
            return out
        return []

    def _shape_vertices(self, shape: Shape) -> List[Shape]:
        out = []
        if isinstance(shape, WireShape):
            for e in shape.edges:
                pl = e.polyline()
                for p in (pl[0], pl[-1]):
                    out.append(VertexShape(shape._xp(p[None])[0]))
        return out

    # =======================================================================
    # inspection / misc
    # =======================================================================
    def cmd_checkshape(self, args):
        name = args[-1]
        self._shape(name)
        return "This shape seems to be valid"

    def cmd_unifysamedom(self, args):
        """unifysamedom result shape — coplanar-face merge; the mesh
        representation needs no unification, so this aliases."""
        self._stage(args[0], self._shape(args[1]).copy())
        return ""

    def cmd_reset(self, args):
        """reset name... — clear the shape's location (Shape.tcl:31)."""
        for n in args:
            obj = self._get(n)
            if isinstance(obj, Shape):
                obj.reset_loc()
            else:
                raise _err(f"reset: '{n}' has a baked transform")
        return ""

    def cmd_boundings(self, args):
        obj = self._shape(args[0])
        v, t, _ = shape_mesh(obj) if not isinstance(obj, (VertexShape,))\
            else (obj.world_point[None], np.zeros((0, 3), np.int32), None)
        lo = v.min(axis=0)
        hi = v.max(axis=0)
        return f"{lo[0]} {lo[1]} {lo[2]} {hi[0]} {hi[1]} {hi[2]}"


def _planar_region(solid: Shape, face: FaceShape) -> FaceShape:
    """The region of a solid on a face's *world* plane (mixed booleans)."""
    from cadrays_tpu.modeling.csg import cross_section

    face = face.baked()
    v, t, _ = shape_mesh(solid)
    chains = cross_section(v, t, face.plane)
    loops = [face.plane.to_2d(pts) for pts, closed in chains
             if closed and len(pts) >= 3]
    if not loops:
        raise _err("mixed boolean: solid does not meet the face's plane")
    return FaceShape(face.plane, loops)


def _edge_index(name: str) -> int:
    """f_3 -> 3 (explode edge naming)."""
    try:
        return int(name.rsplit("_", 1)[1])
    except (IndexError, ValueError):
        raise _err(f"bad edge name '{name}'")


def _box_solid(origin, size) -> SolidShape:
    o = np.asarray(origin, np.float64)
    d = np.asarray(size, np.float64)
    # allow negative extents (DRAW normalizes)
    lo = np.minimum(o, o + d)
    hi = np.maximum(o, o + d)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array([
        [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
        [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]])
    # faces ordered like geometry/primitives.box: -x +x -y +y -z +z
    # (windings verified outward: signed volume positive)
    quads = [
        ([0, 4, 7, 3], 0), ([1, 2, 6, 5], 1),
        ([0, 1, 5, 4], 2), ([3, 7, 6, 2], 3),
        ([0, 3, 2, 1], 4), ([4, 5, 6, 7], 5)]
    tris = []
    fids = []
    for q, fi in quads:
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
        fids += [fi, fi]
    return SolidShape(v, np.asarray(tris, np.int32),
                      np.asarray(fids, np.int32))


def _wedge_solid(frame, dx, dy, dz, ltx) -> SolidShape:
    o, zdir, xdir = frame
    zdir = np.asarray(zdir, np.float64)
    zdir = zdir / np.linalg.norm(zdir)
    xdir = np.asarray(xdir, np.float64)
    xdir = xdir - zdir * (xdir @ zdir)
    xdir = xdir / np.linalg.norm(xdir)
    ydir = np.cross(zdir, xdir)
    # local: bottom rect y=0 spans x[0,dx] z[0,dz]; top y=dy spans
    # x[0,ltx] (OCCT BRepPrim_Wedge ltx semantics)
    lt = max(ltx, 1e-9)
    local = np.array([
        [0, 0, 0], [dx, 0, 0], [dx, 0, dz], [0, 0, dz],
        [0, dy, 0], [lt, dy, 0], [lt, dy, dz], [0, dy, dz]],
        np.float64)
    v = o + local @ np.stack([xdir, ydir, zdir])
    quads = [[0, 3, 2, 1], [4, 5, 6, 7], [0, 1, 5, 4],
             [2, 3, 7, 6], [1, 2, 6, 5], [0, 4, 7, 3]]
    tris = []
    fids = []
    for fi, q in enumerate(quads):
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
        fids += [fi, fi]
    t = np.asarray(tris, np.int32)
    from cadrays_tpu.modeling.ops import _fix_orientation

    t = _fix_orientation(v, t)
    return SolidShape(v, t, np.asarray(fids, np.int32))


def _prism_any(base: Shape, d: np.ndarray) -> Shape:
    if isinstance(base, FaceShape):
        return mops.prism(base, d)
    if isinstance(base, CompoundShape):
        return CompoundShape([_prism_any(p, d) for p in base.parts])
    raise _err(f"prism: need a face, got {base.kind}")


def _connected_components(s: SolidShape) -> List[SolidShape]:
    """Split a solid mesh into connected components (explode so),
    keeping per-triangle face ids (Cpu.tcl explodes faces afterwards)."""
    from cadrays_tpu.modeling.csg import _weld_with_faces

    v, t, f = _weld_with_faces(s.verts, s.tris, s.face_id)
    if len(t) == 0:
        return [s.copy()]
    parent = np.arange(len(v))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for tri in t:
        a = find(tri[0])
        for k in (1, 2):
            b = find(tri[k])
            parent[b] = a
    roots = np.array([find(i) for i in t[:, 0]])
    out = []
    for r in np.unique(roots):
        sel = roots == r
        _, fidx = np.unique(f[sel], return_inverse=True)
        sub = SolidShape(v, t[sel], fidx.astype(np.int32))
        sub.loc = s.loc.copy()
        out.append(sub)
    return out

"""Native IGES (5.x) reader + tessellator.

The reference imports IGES through OCCT's `testreadiges` DRAW command
(ImportSettingsEditor.cxx:344-370) and only ever consumes the tessellated
triangles. This module is the framework's own IGES path, mirroring the
STEP pipeline (`geometry/step.py`): parse the fixed-column sections,
resolve geometry into the generic `tessellate.py` ParamSurface/ParamCurve
framework, and triangulate each trimmed face.

Supported entities:
  curves:   100 circular arc, 102 composite, 106 copious data /
            11-13 piecewise linear, 110 line, 112 parametric spline,
            126 rational B-spline
  surfaces: 108 plane, 114 (via 128 conversion not needed), 118 ruled,
            120 surface of revolution, 122 tabulated cylinder,
            128 rational B-spline, 140 offset (base approximation),
            190/192/194/196/198 analytic B-rep surfaces
  topology: 141/143 bounded surface, 142 curve-on-surface, 144 trimmed
            surface, 186 manifold solid B-rep (with 502 vertex / 504
            edge / 508 loop / 510 face / 514 shell), 124 transforms,
            116 point, 123 direction, 308/408 subfigures
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry import tessellate as tz
from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.geometry.nurbs import BSplineCurve, BSplineSurface
from cadrays_tpu.geometry.step import _merge_parts

# --------------------------------------------------------------------------
# fixed-column section parsing
# --------------------------------------------------------------------------


@dataclass
class DirEntry:
    de: int            # directory entry pointer (odd sequence number)
    type: int
    pd: int            # parameter data line pointer (unused after grouping)
    matrix: int        # DE of a 124 transformation (0 = none)
    form: int
    status: str        # 8-char status field
    params: list       # parsed parameter-data values

    @property
    def subordinate(self) -> int:
        """Status digits 3-4: 00 independent, 01 physically dependent..."""
        try:
            return int(self.status[2:4])
        except ValueError:
            return 0


def _parse_free_params(text: str, pdelim: str, rdelim: str) -> list:
    """Split parameter-data text into numbers / pointer ints / strings."""
    out: list = []
    i, n = 0, len(text)
    buf = []
    while i < n:
        c = text[i]
        # Hollerith string: <len>H<chars>
        if c == "H" and buf and "".join(buf).strip().isdigit():
            slen = int("".join(buf).strip())
            out.append(text[i + 1:i + 1 + slen])
            i += 1 + slen
            buf = []
            # skip to next delimiter
            while i < n and text[i] not in (pdelim, rdelim):
                i += 1
            i += 1
            continue
        if c == pdelim or c == rdelim:
            tok = "".join(buf).strip()
            out.append(_num(tok))
            buf = []
            if c == rdelim:
                break
            i += 1
            continue
        buf.append(c)
        i += 1
    else:
        tok = "".join(buf).strip()
        if tok:
            out.append(_num(tok))
    return out


def _num(tok: str):
    if not tok:
        return 0.0
    t = tok.replace("D", "E").replace("d", "e")
    try:
        if any(ch in t for ch in ".eE"):
            return float(t)
        return int(t)
    except ValueError:
        return tok


def parse_iges(text: str) -> Dict[int, DirEntry]:
    """Parse S/G/D/P sections into a DE-keyed entity map."""
    glob_lines: List[str] = []
    d_lines: List[str] = []
    p_lines: List[Tuple[int, str]] = []  # (owner DE, data cols 1-64)
    for raw in text.splitlines():
        line = raw.rstrip("\n\r")
        if len(line) < 73:
            line = line.ljust(80)
        sec = line[72]
        if sec == "G":
            glob_lines.append(line[:72])
        elif sec == "D":
            d_lines.append(line[:72])
        elif sec == "P":
            owner = line[64:72].strip()
            p_lines.append((int(owner) if owner else 0, line[:64]))

    # global section: parameter + record delimiters (Hollerith, defaults , ;)
    g = "".join(glob_lines)
    pdelim, rdelim = ",", ";"
    try:
        vals = _parse_free_params(g, ",", ";")
        # field 1 = param delimiter, field 2 = record delimiter, but the
        # global section itself is delimited by them — handle the common
        # encodings: leading "1H<c>" pairs.
        if g.startswith("1H"):
            pdelim = g[2]
            rest = g[4:]
            if rest.startswith("1H"):
                rdelim = rest[2]
        del vals
    except Exception:
        pass

    # parameter data grouped by owner DE
    pd_text: Dict[int, str] = {}
    for owner, data in p_lines:
        pd_text[owner] = pd_text.get(owner, "") + data

    entities: Dict[int, DirEntry] = {}

    def _int_at(line: str, fld: int) -> int:
        s = line[8 * (fld - 1):8 * fld].strip()
        if not s:
            return 0
        try:
            return int(s)
        except ValueError:
            return 0

    for k in range(0, len(d_lines) - 1, 2):
        l1, l2 = d_lines[k], d_lines[k + 1]
        de = 2 * (k // 2) + 1
        etype = _int_at(l1, 1)
        pd_ptr = _int_at(l1, 2)
        matrix = _int_at(l1, 7)
        status = l1[64:72]
        form = _int_at(l2, 5)
        params = _parse_free_params(pd_text.get(de, ""), pdelim, rdelim)
        # first param repeats the entity type — drop it
        if params and isinstance(params[0], int) and params[0] == etype:
            params = params[1:]
        entities[de] = DirEntry(de, etype, pd_ptr, matrix, form,
                                status, params)
    return entities


# --------------------------------------------------------------------------
# transform-wrapping adapters
# --------------------------------------------------------------------------


class XformCurve(tz.ParamCurve):
    def __init__(self, base: tz.ParamCurve, R: np.ndarray, t: np.ndarray):
        self.base = base
        self.R = R
        self.t = t
        self.period = getattr(base, "period", None)
        if hasattr(base, "domain"):
            self.domain = base.domain

    def eval(self, s):
        return self.base.eval(s) @ self.R.T + self.t

    def param_of(self, p):
        return self.base.param_of(
            np.linalg.solve(self.R, np.asarray(p, np.float64) - self.t))


class XformSurface(tz.ParamSurface):
    def __init__(self, base: tz.ParamSurface, R: np.ndarray, t: np.ndarray):
        self.base = base
        self.R = R
        self.Rinv = np.linalg.inv(R)
        self.t = t
        self.period_u = base.period_u
        self.period_v = base.period_v
        if hasattr(base, "domain"):
            self.domain = base.domain

    def eval(self, uv):
        return self.base.eval(uv) @ self.R.T + self.t

    def inverse(self, pts):
        return self.base.inverse(
            (np.atleast_2d(pts) - self.t) @ self.Rinv.T)


class RuledSurface(tz._NumericInverse, tz.ParamSurface):
    """IGES 118: linear blend of two curves, u in [0,1] across each
    curve's domain, v in [0,1] between them."""

    def __init__(self, c1: tz.ParamCurve, c2: tz.ParamCurve,
                 flip2: bool = False):
        self.c1, self.c2, self.flip2 = c1, c2, flip2
        self.d1 = getattr(c1, "domain", (0.0, 1.0))
        self.d2 = getattr(c2, "domain", (0.0, 1.0))
        self.domain = ((0.0, 1.0), (0.0, 1.0))

    def eval(self, uv):
        uv = np.atleast_2d(uv)
        u, v = uv[:, 0], uv[:, 1:2]
        t1 = self.d1[0] + u * (self.d1[1] - self.d1[0])
        u2 = (1.0 - u) if self.flip2 else u
        t2 = self.d2[0] + u2 * (self.d2[1] - self.d2[0])
        return self.c1.eval(t1) * (1.0 - v) + self.c2.eval(t2) * v


# --------------------------------------------------------------------------
# model: geometry resolution
# --------------------------------------------------------------------------


class IgesModel:
    def __init__(self, entities: Dict[int, DirEntry]):
        self.e = entities
        self._curve_cache: Dict[int, Optional[tz.ParamCurve]] = {}
        self._surf_cache: Dict[int, Optional[tz.ParamSurface]] = {}
        self._tf_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def get(self, de) -> Optional[DirEntry]:
        return self.e.get(int(de))

    # ---- transforms ----

    def transform(self, de) -> Tuple[np.ndarray, np.ndarray]:
        """Composed (R, t) of a 124 chain; identity for de == 0."""
        de = int(de)
        if de == 0:
            return np.eye(3), np.zeros(3)
        if de in self._tf_cache:
            return self._tf_cache[de]
        ent = self.get(de)
        if ent is None or ent.type != 124 or len(ent.params) < 12:
            return np.eye(3), np.zeros(3)
        p = [float(x) for x in ent.params[:12]]
        R = np.array([[p[0], p[1], p[2]],
                      [p[4], p[5], p[6]],
                      [p[8], p[9], p[10]]], np.float64)
        t = np.array([p[3], p[7], p[11]], np.float64)
        if ent.matrix:
            R2, t2 = self.transform(ent.matrix)
            R, t = R2 @ R, R2 @ t + t2
        self._tf_cache[de] = (R, t)
        return R, t

    def _apply_tf(self, obj, de: int):
        ent = self.get(de)
        if ent is None or not ent.matrix:
            return obj
        R, t = self.transform(ent.matrix)
        if isinstance(obj, tz.ParamCurve):
            return XformCurve(obj, R, t)
        return XformSurface(obj, R, t)

    def point3(self, de) -> np.ndarray:
        """116 point or 123 direction -> xyz (transform applied)."""
        ent = self.get(de)
        p = np.array([float(ent.params[0]), float(ent.params[1]),
                      float(ent.params[2])], np.float64)
        if ent.matrix:
            R, t = self.transform(ent.matrix)
            if ent.type == 123:
                return R @ p
            return R @ p + t
        return p

    # ---- curves ----

    def curve(self, de) -> Optional[tz.ParamCurve]:
        key = int(de)
        if key in self._curve_cache:
            return self._curve_cache[key]
        self._curve_cache[key] = None  # cycle guard
        c = self._curve_uncached(key)
        self._curve_cache[key] = c
        return c

    def _curve_uncached(self, de: int) -> Optional[tz.ParamCurve]:
        ent = self.get(de)
        if ent is None:
            return None
        p = ent.params
        t = ent.type
        c: Optional[tz.ParamCurve] = None
        if t == 110:  # line: x1 y1 z1 x2 y2 z2
            a = np.array(p[0:3], np.float64)
            b = np.array(p[3:6], np.float64)
            c = tz.LineCurve(a, b - a)
            c.domain = (0.0, 1.0)
        elif t == 100:  # circular arc: zt xc yc x1 y1 x2 y2
            zt, xc, yc = float(p[0]), float(p[1]), float(p[2])
            x1, y1, x2, y2 = (float(v) for v in p[3:7])
            r = math.hypot(x1 - xc, y1 - yc)
            frame = tz.Frame(np.array([xc, yc, zt]),
                             np.array([0.0, 0, 1]), np.array([1.0, 0, 0]))
            c = tz.CircleCurve(frame, r)
            a0 = math.atan2(y1 - yc, x1 - xc)
            a1 = math.atan2(y2 - yc, x2 - xc)
            while a1 <= a0 + 1e-12:
                a1 += tz.TWO_PI
            # same start/end -> full circle
            if abs(x1 - x2) < 1e-12 and abs(y1 - y2) < 1e-12:
                a1 = a0 + tz.TWO_PI
            c.domain = (a0, a1)
        elif t == 104:  # conic arc (ellipse form): sample numerically
            c = self._conic_arc(p)
        elif t == 106 or t in ():  # copious data / linear path
            c = self._copious(ent)
        elif t == 112:
            c = self._param_spline_curve(p)
        elif t == 126:
            c = self._bspline_curve(p)
        elif t == 102:  # composite: sample children into one polyline
            n = int(p[0])
            pts = []
            for ref in p[1:1 + n]:
                sub = self.curve(ref)
                if sub is None:
                    continue
                d0, d1 = getattr(sub, "domain", (0.0, 1.0))
                ts = np.linspace(d0, d1, 48)
                xyz = sub.eval(ts)
                if pts and np.allclose(pts[-1][-1], xyz[0], atol=1e-9):
                    xyz = xyz[1:]
                elif pts and np.allclose(pts[-1][-1], xyz[-1], atol=1e-9):
                    xyz = xyz[::-1][1:]
                pts.append(xyz)
            if pts:
                c = tz.PolylineCurve(np.vstack(pts))
        if c is None:
            return None
        return self._apply_tf(c, de)

    def _conic_arc(self, p) -> Optional[tz.ParamCurve]:
        # A x^2 + B xy + C y^2 + D x + E y + F = 0 in z = ZT plane;
        # sampled between start and end points (ellipse arcs only).
        A, B, C, D, E, F = (float(v) for v in p[0:6])
        zt = float(p[6])
        x1, y1, x2, y2 = (float(v) for v in p[7:11])
        if abs(B) > 1e-12 or A <= 0 or C <= 0:
            return None
        # axis-aligned central conic: A x^2 + C y^2 + D x + E y + F = 0
        xc, yc = -D / (2 * A), -E / (2 * C)
        rhs = A * xc * xc + C * yc * yc - F
        if rhs <= 0:
            return None
        a, b = math.sqrt(rhs / A), math.sqrt(rhs / C)
        frame = tz.Frame(np.array([xc, yc, zt]),
                         np.array([0.0, 0, 1]), np.array([1.0, 0, 0]))
        c = tz.EllipseCurve(frame, a, b)
        a0 = math.atan2((y1 - yc) / b, (x1 - xc) / a)
        a1 = math.atan2((y2 - yc) / b, (x2 - xc) / a)
        while a1 <= a0 + 1e-12:
            a1 += tz.TWO_PI
        if abs(x1 - x2) < 1e-12 and abs(y1 - y2) < 1e-12:
            a1 = a0 + tz.TWO_PI
        c.domain = (a0, a1)
        return c

    def _copious(self, ent: DirEntry) -> Optional[tz.ParamCurve]:
        p = ent.params
        ip = int(p[0])
        n = int(p[1])
        if ip == 1:  # common-z pairs: zt, then x,y pairs
            zt = float(p[2])
            data = np.asarray([float(v) for v in p[3:3 + 2 * n]],
                              np.float64).reshape(n, 2)
            pts = np.concatenate([data, np.full((n, 1), zt)], axis=1)
        elif ip == 2:  # xyz triples
            pts = np.asarray([float(v) for v in p[2:2 + 3 * n]],
                             np.float64).reshape(n, 3)
        elif ip == 3:  # xyz + ijk sextuples
            pts = np.asarray([float(v) for v in p[2:2 + 6 * n]],
                             np.float64).reshape(n, 6)[:, :3]
        else:
            return None
        if len(pts) < 2:
            return None
        return tz.PolylineCurve(pts)

    def _param_spline_curve(self, p) -> Optional[tz.ParamCurve]:
        # 112: ctype, h, ndim, n, T[n+1], then per-segment 4x3 coeffs
        n = int(p[3])
        ts = [float(v) for v in p[4:4 + n + 1]]
        coeffs = [float(v) for v in p[4 + n + 1:4 + n + 1 + 12 * n]]
        if len(coeffs) < 12 * n:
            return None
        pts = []
        for seg in range(n):
            cx = coeffs[12 * seg:12 * seg + 4]
            cy = coeffs[12 * seg + 4:12 * seg + 8]
            cz = coeffs[12 * seg + 8:12 * seg + 12]
            s = np.linspace(0.0, ts[seg + 1] - ts[seg], 16,
                            endpoint=(seg == n - 1))
            x = cx[0] + s * (cx[1] + s * (cx[2] + s * cx[3]))
            y = cy[0] + s * (cy[1] + s * (cy[2] + s * cy[3]))
            z = cz[0] + s * (cz[1] + s * (cz[2] + s * cz[3]))
            pts.append(np.stack([x, y, z], axis=-1))
        return tz.PolylineCurve(np.vstack(pts))

    def _bspline_curve(self, p) -> Optional[tz.ParamCurve]:
        # 126: K, M, planar, closed, polynomial, periodic,
        #      knots[-M..K+1], weights[0..K], ctrl[0..K]*3, V0, V1, ...
        K, M = int(p[0]), int(p[1])
        nk = K + M + 2
        i = 6
        knots = np.asarray([float(v) for v in p[i:i + nk]], np.float64)
        i += nk
        w = np.asarray([float(v) for v in p[i:i + K + 1]], np.float64)
        i += K + 1
        ctrl = np.asarray([float(v) for v in p[i:i + 3 * (K + 1)]],
                          np.float64).reshape(K + 1, 3)
        i += 3 * (K + 1)
        v0, v1 = float(p[i]), float(p[i + 1])
        weights = None if np.allclose(w, 1.0) else w
        c = tz.BSplineCurveAdapter(BSplineCurve(M, knots, ctrl, weights))
        c.domain = (v0, v1)
        return c

    # ---- surfaces ----

    def surface(self, de) -> Optional[tz.ParamSurface]:
        key = int(de)
        if key in self._surf_cache:
            return self._surf_cache[key]
        self._surf_cache[key] = None
        s = self._surface_uncached(key)
        self._surf_cache[key] = s
        return s

    def _surface_uncached(self, de: int) -> Optional[tz.ParamSurface]:
        ent = self.get(de)
        if ent is None:
            return None
        p = ent.params
        t = ent.type
        s: Optional[tz.ParamSurface] = None
        if t == 108:  # plane A x + B y + C z = D
            n = np.array(p[0:3], np.float64)
            d = float(p[3])
            nn = n / max(np.linalg.norm(n), 1e-300)
            origin = nn * d / max(np.dot(n, nn), 1e-300)
            s = tz.PlaneSurface(_frame_from_axis(origin, nn))
        elif t == 118:
            c1 = self.curve(p[0])
            c2 = self.curve(p[1])
            if c1 is not None and c2 is not None:
                s = RuledSurface(c1, c2, flip2=bool(int(p[3]))
                                 if len(p) > 3 else False)
        elif t == 120:  # revolution: axis line DE, generatrix DE, SA, TA
            axis_ent = self.get(p[0])
            gen = self.curve(p[1])
            if axis_ent is not None and gen is not None:
                a = np.array(axis_ent.params[0:3], np.float64)
                b = np.array(axis_ent.params[3:6], np.float64)
                if axis_ent.matrix:
                    R, tt = self.transform(axis_ent.matrix)
                    a, b = R @ a + tt, R @ b + tt
                s = tz.RevolutionSurface(gen, a, b - a)
                sa = float(p[2]) if len(p) > 2 else 0.0
                ta = float(p[3]) if len(p) > 3 else tz.TWO_PI
                gd = getattr(gen, "domain", (0.0, 1.0))
                s.domain = ((sa, ta if ta > sa else sa + tz.TWO_PI), gd)
        elif t == 122:  # tabulated cylinder: directrix DE, terminate pt
            c = self.curve(p[0])
            if c is not None:
                lx = np.array(p[1:4], np.float64)
                d0 = getattr(c, "domain", (0.0, 1.0))
                start = c.eval(np.asarray([d0[0]]))[0]
                s = tz.ExtrusionSurface(c, lx - start)
                s.domain = (d0, (0.0, 1.0))
        elif t == 128:
            s = self._bspline_surface(p)
        elif t == 140:  # offset: approximate by base surface
            s = self.surface(p[2] if len(p) > 2 else p[0])
        elif t == 190:  # plane surface: location pt, normal dir[, refdir]
            o = self.point3(p[0])
            z = self.point3(p[1])
            s = tz.PlaneSurface(_frame_from_axis(o, z))
        elif t == 192:  # cylinder: location, axis, radius
            o, z = self.point3(p[0]), self.point3(p[1])
            s = tz.CylinderSurface(_frame_from_axis(o, z), float(p[2]))
        elif t == 194:  # cone: location, axis, radius, semi-angle (deg)
            o, z = self.point3(p[0]), self.point3(p[1])
            s = tz.ConeSurface(_frame_from_axis(o, z), float(p[2]),
                               math.radians(float(p[3])))
        elif t == 196:  # sphere: center, radius[, axis, refdir]
            o = self.point3(p[0])
            z = self.point3(p[2]) if len(p) > 2 and p[2] else \
                np.array([0.0, 0, 1])
            s = tz.SphereSurface(_frame_from_axis(o, z), float(p[1]))
        elif t == 198:  # torus: center, axis, major r, minor r
            o, z = self.point3(p[0]), self.point3(p[1])
            s = tz.TorusSurface(_frame_from_axis(o, z), float(p[2]),
                                float(p[3]))
        if s is None:
            return None
        return self._apply_tf(s, de)

    def _bspline_surface(self, p) -> Optional[tz.ParamSurface]:
        K1, K2, M1, M2 = (int(v) for v in p[0:4])
        i = 9
        nku, nkv = K1 + M1 + 2, K2 + M2 + 2
        ku = np.asarray([float(v) for v in p[i:i + nku]], np.float64)
        i += nku
        kv = np.asarray([float(v) for v in p[i:i + nkv]], np.float64)
        i += nkv
        nw = (K1 + 1) * (K2 + 1)
        w = np.asarray([float(v) for v in p[i:i + nw]], np.float64)
        i += nw
        ctrl = np.asarray([float(v) for v in p[i:i + 3 * nw]],
                          np.float64).reshape(nw, 3)
        i += 3 * nw
        u0, u1, v0, v1 = (float(v) for v in p[i:i + 4])
        # IGES lists control points with the FIRST index varying fastest:
        # data[j*(K1+1) + i] = P(i, j) -> reshape (nv, nu) then transpose.
        net = ctrl.reshape(K2 + 1, K1 + 1, 3).transpose(1, 0, 2)
        wnet = w.reshape(K2 + 1, K1 + 1).T
        weights = None if np.allclose(wnet, 1.0) else wnet
        s = tz.BSplineSurfaceAdapter(
            BSplineSurface(M1, M2, ku, kv, net, weights))
        s.domain = ((u0, u1), (v0, v1))
        return s


def _frame_from_axis(origin, z) -> tz.Frame:
    z = np.asarray(z, np.float64)
    x = (np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 * np.linalg.norm(z)
         else np.array([0.0, 1, 0]))
    return tz.Frame(np.asarray(origin, np.float64), z, x)


# --------------------------------------------------------------------------
# trimming topology -> faces
# --------------------------------------------------------------------------


def _natural_loop(surf: tz.ParamSurface) -> Optional[tz.TrimLoop]:
    """Rectangle loop over a surface's known parametric domain."""
    dom = getattr(surf, "domain", None)
    if dom is None:
        return None
    (u0, u1), (v0, v1) = dom
    nu = max(int(8), 2)
    us = np.linspace(u0, u1, nu)
    vs = np.linspace(v0, v1, nu)
    uv = np.concatenate([
        np.stack([us, np.full(nu, v0)], axis=1)[:-1],
        np.stack([np.full(nu, u1), vs], axis=1)[:-1],
        np.stack([us[::-1], np.full(nu, v1)], axis=1)[:-1],
        np.stack([np.full(nu, u0), vs[::-1]], axis=1)[:-1],
    ])
    return tz.TrimLoop(uv, surf.eval(uv))


def _loop_from_142(model: IgesModel, de, surf: tz.ParamSurface,
                   deflection: float) -> Optional[tz.TrimLoop]:
    """Curve-on-surface -> closed UV loop. Prefers the model-space curve
    (+ surface.inverse); falls back to the parameter-space curve."""
    ent = model.get(de)
    if ent is None:
        return None
    if ent.type == 102:  # bare composite used directly as a boundary
        return _loop_from_model_curve(model, de, surf, deflection)
    if ent.type != 142:
        return _loop_from_model_curve(model, de, surf, deflection)
    # 142 layout: CRTN, SPTR, BPTR (param-space), CPTR (model), PREF
    bptr = ent.params[2] if len(ent.params) > 2 else 0
    cptr = ent.params[3] if len(ent.params) > 3 else 0
    pref = int(ent.params[4]) if len(ent.params) > 4 else 0
    # preference 1 = parameter space; otherwise prefer model space
    if cptr and pref != 1:
        lp = _loop_from_model_curve(model, cptr, surf, deflection)
        if lp is not None:
            return lp
    if bptr:
        b = model.curve(bptr)
        if b is not None:
            d0, d1 = getattr(b, "domain", (0.0, 1.0))
            ts = tz.sample_curve(b, d0, d1, deflection * 0.1, min_pts=16)
            uvz = b.eval(ts)
            uv = uvz[:, :2]
            if np.allclose(uv[0], uv[-1], atol=1e-9):
                uv = uv[:-1]
            if len(uv) >= 3:
                return tz.TrimLoop(uv, surf.eval(uv))
    if cptr:
        return _loop_from_model_curve(model, cptr, surf, deflection)
    return None


def _loop_from_model_curve(model: IgesModel, de, surf: tz.ParamSurface,
                           deflection: float) -> Optional[tz.TrimLoop]:
    c = model.curve(de)
    if c is None:
        return None
    d0, d1 = getattr(c, "domain", (0.0, 1.0))
    ts = tz.sample_curve(c, d0, d1, deflection, min_pts=16)
    pts = c.eval(ts)
    if np.allclose(pts[0], pts[-1], atol=1e-9):
        pts = pts[:-1]
    if len(pts) < 3:
        return None
    return tz.TrimLoop(surf.inverse(pts), pts)


def _face_from_144(model: IgesModel, ent: DirEntry, deflection: float):
    p = ent.params
    surf = model.surface(p[0])
    if surf is None:
        return None
    n1 = int(p[1])
    n2 = int(p[2])
    pto = p[3] if len(p) > 3 else 0
    loops: List[tz.TrimLoop] = []
    if n1 == 1 and pto:
        lp = _loop_from_142(model, pto, surf, deflection)
        if lp is not None:
            loops.append(lp)
    else:
        lp = _natural_loop(surf)
        if lp is not None:
            loops.append(lp)
    for k in range(n2):
        lp = _loop_from_142(model, p[4 + k], surf, deflection)
        if lp is not None:
            loops.append(lp)
    if not loops:
        return None
    try:
        return tz.tessellate_face(surf, loops, deflection)
    except Exception:
        return None


def _face_from_143(model: IgesModel, ent: DirEntry, deflection: float):
    # bounded surface: type, SPTR, N, boundary(141) DEs
    p = ent.params
    surf = model.surface(p[1])
    if surf is None:
        return None
    loops: List[tz.TrimLoop] = []
    for bde in p[3:3 + int(p[2])]:
        b = model.get(bde)
        if b is None or b.type != 141:
            continue
        # 141: type, pref, SPTR, N, then per item: CRVPT, sense, K, parms
        q = b.params
        n = int(q[3])
        i = 4
        pts_all = []
        for _ in range(n):
            crv = q[i]
            sense = int(q[i + 1])
            k = int(q[i + 2])
            i += 3 + k
            c = model.curve(crv)
            if c is None:
                continue
            d0, d1 = getattr(c, "domain", (0.0, 1.0))
            ts = tz.sample_curve(c, d0, d1, deflection, min_pts=8)
            xyz = c.eval(ts)
            if sense == 2:
                xyz = xyz[::-1]
            if pts_all and np.allclose(pts_all[-1][-1], xyz[0], atol=1e-9):
                xyz = xyz[1:]
            pts_all.append(xyz)
        if not pts_all:
            continue
        poly = np.vstack(pts_all)
        if np.allclose(poly[0], poly[-1], atol=1e-9):
            poly = poly[:-1]
        if len(poly) >= 3:
            loops.append(tz.TrimLoop(surf.inverse(poly), poly))
    if not loops:
        lp = _natural_loop(surf)
        if lp is None:
            return None
        loops = [lp]
    try:
        return tz.tessellate_face(surf, loops, deflection)
    except Exception:
        return None


# ---- 186 manifold solid B-rep ----


def _msbo_faces(model: IgesModel, ent: DirEntry) -> List[int]:
    """186 -> list of face (510) DEs through its shells (514)."""
    out: List[int] = []
    shells = [ent.params[0]]
    nv = int(ent.params[2]) if len(ent.params) > 2 else 0
    for k in range(nv):
        shells.append(ent.params[3 + 2 * k])
    for sde in shells:
        sh = model.get(sde)
        if sh is None or sh.type != 514:
            continue
        n = int(sh.params[0])
        for k in range(n):
            out.append(int(sh.params[1 + 2 * k]))
    return out


def _edge_polyline_504(model: IgesModel, edge_list_de, index: int,
                       orient: int, deflection: float
                       ) -> Optional[np.ndarray]:
    el = model.get(edge_list_de)
    if el is None or el.type != 504:
        return None
    n = int(el.params[0])
    if not (1 <= index <= n):
        return None
    base = 1 + 5 * (index - 1)
    crv_de = el.params[base]
    svp, sv = el.params[base + 1], int(el.params[base + 2])
    tvp, tv = el.params[base + 3], int(el.params[base + 4])
    v1 = _vertex_502(model, svp, sv)
    v2 = _vertex_502(model, tvp, tv)
    c = model.curve(crv_de)
    if c is None:
        if v1 is None or v2 is None:
            return None
        pts = np.stack([v1, v2])
    else:
        d0, d1 = getattr(c, "domain", (0.0, 1.0))
        if v1 is not None and v2 is not None and \
                not np.allclose(v1, v2, atol=1e-9):
            t1, t2 = c.param_of(v1), c.param_of(v2)
            per = getattr(c, "period", None)
            if per is not None:
                while t2 <= t1 + 1e-12:
                    t2 += per
            elif t2 < t1:
                t1, t2 = t2, t1
                orient = 1 - orient if orient in (0, 1) else orient
            d0, d1 = t1, t2
        ts = tz.sample_curve(c, d0, d1, deflection, min_pts=8)
        pts = c.eval(ts)
        if v1 is not None:
            pts[0] = v1
        if v2 is not None:
            pts[-1] = v2
    if orient == 0:  # 0 = reversed w.r.t. edge direction in 508
        pts = pts[::-1]
    return pts


def _vertex_502(model: IgesModel, de, index: int) -> Optional[np.ndarray]:
    vl = model.get(de)
    if vl is None or vl.type != 502:
        return None
    n = int(vl.params[0])
    if not (1 <= index <= n):
        return None
    b = 1 + 3 * (index - 1)
    return np.array([float(vl.params[b]), float(vl.params[b + 1]),
                     float(vl.params[b + 2])], np.float64)


def _face_from_510(model: IgesModel, ent: DirEntry, deflection: float):
    p = ent.params
    surf = model.surface(p[0])
    if surf is None:
        return None
    n_loops = int(p[1])
    loops: List[tz.TrimLoop] = []
    for k in range(n_loops):
        loop_de = p[3 + k]
        lp = model.get(loop_de)
        if lp is None or lp.type != 508:
            continue
        q = lp.params
        n_edges = int(q[0])
        i = 1
        segs = []
        for _ in range(n_edges):
            etype = int(q[i])
            edge_de = q[i + 1]
            index = int(q[i + 2])
            orient = int(q[i + 3])
            k2 = int(q[i + 4])
            i += 5 + 2 * k2
            if etype != 0:
                continue
            pl = _edge_polyline_504(model, edge_de, index, orient,
                                    deflection)
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
        lp = _natural_loop(surf)
        if lp is None:
            return None
        loops = [lp]
    try:
        return tz.tessellate_face(surf, loops, deflection)
    except Exception:
        return None


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

_FACE_TYPES = (144, 143, 510)
_BARE_SURFACE_TYPES = (118, 120, 122, 128)


def load_iges(path: str, deflection: float = 0.0) -> List[TriangleMesh]:
    """Read an IGES file into TriangleMesh parts.

    Faces are grouped per 186 solid when present; independent trimmed
    surfaces (144/143) merge into one mesh; bare untrimmed surfaces with
    a known parametric domain tessellate over their natural bounds.
    `deflection` <= 0 auto-picks 0.4% of the model extent.
    """
    with open(path, "r", errors="replace") as f:
        text = f.read()
    entities = parse_iges(text)
    if not entities:
        raise ValueError(f"{path}: no IGES directory entries parsed")
    model = IgesModel(entities)

    if deflection <= 0:
        deflection = _auto_deflection(model)

    groups: List[List[DirEntry]] = []
    used = set()
    for ent in entities.values():
        if ent.type == 186:
            faces = []
            for fde in _msbo_faces(model, ent):
                f = model.get(fde)
                if f is not None and f.type == 510:
                    faces.append(f)
                    used.add(f.de)
            if faces:
                groups.append(faces)
    # independent trimmed faces (not claimed by a solid, not subordinate)
    free = [e for e in entities.values()
            if e.type in _FACE_TYPES and e.de not in used
            and e.subordinate == 0]
    if free:
        groups.append(free)
    if not groups:
        # last resort: any face-typed entity, then bare surfaces
        any_faces = [e for e in entities.values() if e.type in _FACE_TYPES]
        if any_faces:
            groups.append(any_faces)
        else:
            bare = [e for e in entities.values()
                    if e.type in _BARE_SURFACE_TYPES]
            if bare:
                groups.append(bare)

    meshes: List[TriangleMesh] = []
    for faces in groups:
        parts = []
        for f in faces:
            if f.type == 144:
                parts.append(_face_from_144(model, f, deflection))
            elif f.type == 143:
                parts.append(_face_from_143(model, f, deflection))
            elif f.type == 510:
                parts.append(_face_from_510(model, f, deflection))
            else:  # bare surface over its natural domain
                surf = model.surface(f.de)
                lp = _natural_loop(surf) if surf is not None else None
                if lp is not None:
                    try:
                        parts.append(tz.tessellate_face(surf, [lp],
                                                        deflection))
                    except Exception:
                        parts.append(None)
        mesh = _merge_parts(parts)
        if mesh is not None:
            meshes.append(mesh)
    if not meshes:
        raise ValueError(
            f"{path}: no tessellatable geometry found "
            f"({len(entities)} directory entries parsed). The native IGES "
            "reader covers trimmed-surface (144/143/142) and B-rep (186) "
            "models; register a backend via "
            "cadrays_tpu.geometry.cad.register_tessellator for others.")
    return meshes


def _auto_deflection(model: IgesModel) -> float:
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    count = 0
    for ent in model.e.values():
        pts = None
        if ent.type == 110 and len(ent.params) >= 6:
            pts = np.asarray([float(v) for v in ent.params[:6]],
                             np.float64).reshape(2, 3)
        elif ent.type == 116 and len(ent.params) >= 3:
            pts = np.asarray([float(v) for v in ent.params[:3]],
                             np.float64).reshape(1, 3)
        elif ent.type == 502:
            n = int(ent.params[0])
            vals = [float(v) for v in ent.params[1:1 + 3 * n]]
            if len(vals) == 3 * n:
                pts = np.asarray(vals, np.float64).reshape(n, 3)
        elif ent.type == 126:
            c = model.curve(ent.de)
            if c is not None:
                d0, d1 = getattr(c, "domain", (0.0, 1.0))
                pts = c.eval(np.linspace(d0, d1, 8))
        if pts is not None and len(pts):
            lo = np.minimum(lo, pts.min(0))
            hi = np.maximum(hi, pts.max(0))
            count += len(pts)
        if count > 20000:
            break
    if not np.isfinite(lo).all():
        return 0.01
    diag = float(np.linalg.norm(hi - lo))
    return max(diag * 0.004, 1e-6)

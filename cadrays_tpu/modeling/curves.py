"""Analytic parametric curves, 2D and 3D (dimension-generic).

Covers the DRAW curve commands the reference's modeling scripts use
(`line`, `circle`, `ellipse`, `beziercurve`, `polyline`, `trim`,
`cvalue`/`2dcvalue`, `parameters`, `gcarc`, `lintan`, `reverse`,
`to3d` — e.g. data/scripts/Bottle.tcl:16-21, Shape.tcl:100-140).
Curves keep their exact parameterization (OCCT conventions: circles in
radians, lines in arc length) so trimming and point evaluation match
the scripts' hard-coded parameter values.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


class Curve:
    """Parametric curve in R^dim. Parameter range [t0, t1]."""

    dim: int = 3
    t0: float = 0.0
    t1: float = 1.0
    periodic: bool = False

    def value(self, t):
        """(..., dim) point(s) at parameter t (scalar or array)."""
        raise NotImplementedError

    def d1(self, t):
        """First derivative (tangent, un-normalized)."""
        eps = 1e-6 * max(1.0, abs(self.t1 - self.t0))
        return (self.value(np.asarray(t) + eps) - self.value(
            np.asarray(t) - eps)) / (2 * eps)

    def reversed(self) -> "Curve":
        return ReversedCurve(self)

    def trimmed(self, a: float, b: float) -> "Curve":
        return TrimmedCurve(self, a, b)

    # -- sampling ----------------------------------------------------------
    def n_samples(self, tol: float = 0.0) -> int:
        return 32

    def sample(self, n: Optional[int] = None) -> np.ndarray:
        """(N+1, dim) polyline including both endpoints."""
        n = n or self.n_samples()
        t = np.linspace(self.t0, self.t1, n + 1)
        return np.asarray(self.value(t), np.float64)

    def project(self, p, tol: float = 1e-9) -> float:
        """Parameter of the closest point to p (DRAW `parameters`)."""
        p = np.asarray(p, np.float64)
        ts = np.linspace(self.t0, self.t1, 1025)
        pts = self.value(ts)
        i = int(np.argmin(np.sum((pts - p) ** 2, axis=-1)))
        lo = ts[max(i - 1, 0)]
        hi = ts[min(i + 1, len(ts) - 1)]
        for _ in range(64):  # golden-section polish
            m1 = lo + (hi - lo) / 3
            m2 = hi - (hi - lo) / 3
            if (np.sum((self.value(m1) - p) ** 2)
                    < np.sum((self.value(m2) - p) ** 2)):
                hi = m2
            else:
                lo = m1
            if hi - lo < tol:
                break
        return 0.5 * (lo + hi)


class Line(Curve):
    """Infinite line: point + unit direction, parameter = arc length."""

    def __init__(self, p, d):
        p = np.asarray(p, np.float64)
        d = np.asarray(d, np.float64)
        n = np.linalg.norm(d)
        if n < 1e-15:
            raise ValueError("line with zero direction")
        self.p = p
        self.d = d / n
        self.dim = p.shape[-1]
        self.t0, self.t1 = 0.0, 1.0  # unbounded; trim sets real range

    def value(self, t):
        t = np.asarray(t, np.float64)
        return self.p + t[..., None] * self.d if t.ndim else self.p + t * self.d

    def d1(self, t):
        t = np.asarray(t, np.float64)
        return np.broadcast_to(self.d, t.shape + (self.dim,)) if t.ndim \
            else self.d

    def n_samples(self, tol: float = 0.0) -> int:
        return 1


class Circle(Curve):
    """Circle. 2D: center+radius (+x-dir). 3D: center+normal+x-dir+radius.

    Parameter is the angle in radians from the x-direction (OCCT
    convention: period 2*pi)."""

    def __init__(self, center, radius, normal=None, xdir=None):
        c = np.asarray(center, np.float64)
        self.center = c
        self.radius = float(radius)
        self.dim = c.shape[-1]
        self.t0, self.t1 = 0.0, 2 * math.pi
        self.periodic = True
        if self.dim == 2:
            x = np.asarray(xdir, np.float64) if xdir is not None \
                else np.array([1.0, 0.0])
            x = x / np.linalg.norm(x)
            self.ax = x
            self.ay = np.array([-x[1], x[0]])
        else:
            nrm = np.asarray(normal if normal is not None else [0, 0, 1],
                             np.float64)
            nrm = nrm / np.linalg.norm(nrm)
            if xdir is not None:
                x = np.asarray(xdir, np.float64)
                x = x - nrm * np.dot(x, nrm)
                x = x / np.linalg.norm(x)
            else:
                x = np.cross(np.array([0.0, 1.0, 0.0]), nrm)
                if np.linalg.norm(x) < 1e-6:
                    x = np.cross(nrm, np.array([0.0, 0.0, 1.0]))
                x = x / np.linalg.norm(x)
            self.normal = nrm
            self.ax = x
            self.ay = np.cross(nrm, x)

    def value(self, t):
        t = np.asarray(t, np.float64)
        c, s = np.cos(t), np.sin(t)
        return (self.center + self.radius
                * (c[..., None] * self.ax + s[..., None] * self.ay)) \
            if t.ndim else self.center + self.radius * (c * self.ax
                                                        + s * self.ay)

    def d1(self, t):
        t = np.asarray(t, np.float64)
        c, s = np.cos(t), np.sin(t)
        if t.ndim:
            return self.radius * (-s[..., None] * self.ax
                                  + c[..., None] * self.ay)
        return self.radius * (-s * self.ax + c * self.ay)

    def n_samples(self, tol: float = 0.0) -> int:
        frac = abs(self.t1 - self.t0) / (2 * math.pi)
        return max(2, int(math.ceil(64 * frac)))


class Ellipse(Curve):
    """Ellipse, parameter in radians (OCCT convention)."""

    def __init__(self, center, major, minor, normal=None, xdir=None):
        c = np.asarray(center, np.float64)
        self.center = c
        self.major = float(major)
        self.minor = float(minor)
        self.dim = c.shape[-1]
        self.t0, self.t1 = 0.0, 2 * math.pi
        self.periodic = True
        if self.dim == 2:
            x = np.asarray(xdir, np.float64) if xdir is not None \
                else np.array([1.0, 0.0])
            x = x / np.linalg.norm(x)
            self.ax = x
            self.ay = np.array([-x[1], x[0]])
        else:
            nrm = np.asarray(normal if normal is not None else [0, 0, 1],
                             np.float64)
            nrm = nrm / np.linalg.norm(nrm)
            if xdir is not None:
                x = np.asarray(xdir, np.float64)
                x = x - nrm * np.dot(x, nrm)
                x = x / np.linalg.norm(x)
            else:
                x = np.cross(np.array([0.0, 1.0, 0.0]), nrm)
                if np.linalg.norm(x) < 1e-6:
                    x = np.cross(nrm, np.array([0.0, 0.0, 1.0]))
                x = x / np.linalg.norm(x)
            self.ax = x
            self.ay = np.cross(nrm, x)

    def value(self, t):
        t = np.asarray(t, np.float64)
        c, s = np.cos(t), np.sin(t)
        if t.ndim:
            return (self.center + self.major * c[..., None] * self.ax
                    + self.minor * s[..., None] * self.ay)
        return self.center + self.major * c * self.ax \
            + self.minor * s * self.ay

    def n_samples(self, tol: float = 0.0) -> int:
        frac = abs(self.t1 - self.t0) / (2 * math.pi)
        return max(2, int(math.ceil(64 * frac)))


class Bezier(Curve):
    """Bezier curve, optionally rational (per-pole weights).

    DRAW `beziercurve name npoles x1 y1 z1 [w1] ...` — Shape.tcl uses
    the rational form for its back-side cave."""

    def __init__(self, poles, weights=None):
        self.poles = np.asarray(poles, np.float64)  # (N, dim)
        self.weights = None if weights is None \
            else np.asarray(weights, np.float64)
        self.dim = self.poles.shape[-1]
        self.t0, self.t1 = 0.0, 1.0

    def value(self, t):
        t = np.asarray(t, np.float64)
        scalar = t.ndim == 0
        t = np.atleast_1d(t)
        n = self.poles.shape[0] - 1
        # de Casteljau, vectorized over t
        if self.weights is None:
            pts = np.broadcast_to(self.poles, t.shape + self.poles.shape
                                  ).copy()
            for _ in range(n):
                pts = (1 - t)[:, None, None] * pts[:, :-1] \
                    + t[:, None, None] * pts[:, 1:]
            out = pts[:, 0]
        else:
            hw = self.poles * self.weights[:, None]
            pw = np.concatenate([hw, self.weights[:, None]], axis=-1)
            pts = np.broadcast_to(pw, t.shape + pw.shape).copy()
            for _ in range(n):
                pts = (1 - t)[:, None, None] * pts[:, :-1] \
                    + t[:, None, None] * pts[:, 1:]
            out = pts[:, 0, :-1] / pts[:, 0, -1:]
        return out[0] if scalar else out

    def n_samples(self, tol: float = 0.0) -> int:
        return 16 * max(1, self.poles.shape[0] - 1)


class Polyline(Curve):
    """Piecewise-linear curve through points; parameter = chord length
    accumulated (matches DRAW polyline parameterization closely enough
    for the scripts, which never evaluate polylines by parameter)."""

    def __init__(self, points):
        self.points = np.asarray(points, np.float64)
        self.dim = self.points.shape[-1]
        seg = np.linalg.norm(np.diff(self.points, axis=0), axis=-1)
        self.cum = np.concatenate([[0.0], np.cumsum(seg)])
        self.t0, self.t1 = 0.0, float(self.cum[-1])

    def value(self, t):
        t = np.asarray(t, np.float64)
        scalar = t.ndim == 0
        t = np.atleast_1d(np.clip(t, self.t0, self.t1))
        idx = np.clip(np.searchsorted(self.cum, t, side="right") - 1,
                      0, len(self.cum) - 2)
        seg_len = np.maximum(self.cum[idx + 1] - self.cum[idx], 1e-15)
        f = (t - self.cum[idx]) / seg_len
        out = (1 - f)[:, None] * self.points[idx] \
            + f[:, None] * self.points[idx + 1]
        return out[0] if scalar else out

    def sample(self, n: Optional[int] = None) -> np.ndarray:
        return self.points.copy()

    def n_samples(self, tol: float = 0.0) -> int:
        return self.points.shape[0] - 1


class TrimmedCurve(Curve):
    def __init__(self, basis: Curve, a: float, b: float):
        self.basis = basis
        self.dim = basis.dim
        self.t0, self.t1 = float(a), float(b)
        if self.t1 < self.t0 and basis.periodic:
            self.t1 += 2 * math.pi  # wrap (Shape.tcl trims 4.71..0.15)

    def value(self, t):
        return self.basis.value(t)

    def d1(self, t):
        return self.basis.d1(t)

    def n_samples(self, tol: float = 0.0) -> int:
        base = self.basis
        if isinstance(base, (Circle, Ellipse)):
            frac = abs(self.t1 - self.t0) / (2 * math.pi)
            return max(2, int(math.ceil(64 * frac)))
        return base.n_samples(tol)


class ReversedCurve(Curve):
    """Orientation flip: value(t) = basis(t1 + t0 - t)."""

    def __init__(self, basis: Curve):
        self.basis = basis
        self.dim = basis.dim
        self.t0, self.t1 = basis.t0, basis.t1
        self.periodic = basis.periodic

    def value(self, t):
        return self.basis.value(self.t1 + self.t0 - np.asarray(t))

    def d1(self, t):
        return -np.asarray(self.basis.d1(self.t1 + self.t0 - np.asarray(t)))

    def n_samples(self, tol: float = 0.0) -> int:
        return self.basis.n_samples(tol)


def arc_through_3_points(p1, p2, p3) -> TrimmedCurve:
    """Circle arc p1 -> p2 -> p3 (DRAW `gcarc name cir p1 p2 p3`,
    Bottle.tcl:19). Dimension follows the input points."""
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)[: p1.shape[0]]
    p3 = np.asarray(p3, np.float64)[: p1.shape[0]]
    if p1.shape[0] == 2:
        center, r = _circumcenter_2d(p1, p2, p3)
        circ = Circle(center, r)
        a1 = math.atan2(*(p1 - center)[::-1])
        a2 = math.atan2(*(p2 - center)[::-1])
        a3 = math.atan2(*(p3 - center)[::-1])
    else:
        n = np.cross(p2 - p1, p3 - p1)
        n = n / np.linalg.norm(n)
        # circumcenter in 3D
        ex = (p2 - p1) / np.linalg.norm(p2 - p1)
        ey = np.cross(n, ex)
        b = np.array([np.dot(p3 - p1, ex), np.dot(p3 - p1, ey)])
        d = np.linalg.norm(p2 - p1)
        cx = d / 2
        cy = (b[0] ** 2 + b[1] ** 2 - b[0] * d) / (2 * b[1])
        center = p1 + cx * ex + cy * ey
        r = math.hypot(cx, cy)
        circ = Circle(center, r, normal=n, xdir=(p1 - center))
        a1 = 0.0
        a2 = _angle_on(circ, p2)
        a3 = _angle_on(circ, p3)
    # choose the parameter span passing through p2
    lo, hi = a1, a3
    if hi < lo:
        hi += 2 * math.pi
    mid = a2 if a2 >= lo else a2 + 2 * math.pi
    if not (lo <= mid <= hi):  # wrong way round: go the other way
        lo, hi = a3, a1 + 2 * math.pi if a1 < a3 else a1
        circ2 = circ
        return TrimmedCurve(circ2, a3, a1 + (2 * math.pi if a1 < a3 else 0))
    return TrimmedCurve(circ, lo, hi)


def _planar_z(*pts) -> bool:
    return all(len(p) >= 3 and abs(float(p[2])) < 1e-12 for p in pts)


def _circumcenter_2d(p1, p2, p3):
    ax, ay = p1
    bx, by = p2
    cx, cy = p3
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-15:
        raise ValueError("collinear points for arc")
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    c = np.array([ux, uy])
    return c, float(np.linalg.norm(p1 - c))


def _angle_on(circ: Circle, p) -> float:
    v = np.asarray(p, np.float64) - circ.center
    x = np.dot(v, circ.ax)
    y = np.dot(v, circ.ay)
    a = math.atan2(y, x)
    return a + 2 * math.pi if a < 0 else a


def tangent_lines(c1: Circle, c2: Circle) -> List[Line]:
    """All common tangent 2D lines of two circles (DRAW `lintan`,
    Shape.tcl:104-115). Ordering matches GccAna_Lin2dTanTan's solution
    enumeration closely enough for the scripts: the two outer tangents
    first (upper then lower w.r.t. the center line), then the two inner
    ones. Each line is parameterized from its tangency point on c1
    toward the tangency point on c2 (arc-length), which is what the
    scripts' `trim t_l_k 0 <length>` relies on."""
    out: List[Line] = []
    p1 = c1.center[:2]
    p2 = c2.center[:2]
    d = p2 - p1
    dist = float(np.linalg.norm(d))
    if dist < 1e-12:
        return out
    for sign_r in (1.0, -1.0):  # outer pair then inner pair
        r2 = c2.radius * sign_r
        dr = c1.radius - r2
        if dist ** 2 < dr ** 2 - 1e-12:
            continue
        h = math.sqrt(max(dist ** 2 - dr ** 2, 0.0))
        for s in (1.0, -1.0):
            # unit normal of the tangent line
            nx = (d[0] * dr - s * d[1] * h) / dist ** 2
            ny = (d[1] * dr + s * d[0] * h) / dist ** 2
            n = np.array([nx, ny])
            t1 = p1 - c1.radius * n
            t2 = p2 - r2 * n
            dirv = t2 - t1
            if np.linalg.norm(dirv) < 1e-12:
                dirv = np.array([-n[1], n[0]])
            out.append(Line(t1, dirv))
    return out

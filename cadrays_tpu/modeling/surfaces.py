"""Parametric surfaces + curve-on-surface composition.

DRAW surface commands used by the scripts: `plane` (Cutter.tcl:20,
Shape.tcl), `cylinder` as a *surface* for threading edges
(Bottle.tcl:63-64: `mkedge E1OnS1 arc1 c1 0 pi` lifts a 2D parametric
curve onto cylinder c1), `cone`/`pcone` placements. `to3d` maps 2D
curves onto a plane (Shape.tcl:140-147).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from cadrays_tpu.modeling.curves import Curve


def _frame(normal, xdir=None):
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    if xdir is not None:
        x = np.asarray(xdir, np.float64)
        x = x - n * np.dot(x, n)
        nx = np.linalg.norm(x)
        if nx > 1e-12:
            x = x / nx
        else:
            xdir = None
    if xdir is None:
        # canonical: n=(0,0,1) -> x=(1,0,0) (identity (u,v)->(x,y) for
        # the default DRAW `plane p0`)
        x = np.cross(np.array([0.0, 1.0, 0.0]), n)
        nx = np.linalg.norm(x)
        if nx < 1e-6:
            x = np.cross(n, np.array([0.0, 0.0, 1.0]))
            nx = np.linalg.norm(x)
        x = x / nx
    y = np.cross(n, x)
    return n, x, y


class Surface:
    def value(self, u, v):
        raise NotImplementedError


class Plane(Surface):
    """Plane with origin + (normal, xdir, ydir) frame. (u, v) are
    coordinates along (xdir, ydir) — OCCT gp_Pln convention."""

    def __init__(self, origin=(0, 0, 0), normal=(0, 0, 1), xdir=None):
        self.origin = np.asarray(origin, np.float64)
        self.normal, self.xdir, self.ydir = _frame(normal, xdir)

    def value(self, u, v):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        return (self.origin + u[..., None] * self.xdir
                + v[..., None] * self.ydir) if u.ndim else \
            self.origin + u * self.xdir + v * self.ydir

    def to_2d(self, pts3d):
        """World (N, 3) -> plane (N, 2)."""
        rel = np.asarray(pts3d, np.float64) - self.origin
        return np.stack([rel @ self.xdir, rel @ self.ydir], axis=-1)

    def to_3d(self, pts2d):
        p = np.asarray(pts2d, np.float64)
        return (self.origin + p[..., 0:1] * self.xdir
                + p[..., 1:2] * self.ydir)


class Cylinder(Surface):
    """Infinite cylinder surface. u = angle (radians), v = height along
    axis — OCCT gp_Cylinder convention (Bottle threading relies on it:
    u in [0, 2*pi] wraps the neck, v is vertical)."""

    def __init__(self, origin, axis, radius, xdir=None):
        self.origin = np.asarray(origin, np.float64)
        self.axis, self.xdir, self.ydir = _frame(axis, xdir)
        self.radius = float(radius)

    def value(self, u, v):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        c, s = np.cos(u), np.sin(u)
        if u.ndim:
            return (self.origin
                    + self.radius * (c[..., None] * self.xdir
                                     + s[..., None] * self.ydir)
                    + v[..., None] * self.axis)
        return self.origin + self.radius * (c * self.xdir + s * self.ydir) \
            + v * self.axis


class Cone(Surface):
    """Cone surface: apex half-angle, reference radius at v=0; u = angle,
    v = distance along axis."""

    def __init__(self, origin, axis, half_angle, radius, xdir=None):
        self.origin = np.asarray(origin, np.float64)
        self.axis, self.xdir, self.ydir = _frame(axis, xdir)
        self.half_angle = float(half_angle)
        self.radius = float(radius)

    def value(self, u, v):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        r = self.radius + v * math.tan(self.half_angle)
        c, s = np.cos(u), np.sin(u)
        if u.ndim:
            return (self.origin
                    + r[..., None] * (c[..., None] * self.xdir
                                      + s[..., None] * self.ydir)
                    + v[..., None] * self.axis)
        return self.origin + r * (c * self.xdir + s * self.ydir) \
            + v * self.axis


class CurveOnSurface(Curve):
    """3D curve defined by a 2D curve in a surface's parameter space
    (`mkedge edge curve2d surface t0 t1`, Bottle.tcl:63-66)."""

    def __init__(self, curve2d: Curve, surface: Surface,
                 t0: Optional[float] = None, t1: Optional[float] = None):
        self.curve2d = curve2d
        self.surface = surface
        self.dim = 3
        self.t0 = curve2d.t0 if t0 is None else float(t0)
        self.t1 = curve2d.t1 if t1 is None else float(t1)

    def value(self, t):
        uv = np.asarray(self.curve2d.value(t), np.float64)
        return self.surface.value(uv[..., 0], uv[..., 1])

    def n_samples(self, tol: float = 0.0) -> int:
        return max(64, self.curve2d.n_samples(tol) * 2)


class PlanarCurve3d(Curve):
    """2D curve lifted rigidly onto a plane (DRAW `to3d`)."""

    def __init__(self, curve2d: Curve, plane: Plane):
        self.curve2d = curve2d
        self.plane = plane
        self.dim = 3
        self.t0 = curve2d.t0
        self.t1 = curve2d.t1
        self.periodic = curve2d.periodic

    def value(self, t):
        uv = np.asarray(self.curve2d.value(t), np.float64)
        return self.plane.to_3d(uv)

    def n_samples(self, tol: float = 0.0) -> int:
        return self.curve2d.n_samples(tol)

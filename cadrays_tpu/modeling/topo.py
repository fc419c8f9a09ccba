"""Topological shapes over analytic geometry — the DRAW shape registry
value types.

Architecture (deliberately not OCCT's BRep): faces are planar regions
(a `Plane` frame + ordered 2D loops that keep per-edge identity), and
solids are watertight triangle meshes carrying a per-triangle face id
plus optional recorded feature edges. The renderer consumes triangles,
the boolean core consumes triangles, and `explode`'s face/edge
sub-shapes are recovered from the ids — so the mesh itself is the
boundary representation (DataNode explode semantics: reference
DataNode.cxx:479-564).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cadrays_tpu.modeling.curves import Curve, Polyline
from cadrays_tpu.modeling.surfaces import Plane, Surface
from cadrays_tpu.modeling.triangulate import signed_area, triangulate

_MERGE_TOL = 1e-7


class Shape:
    """Base: every shape carries a composable location (DRAW's
    `ttranslate`/`trotate`/... mutate the location; `reset` clears it)."""

    kind = "shape"

    def __init__(self):
        self.loc = np.eye(4)

    def copy(self) -> "Shape":
        import copy as _c

        out = _c.deepcopy(self)
        return out

    def apply_loc(self, m: np.ndarray) -> None:
        self.loc = np.asarray(m, np.float64) @ self.loc

    def reset_loc(self) -> None:
        self.loc = np.eye(4)

    def _xp(self, pts: np.ndarray) -> np.ndarray:
        """Apply loc to (N, 3) points."""
        pts = np.asarray(pts, np.float64)
        return pts @ self.loc[:3, :3].T + self.loc[:3, 3]


def _pt3(p) -> np.ndarray:
    p = np.asarray(p, np.float64).ravel()
    if p.shape[0] == 2:
        p = np.array([p[0], p[1], 0.0])
    return p


class VertexShape(Shape):
    kind = "vertex"

    def __init__(self, point):
        super().__init__()
        self.point = _pt3(point)

    @property
    def world_point(self) -> np.ndarray:
        return self._xp(self.point[None])[0]


class CurveShape(Shape):
    """A named analytic curve (2D or 3D) — DrawTrSurf analogue."""

    kind = "curve"

    def __init__(self, curve: Curve):
        super().__init__()
        self.curve = curve


class SurfaceShape(Shape):
    kind = "surface"

    def __init__(self, surface: Surface):
        super().__init__()
        self.surface = surface


class EdgeShape(Shape):
    kind = "edge"

    def __init__(self, curve: Curve, t0: Optional[float] = None,
                 t1: Optional[float] = None):
        super().__init__()
        if curve.dim != 3:
            raise ValueError("edges need 3D curves (lift 2D with a "
                             "surface or plane first)")
        self.curve = curve
        self.t0 = curve.t0 if t0 is None else float(t0)
        self.t1 = curve.t1 if t1 is None else float(t1)

    def polyline(self, n: Optional[int] = None) -> np.ndarray:
        c = self.curve
        if (n is None and isinstance(c, Polyline)
                and self.t0 == c.t0 and self.t1 == c.t1):
            return self._xp(c.points)
        if n is None:
            n = c.n_samples()
        t = np.linspace(self.t0, self.t1, max(n, 1) + 1)
        return self._xp(np.asarray(c.value(t), np.float64))


class WireShape(Shape):
    kind = "wire"

    def __init__(self, edges: Sequence[EdgeShape]):
        super().__init__()
        self.edges = list(edges)

    def chains(self) -> List[Tuple[np.ndarray, bool]]:
        """Connect edge polylines into chains by endpoint proximity.

        Returns [(points (N, 3), closed)] — edges may come in any order
        or orientation (DRAW `wire` fixes connectivity the same way)."""
        polys = [self._xp(e.polyline()) for e in self.edges]
        return chain_polylines(polys)

    def edge_polylines(self) -> List[np.ndarray]:
        return [self._xp(e.polyline()) for e in self.edges]


def chain_polylines(polys: List[np.ndarray],
                    tol: float = 1e-5) -> List[Tuple[np.ndarray, bool]]:
    """Greedy endpoint chaining of polylines into open/closed chains."""
    remaining = [np.asarray(p, np.float64) for p in polys if len(p) >= 2]
    chains: List[Tuple[np.ndarray, bool]] = []
    # scale-aware tolerance
    if remaining:
        allp = np.concatenate(remaining)
        scale = float(np.max(np.ptp(allp, axis=0))) if len(allp) else 1.0
        tol = max(tol, 1e-6 * scale)
    while remaining:
        cur = remaining.pop(0)
        extended = True
        while extended:
            extended = False
            for i, p in enumerate(remaining):
                if np.linalg.norm(cur[-1] - p[0]) <= tol:
                    cur = np.concatenate([cur, p[1:]])
                elif np.linalg.norm(cur[-1] - p[-1]) <= tol:
                    cur = np.concatenate([cur, p[::-1][1:]])
                elif np.linalg.norm(cur[0] - p[-1]) <= tol:
                    cur = np.concatenate([p, cur[1:]])
                elif np.linalg.norm(cur[0] - p[0]) <= tol:
                    cur = np.concatenate([p[::-1], cur[1:]])
                else:
                    continue
                remaining.pop(i)
                extended = True
                break
        closed = bool(np.linalg.norm(cur[0] - cur[-1]) <= tol)
        if closed and len(cur) > 1:
            cur = cur[:-1]
        chains.append((cur, closed))
    return chains


class FaceShape(Shape):
    """Planar face: plane frame + 2D loops.

    `edges2d` (parallel to nothing) keeps the outer loop's per-edge
    polylines in order when the face was built from a wire — that is
    what gives `explode f e` + `chfi2d` their edge indices."""

    kind = "face"

    def __init__(self, plane: Plane, loops: Sequence[np.ndarray],
                 edges2d: Optional[List[np.ndarray]] = None):
        super().__init__()
        self.plane = plane
        self.loops = [np.asarray(l, np.float64) for l in loops]
        self.edges2d = edges2d

    def baked(self) -> "FaceShape":
        """Location folded into the plane frame (loc -> identity).

        Valid for rigid + uniform-scale locations — all the DRAW t*
        commands produce. Boolean/cross-section code needs the face's
        *world* plane, not its construction plane."""
        if np.allclose(self.loc, np.eye(4)):
            return self
        R = self.loc[:3, :3]
        s = float(np.cbrt(abs(np.linalg.det(R)))) or 1.0
        origin = R @ self.plane.origin + self.loc[:3, 3]
        normal = R @ self.plane.normal
        xdir = R @ self.plane.xdir
        pl = Plane(origin, normal / np.linalg.norm(normal),
                   xdir / np.linalg.norm(xdir))
        out = FaceShape(pl, [l * s for l in self.loops],
                        edges2d=None if self.edges2d is None
                        else [e * s for e in self.edges2d])
        return out

    def outer_and_holes(self) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        outers, holes = [], []
        if not self.loops:
            return outers, holes
        areas = [abs(signed_area(l)) for l in self.loops]
        main = int(np.argmax(areas))
        # loops contained in the largest are holes; others are outers
        from matplotlib.path import Path

        main_path = Path(self.loops[main])
        outers.append(self.loops[main])
        for i, l in enumerate(self.loops):
            if i == main:
                continue
            if main_path.contains_point(l.mean(axis=0)):
                holes.append(l)
            else:
                outers.append(l)
        return outers, holes

    def mesh(self) -> Tuple[np.ndarray, np.ndarray]:
        """((V, 3) verts, (T, 3) tris), triangles CCW about plane normal."""
        outers, holes = self.outer_and_holes()
        all_v: List[np.ndarray] = []
        all_t: List[np.ndarray] = []
        off = 0
        for outer in outers:
            hs = holes if len(outers) == 1 else [
                h for h in holes if _inside(outer, h)]
            v2, t = triangulate(outer, hs)
            if len(t) == 0:
                continue
            all_v.append(self.plane.to_3d(v2))
            all_t.append(t + off)
            off += len(v2)
        if not all_v:
            return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
        v = self._xp(np.concatenate(all_v))
        return v, np.concatenate(all_t).astype(np.int32)

    def area(self) -> float:
        outers, holes = self.outer_and_holes()
        return (sum(abs(signed_area(o)) for o in outers)
                - sum(abs(signed_area(h)) for h in holes))


def _inside(outer: np.ndarray, loop: np.ndarray) -> bool:
    from matplotlib.path import Path

    return bool(Path(outer).contains_point(loop.mean(axis=0)))


class SolidShape(Shape):
    """Closed (or explode-produced open) triangle mesh with face ids."""

    kind = "solid"

    def __init__(self, verts: np.ndarray, tris: np.ndarray,
                 face_id: Optional[np.ndarray] = None,
                 feature_edges: Optional[List[EdgeShape]] = None):
        super().__init__()
        self.verts = np.asarray(verts, np.float64).reshape(-1, 3)
        self.tris = np.asarray(tris, np.int32).reshape(-1, 3)
        self.face_id = (np.zeros(len(self.tris), np.int32)
                        if face_id is None
                        else np.asarray(face_id, np.int32))
        self.feature_edges = feature_edges

    def world_mesh(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        det = np.linalg.det(self.loc[:3, :3])
        tris = self.tris if det >= 0 else self.tris[:, [0, 2, 1]]
        return self._xp(self.verts), tris, self.face_id

    def n_faces(self) -> int:
        return int(self.face_id.max()) + 1 if len(self.face_id) else 0

    def bbox(self) -> Tuple[np.ndarray, np.ndarray]:
        v = self._xp(self.verts)
        return v.min(axis=0), v.max(axis=0)


class CompoundShape(Shape):
    kind = "compound"

    def __init__(self, parts: Sequence[Shape]):
        super().__init__()
        self.parts = list(parts)


# ---------------------------------------------------------------------------
# meshing / conversion helpers
# ---------------------------------------------------------------------------


def shape_mesh(shape: Shape) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """World-space (verts, tris, face_id) for solid/face/compound."""
    if isinstance(shape, SolidShape):
        return shape.world_mesh()
    if isinstance(shape, FaceShape):
        v, t = shape.mesh()
        return v, t, np.zeros(len(t), np.int32)
    if isinstance(shape, CompoundShape):
        vs, ts, fs = [], [], []
        voff = foff = 0
        for p in shape.parts:
            v, t, f = shape_mesh(p)
            if len(t) == 0:
                continue
            vs.append(v)
            ts.append(t + voff)
            fs.append(f + foff)
            voff += len(v)
            foff += int(f.max()) + 1 if len(f) else 0
        if not vs:
            return (np.zeros((0, 3)), np.zeros((0, 3), np.int32),
                    np.zeros(0, np.int32))
        v = np.concatenate(vs)
        v = v @ shape.loc[:3, :3].T + shape.loc[:3, 3]
        return v, np.concatenate(ts), np.concatenate(fs)
    raise TypeError(f"cannot mesh a {shape.kind}")


def to_triangle_mesh(shape: Shape):
    """Shape -> renderable TriangleMesh (with part_ranges for compounds)."""
    from cadrays_tpu.geometry.mesh import TriangleMesh

    if isinstance(shape, CompoundShape):
        vs, ts = [], []
        ranges = []
        voff = 0
        t0 = 0
        for p in shape.parts:
            v, t, _ = shape_mesh(p)
            if len(t) == 0:
                continue
            v = v @ shape.loc[:3, :3].T + shape.loc[:3, 3]
            vs.append(v)
            ts.append(t + voff)
            voff += len(v)
            ranges.append((t0, t0 + len(t)))
            t0 += len(t)
        if not vs:
            raise ValueError("empty compound")
        return TriangleMesh(
            np.concatenate(vs).astype(np.float32),
            np.concatenate(ts),
            part_ranges=np.asarray(ranges, np.int64))
    v, t, _ = shape_mesh(shape)
    if len(t) == 0:
        raise ValueError("shape has no triangles")
    return TriangleMesh(v.astype(np.float32), t)


def unique_rows_int(q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(first_indices, inverse) for unique rows of an int matrix.

    Same contract as np.unique(q, axis=0, return_index=True,
    return_inverse=True)[1:], but via lexsort — np.unique's axis=0 path
    sorts a void view and measured ~10 s across Bottle.tcl's welds."""
    if len(q) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    order = np.lexsort(q.T[::-1])
    qs = q[order]
    new_group = np.empty(len(q), bool)
    new_group[0] = True
    np.any(qs[1:] != qs[:-1], axis=1, out=new_group[1:])
    gid_sorted = np.cumsum(new_group) - 1
    inv = np.empty(len(q), np.int64)
    inv[order] = gid_sorted
    first = order[new_group]
    return first, inv


def weld_vertices(verts: np.ndarray, tris: np.ndarray,
                  tol: float = _MERGE_TOL) -> Tuple[np.ndarray, np.ndarray]:
    """Merge coincident vertices (quantized hash) and drop degenerates."""
    if len(verts) == 0:
        return verts, tris
    scale = max(float(np.max(np.ptp(verts, axis=0))), 1e-9)
    q = np.round(verts / (tol * scale)).astype(np.int64)
    first, inv = unique_rows_int(q)
    nv = verts[first]
    nt = inv[tris]
    ok = ((nt[:, 0] != nt[:, 1]) & (nt[:, 1] != nt[:, 2])
          & (nt[:, 0] != nt[:, 2]))
    return nv, nt[ok].astype(np.int32)

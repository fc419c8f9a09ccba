"""Generative modeling operations: prism, revol, loft, guided sweeps,
offsets, fillets, text.

Reference capability: the OCCT construction commands driven by
data/scripts/{Bottle,Cpu,Cutter,Drill,Shape}.tcl — `prism`,
`thrusections`, `mksweep`/`setsweep -G`/`addsweep`/`buildsweep`,
`mkoffset`, `offsetshape`, `blend`, `chfi2d`, `text2brep`. All outputs
are SolidShape meshes (topo.py) ready for the CSG core and the
renderer.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cadrays_tpu.modeling.curves import Circle, Curve, Polyline
from cadrays_tpu.modeling.surfaces import Plane
from cadrays_tpu.modeling.topo import (CompoundShape, EdgeShape, FaceShape,
                                       Shape, SolidShape, WireShape,
                                       chain_polylines, shape_mesh,
                                       weld_vertices)
from cadrays_tpu.modeling.triangulate import signed_area, triangulate


def _signed_volume(verts: np.ndarray, tris: np.ndarray) -> float:
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    return float(np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2)))) / 6.0


def _fix_orientation(verts, tris) -> np.ndarray:
    if _signed_volume(verts, tris) < 0:
        return tris[:, [0, 2, 1]]
    return tris


# ---------------------------------------------------------------------------
# prism
# ---------------------------------------------------------------------------


def prism(face: FaceShape, vec) -> SolidShape:
    """Linear extrusion of a planar face (DRAW `prism`, Bottle.tcl:36).

    Face ids: 0..L-1 lateral (one per outer-loop edge when the face
    kept per-edge identity, else one per loop), then top, then bottom —
    matching the cylinder convention that `explode <prism> f` lists the
    walls first (Bottle.tcl `explode c f` uses c_2 = top disk)."""
    d = np.asarray(vec, np.float64)
    v2d, t2d = face.mesh()
    if len(t2d) == 0:
        raise ValueError("prism of empty face")
    nv = len(v2d)
    verts = [v2d, v2d + d]
    up = float(np.dot(face.plane.normal, d)) >= 0
    bottom_t = t2d[:, [0, 2, 1]] if up else t2d
    top_t = (t2d if up else t2d[:, [0, 2, 1]]) + nv

    # lateral walls per loop (or per recorded 2D edge for identity).
    # Winding normalized so the uniform quad rule yields outward-facing
    # walls: outer loops CCW, holes CW.
    outers, holes = face.outer_and_holes()

    def _norm(loop, is_hole):
        a = signed_area(loop)
        if (a < 0) != is_hole:
            return loop[::-1]
        return loop

    # each wall: (2D polyline, flip_quads)
    wall_sets: List[Tuple[np.ndarray, bool]] = []
    if face.edges2d:
        ring = np.concatenate([np.asarray(e, np.float64)[:-1]
                               for e in face.edges2d])
        flip = signed_area(ring) < 0  # wire ran CW: mirror the quad rule
        wall_sets = [(np.asarray(e, np.float64), flip)
                     for e in face.edges2d]
        wall_sets += [(np.concatenate([h, h[:1]]), False)
                      for h in (_norm(h, True) for h in holes)]
    else:
        # Split each loop into smooth runs at sharp 2D corners so every
        # run becomes its own lateral face — OCCT prisms make one face
        # per profile edge, and the scripts explode/color them
        # individually (Cpu.tcl `foreach f [explode board f]`).
        norm_loops = [_norm(o, False) for o in outers] \
            + [_norm(h, True) for h in holes]
        wall_sets = []
        for l in norm_loops:
            for run in _split_loop_at_corners(l):
                wall_sets.append((run, False))

    tris = [bottom_t, top_t]
    fids = []
    n_wall = len(wall_sets)
    off = 2 * nv
    feature_edges: List[EdgeShape] = []
    for wi, (poly2, flip) in enumerate(wall_sets):
        p3 = face.plane.to_3d(poly2)
        p3 = p3 @ face.loc[:3, :3].T + face.loc[:3, 3]
        m = len(p3)
        verts += [p3, p3 + d]
        quad = []
        for i in range(m - 1):
            a, b = off + i, off + i + 1
            c, e = off + m + i, off + m + i + 1
            if flip != (not up):
                quad += [[a, e, b], [a, c, e]]
            else:
                quad += [[a, b, e], [a, e, c]]
        tris.append(np.asarray(quad, np.int32))
        fids.append(np.full(len(quad), wi, np.int32))
        off += 2 * m
        feature_edges.append(EdgeShape(Polyline(p3)))
        feature_edges.append(EdgeShape(Polyline(p3 + d)))
    # vertical feature edges at wall junctions
    for poly2, _ in wall_sets:
        p0 = face.plane.to_3d(poly2[:1])[0]
        p0 = face.loc[:3, :3] @ p0 + face.loc[:3, 3]
        feature_edges.append(EdgeShape(Polyline(np.stack([p0, p0 + d]))))

    face_id = np.concatenate([
        np.full(len(bottom_t), n_wall + 1, np.int32),  # bottom
        np.full(len(top_t), n_wall, np.int32),         # top
        *fids,
    ])
    all_v = np.concatenate(verts)
    all_t = np.concatenate([bottom_t, top_t] + tris[2:])
    all_v, all_t, face_id = _weld_faces(all_v, all_t, face_id)
    all_t = _fix_orientation(all_v, all_t)
    return SolidShape(all_v, all_t, face_id, feature_edges=feature_edges)


def _split_loop_at_corners(loop: np.ndarray,
                           angle_deg: float = 30.0) -> List[np.ndarray]:
    """Closed 2D loop -> smooth runs split at sharp corners (each run a
    polyline with shared endpoints; arcs stay in one run)."""
    n = len(loop)
    if n < 3:
        return [np.concatenate([loop, loop[:1]])]
    prev = loop - np.roll(loop, 1, axis=0)
    nxt = np.roll(loop, -1, axis=0) - loop
    ln_p = np.linalg.norm(prev, axis=1)
    ln_n = np.linalg.norm(nxt, axis=1)
    cosang = np.einsum("ij,ij->i", prev, nxt) / np.maximum(ln_p * ln_n,
                                                           1e-20)
    sharp = cosang < math.cos(math.radians(angle_deg))
    idx = np.flatnonzero(sharp)
    if len(idx) < 2:
        return [np.concatenate([loop, loop[:1]])]
    runs = []
    for k in range(len(idx)):
        a = idx[k]
        b = idx[(k + 1) % len(idx)]
        if b > a:
            runs.append(loop[a:b + 1])
        else:
            runs.append(np.concatenate([loop[a:], loop[:b + 1]]))
    return runs


def _weld_faces(v, t, f, tol=1e-9):
    from cadrays_tpu.modeling.topo import unique_rows_int

    scale = max(float(np.max(np.ptp(v, axis=0))), 1e-9)
    q = np.round(v / (tol * scale * 10)).astype(np.int64)
    first, inv = unique_rows_int(q)
    nv = v[first]
    nt = inv[t]
    ok = ((nt[:, 0] != nt[:, 1]) & (nt[:, 1] != nt[:, 2])
          & (nt[:, 0] != nt[:, 2]))
    return nv, nt[ok].astype(np.int32), f[ok]


def cylinder_solid(radius: float, height: float,
                   plane: Optional[Plane] = None, n: int = 64) -> SolidShape:
    """pcylinder: solid cylinder on a plane placement (axis = normal)."""
    pl = plane or Plane()
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    loop = np.stack([np.cos(ang), np.sin(ang)], axis=-1) * radius
    face = FaceShape(pl, [loop])
    s = prism(face, pl.normal * height)
    return s


def cone_solid(r1: float, r2: float, height: float,
               plane: Optional[Plane] = None, n: int = 64) -> SolidShape:
    """pcone: solid cone/frustum (r1 at base, r2 at top)."""
    pl = plane or Plane()
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    b3 = pl.to_3d(ring * max(r1, 1e-9))
    t3 = pl.to_3d(ring * max(r2, 1e-9)) + pl.normal * height
    verts = [b3, t3]
    quad = []
    m = n
    for i in range(m):
        j = (i + 1) % m
        quad += [[i, j, m + j], [i, m + j, m + i]]
    tris = [np.asarray(quad, np.int32)]
    fids = [np.zeros(len(quad), np.int32)]
    # caps
    _, capt = triangulate(ring)
    if r2 > 1e-9:
        tris.append(capt + m)
        fids.append(np.full(len(capt), 1, np.int32))
    else:
        pass  # apex degenerates; quads above already close it approximately
    if r1 > 1e-9:
        tris.append(capt[:, [0, 2, 1]])
        fids.append(np.full(len(capt), 2, np.int32))
    v = np.concatenate(verts)
    t = np.concatenate(tris)
    f = np.concatenate(fids)
    v, t, f = _weld_faces(v, t, f)
    t2 = _fix_orientation(v, t)
    if t2 is not t:
        pass
    return SolidShape(v, t2, f)


# ---------------------------------------------------------------------------
# revol / loft / sweep
# ---------------------------------------------------------------------------


def revol(face: FaceShape, origin, axis, angle_deg: float = 360.0,
          n: int = 64) -> SolidShape:
    """Revolve a planar face about an axis (DRAW `revol`)."""
    o = np.asarray(origin, np.float64)
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    full = abs(angle_deg - 360.0) < 1e-9 or abs(angle_deg + 360.0) < 1e-9
    steps = max(3, int(n * abs(angle_deg) / 360.0))
    angles = np.linspace(0, math.radians(angle_deg), steps + 1)

    v0, t0 = face.mesh()
    rings = []
    for th in angles[:-1] if full else angles:
        c, s = math.cos(th), math.sin(th)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                      [-a[1], a[0], 0]])
        R = np.eye(3) + s * K + (1 - c) * (K @ K)
        rings.append((v0 - o) @ R.T + o)
    sections = np.stack(rings)  # (S, V, 3)

    # boundary edges of the face triangulation drive the walls
    edges = _boundary_edges(t0)
    verts = sections.reshape(-1, 3)
    V = len(v0)
    S = len(rings)
    tris = []
    for k in range(S if full else S - 1):
        k2 = (k + 1) % S
        for (i, j) in edges:
            tris += [[k * V + i, k2 * V + i, k2 * V + j],
                     [k * V + i, k2 * V + j, k * V + j]]
    tris = np.asarray(tris, np.int32)
    if not full:
        tris = np.concatenate([tris, t0[:, [0, 2, 1]],
                               t0 + (S - 1) * V])
    v, t = weld_vertices(verts, tris)
    t = _fix_orientation(v, t)
    return SolidShape(v, t)


def _boundary_edges(tris: np.ndarray) -> List[Tuple[int, int]]:
    from collections import Counter

    cnt = Counter()
    for tri in tris:
        for k in range(3):
            e = (int(tri[k]), int(tri[(k + 1) % 3]))
            cnt[tuple(sorted(e))] += 1
    out = []
    for tri in tris:
        for k in range(3):
            i, j = int(tri[k]), int(tri[(k + 1) % 3])
            if cnt[tuple(sorted((i, j)))] == 1:
                out.append((i, j))
    return out


def _resample_open(pts: np.ndarray, n: int) -> np.ndarray:
    """Arc-length resample an open polyline to n points (both ends kept)."""
    p = np.asarray(pts, np.float64)
    seg = np.linalg.norm(np.diff(p, axis=0), axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = max(cum[-1], 1e-15)
    t = np.linspace(0, total, n)
    idx = np.clip(np.searchsorted(cum, t, side="right") - 1, 0, len(seg) - 1)
    f = (t - cum[idx]) / np.maximum(seg[idx], 1e-15)
    return p[idx] + f[:, None] * (p[idx + 1] - p[idx])


def _resample_closed(pts: np.ndarray, n: int) -> np.ndarray:
    """Arc-length resample a closed loop to n points."""
    p = np.asarray(pts, np.float64)
    loop = np.concatenate([p, p[:1]])
    seg = np.linalg.norm(np.diff(loop, axis=0), axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    t = np.linspace(0, total, n, endpoint=False)
    idx = np.clip(np.searchsorted(cum, t, side="right") - 1, 0,
                  len(seg) - 1)
    f = (t - cum[idx]) / np.maximum(seg[idx], 1e-15)
    return loop[idx] + f[:, None] * (loop[idx + 1] - loop[idx])


def _align_loops(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cyclic-shift (and possibly reverse) b to best match a."""
    n = len(a)
    best = None
    best_d = np.inf
    for bb in (b, b[::-1]):
        # coarse search over offsets
        for off in range(n):
            d = float(np.sum((a - np.roll(bb, -off, axis=0)) ** 2))
            if d < best_d:
                best_d = d
                best = np.roll(bb, -off, axis=0)
    return best


def loft(loops3d: Sequence[np.ndarray], solid: bool = True,
         ruled: bool = True, n: Optional[int] = None) -> SolidShape:
    """Loft through closed 3D sections (DRAW `thrusections`)."""
    if len(loops3d) < 2:
        raise ValueError("thrusections needs at least two sections")
    n = n or max(max(len(l) for l in loops3d), 32)
    secs = [_resample_closed(np.asarray(l, np.float64), n) for l in loops3d]
    for k in range(1, len(secs)):
        secs[k] = _align_loops(secs[k - 1], secs[k])
    S = len(secs)
    verts = np.concatenate(secs)
    tris = []
    for k in range(S - 1):
        for i in range(n):
            j = (i + 1) % n
            a, b = k * n + i, k * n + j
            c, d = (k + 1) * n + i, (k + 1) * n + j
            tris += [[a, b, d], [a, d, c]]
    tris = np.asarray(tris, np.int32)
    fids = [np.zeros(len(tris), np.int32)]
    if solid:
        c0 = _cap(secs[0], 0, flip=True)
        c1 = _cap(secs[-1], (S - 1) * n, flip=False)
        tris = np.concatenate([tris, c0, c1])
        fids += [np.full(len(c0), 1, np.int32),
                 np.full(len(c1), 2, np.int32)]
    fid = np.concatenate(fids)
    v, t, fid = _weld_faces(verts, tris, fid, tol=1e-8)
    t2 = _fix_orientation(v, t)
    return SolidShape(v, t2, fid)


def _cap(loop3: np.ndarray, offset: int, flip: bool) -> np.ndarray:
    """Cap a (possibly non-planar) closed section with a best-fit-plane
    triangulation."""
    c = loop3.mean(axis=0)
    A = loop3 - c
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    ex, ey = vt[0], vt[1]
    uv = np.stack([A @ ex, A @ ey], axis=-1)
    _, t = triangulate(uv)
    if len(t) == 0:
        return np.zeros((0, 3), np.int32)
    if flip:
        t = t[:, [0, 2, 1]]
    return (t + offset).astype(np.int32)


class SweepBuilder:
    """The mksweep/setsweep/addsweep/buildsweep pipeline (Cutter.tcl:44-56,
    Drill.tcl:33-41).

    Supported mode: straight (or mildly curved) spine with an optional
    guide curve (`setsweep -G`): the guide's azimuth about the spine at
    each station rotates the profile — exactly how the scripts build
    their helical flutes."""

    def __init__(self, spine_pts: np.ndarray):
        self.spine = np.asarray(spine_pts, np.float64)
        self.guide: Optional[np.ndarray] = None
        self.sections: List[np.ndarray] = []  # world-space closed loops

    def set_guide(self, guide_pts: np.ndarray) -> None:
        self.guide = np.asarray(guide_pts, np.float64)

    def add_section(self, loop3d: np.ndarray) -> None:
        self.sections.append(np.asarray(loop3d, np.float64))

    def build(self, solid: bool = True, steps: int = 128,
              n: Optional[int] = None) -> SolidShape:
        if not self.sections:
            raise ValueError("buildsweep without addsweep sections")
        # spine stations by arc length
        sp = self.spine
        seg = np.linalg.norm(np.diff(sp, axis=0), axis=-1)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        total = cum[-1]
        s_t = np.linspace(0, total, steps + 1)
        idx = np.clip(np.searchsorted(cum, s_t, side="right") - 1, 0,
                      len(seg) - 1)
        f = (s_t - cum[idx]) / np.maximum(seg[idx], 1e-15)
        P = sp[idx] + f[:, None] * (sp[idx + 1] - sp[idx])
        T = sp[idx + 1] - sp[idx]
        T = T / np.maximum(np.linalg.norm(T, axis=-1, keepdims=True), 1e-15)

        # frame: parallel transport from an initial (ex, ey)
        ex = np.zeros_like(T)
        ey = np.zeros_like(T)
        ref = np.array([1.0, 0.0, 0.0])
        if abs(np.dot(ref, T[0])) > 0.9:
            ref = np.array([0.0, 1.0, 0.0])
        e = ref - T[0] * np.dot(ref, T[0])
        e /= np.linalg.norm(e)
        ex[0] = e
        ey[0] = np.cross(T[0], e)
        for k in range(1, len(T)):
            e = ex[k - 1] - T[k] * np.dot(ex[k - 1], T[k])
            nrm = np.linalg.norm(e)
            e = ex[k - 1] if nrm < 1e-12 else e / nrm
            ex[k] = e
            ey[k] = np.cross(T[k], e)

        # guide rotation per station
        theta = np.zeros(len(P))
        if self.guide is not None:
            g = self.guide
            for k in range(len(P)):
                # guide point nearest the normal plane of station k
                dist = np.abs((g - P[k]) @ T[k])
                gi = int(np.argmin(dist))
                rel = g[gi] - P[k]
                theta[k] = math.atan2(float(rel @ ey[k]),
                                      float(rel @ ex[k]))
            theta = np.unwrap(theta)
            theta -= theta[0]

        # sections -> (station, 2D loop in untwisted frame). Open
        # sections (Drill.tcl sweeps a single lip line) produce an open
        # swept sheet instead of a closed tube.
        # a closed section arrives with its first point repeated at the
        # end (add_section contract)
        closed_sec = all(
            np.linalg.norm(s[0] - s[-1])
            < 1e-6 * max(float(np.max(np.ptp(s, axis=0))), 1e-9)
            for s in self.sections)
        placed = []
        npt = n or max(max(len(s) for s in self.sections), 48)
        for loop in self.sections:
            c = loop.mean(axis=0)
            s_i = float(np.clip((c - sp[0]) @ T[0], 0, total))
            k = int(np.argmin(np.abs(s_t - s_i)))
            rel = loop - P[k]
            uv = np.stack([rel @ ex[k], rel @ ey[k]], axis=-1)
            th = theta[k]
            rot = np.array([[math.cos(-th), -math.sin(-th)],
                            [math.sin(-th), math.cos(-th)]])
            uv = uv @ rot.T
            placed.append((s_i, _resample_closed(uv, npt) if closed_sec
                           else _resample_open(uv, npt)))
        placed.sort(key=lambda x: x[0])
        for k in range(1, len(placed)):
            placed[k] = (placed[k][0],
                         _align_loops(placed[k - 1][1], placed[k][1]))

        stations_s = [p[0] for p in placed]
        loops_uv = [p[1] for p in placed]

        secs3 = []
        for k in range(len(P)):
            s = s_t[k]
            if s <= stations_s[0]:
                uv = loops_uv[0]
            elif s >= stations_s[-1]:
                uv = loops_uv[-1]
            else:
                j = int(np.searchsorted(stations_s, s)) - 1
                j = max(0, min(j, len(stations_s) - 2))
                w = (s - stations_s[j]) / max(
                    stations_s[j + 1] - stations_s[j], 1e-15)
                uv = (1 - w) * loops_uv[j] + w * loops_uv[j + 1]
            th = theta[k]
            rot = np.array([[math.cos(th), -math.sin(th)],
                            [math.sin(th), math.cos(th)]])
            uvr = uv @ rot.T
            secs3.append(P[k] + uvr[:, 0:1] * ex[k] + uvr[:, 1:2] * ey[k])

        S = len(secs3)
        verts = np.concatenate(secs3)
        tris = []
        n_conn = npt if closed_sec else npt - 1
        for k in range(S - 1):
            for i in range(n_conn):
                j = (i + 1) % npt
                a, b = k * npt + i, k * npt + j
                c2, d2 = (k + 1) * npt + i, (k + 1) * npt + j
                tris += [[a, b, d2], [a, d2, c2]]
        tris = np.asarray(tris, np.int32)
        if solid and closed_sec:
            tris = np.concatenate([
                tris, _cap(secs3[0], 0, flip=True),
                _cap(secs3[-1], (S - 1) * npt, flip=False)])
        v, t = weld_vertices(verts, tris)
        if closed_sec:
            t = _fix_orientation(v, t)
        return SolidShape(v, t)


# ---------------------------------------------------------------------------
# offsets
# ---------------------------------------------------------------------------


def offset_face_loops(face: FaceShape, dist: float,
                      grid: int = 768) -> List[np.ndarray]:
    """2D offset of a planar face's region (DRAW `mkoffset`).

    Contour of the face's signed distance field at level `dist`
    (negative = inward), extracted with contourpy — robust to topology
    changes (slots splitting the offset region, Cpu.tcl:21)."""
    import contourpy
    from matplotlib.path import Path

    outers, holes = face.outer_and_holes()
    allp = np.concatenate(outers + holes) if outers else np.zeros((1, 2))
    lo = allp.min(axis=0) - 2 * abs(dist) - 1e-6
    hi = allp.max(axis=0) + 2 * abs(dist) + 1e-6
    xs = np.linspace(lo[0], hi[0], grid)
    ys = np.linspace(lo[1], hi[1], grid)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)

    inside = np.zeros(len(pts), bool)
    for o in outers:
        inside |= Path(o).contains_points(pts)
    for h in holes:
        inside &= ~Path(h).contains_points(pts)

    # unsigned distance to the boundary: kd-tree over a densified
    # boundary sampling (resolution-matched, so the contour at |dist|
    # is accurate to ~half a grid cell)
    from scipy.spatial import cKDTree

    cell = float(np.max(hi - lo)) / grid
    bpts = []
    for loop in outers + holes:
        a = loop
        b = np.roll(loop, -1, axis=0)
        seg_len = np.linalg.norm(b - a, axis=1)
        for i in range(len(a)):
            n_sub = max(int(seg_len[i] / (0.5 * cell)), 1)
            t = np.linspace(0.0, 1.0, n_sub, endpoint=False)
            bpts.append(a[i] + t[:, None] * (b[i] - a[i]))
    tree = cKDTree(np.concatenate(bpts))
    d, _ = tree.query(pts, workers=-1)
    sdf = np.where(inside, -d, d).reshape(grid, grid)

    gen = contourpy.contour_generator(X, Y, sdf)
    lines = gen.lines(-abs(dist) if dist < 0 else -(-dist))
    # contourpy returns list of (N, 2) arrays; decimate — raw grid
    # contours carry ~1000 nearly collinear points and boolean cost is
    # quadratic in polygon count
    from cadrays_tpu.modeling.triangulate import decimate_polyline

    span = float(np.max(hi - lo))
    loops = []
    for seg in lines:
        seg = np.asarray(seg, np.float64)
        if len(seg) >= 3:
            if np.linalg.norm(seg[0] - seg[-1]) < 1e-9:
                seg = seg[:-1]
            loops.append(decimate_polyline(seg, 5e-4 * span, closed=True))
    return loops


def vertex_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                  verts[tris[:, 2]] - verts[tris[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, tris[:, k], fn)
    n = np.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / np.maximum(n, 1e-20)


def offset_shape(solid: SolidShape, offset: float,
                 removed_faces: Sequence[SolidShape] = ()) -> SolidShape:
    """Hollow a solid (DRAW `offsetshape r shape off tol removed...`,
    Bottle.tcl:52): negative offset shells inward, removed faces become
    openings."""
    from cadrays_tpu.modeling.csg import SUBTRACT, UNION, solid_boolean

    v, t, f = solid.world_mesh()
    vn = vertex_normals(v, t)
    inner_v = v + vn * (-abs(offset))
    inner = SolidShape(inner_v, t.copy(), f.copy())

    cut = inner
    for rf in removed_faces:
        rv, rt, _ = rf.world_mesh()
        # extrude the removed face region outward along its mean normal
        fn = np.cross(rv[rt[:, 1]] - rv[rt[:, 0]],
                      rv[rt[:, 2]] - rv[rt[:, 0]])
        nmean = fn.sum(axis=0)
        nmean = nmean / max(np.linalg.norm(nmean), 1e-12)
        span = float(np.linalg.norm(v.max(axis=0) - v.min(axis=0)))
        h = 0.1 * span
        ext_v = np.concatenate([rv - nmean * (2 * abs(offset)),
                                rv + nmean * h])
        nvh = len(rv)
        bedges = _boundary_edges(rt)
        walls = []
        for (i, j) in bedges:
            walls += [[i, j, nvh + j], [i, nvh + j, nvh + i]]
        ext_t = np.concatenate([
            rt[:, [0, 2, 1]], rt + nvh,
            np.asarray(walls, np.int32)])
        ev, et = weld_vertices(ext_v, ext_t)
        et = _fix_orientation(ev, et)
        opening = SolidShape(ev, et)
        cut = solid_boolean(cut, opening, UNION)
    return solid_boolean(SolidShape(v, t, f), cut, SUBTRACT)


def _region_loops(segs, eps_rel: float = 1e-6):
    """Directed 2D boundary segments -> closed region loops.

    Handles the two artifacts BSP output carries: T-vertices (a segment's
    interior touching another segment's endpoint — split there) and
    coincident opposite segments from internal double covers (cancelled
    geometrically after splitting). Returns None if loops fail to close.
    """
    from collections import defaultdict

    if not segs:
        return None
    pts = np.concatenate([np.stack([a, b]) for a, b in segs])
    span = max(float(np.max(np.ptp(pts, axis=0))), 1e-12)
    eps = eps_rel * span

    def q(p):
        return (int(round(p[0] / eps)), int(round(p[1] / eps)))

    # unique endpoint cloud
    uniq = {}
    for p in pts:
        uniq.setdefault(q(p), p)
    upts = np.asarray(list(uniq.values()))

    # split segments at interior T-vertices
    sub = []
    for a, b in segs:
        ab = b - a
        L = float(np.linalg.norm(ab))
        if L < eps:
            continue
        d = ab / L
        rel = upts - a
        tproj = rel @ d
        perp = np.abs(rel @ np.array([-d[1], d[0]]))
        on = (perp < eps) & (tproj > eps) & (tproj < L - eps)
        ts = np.sort(tproj[on])
        cur = 0.0
        prev = a
        for tv in list(ts) + [L]:
            nxt_p = a + d * tv
            if tv - cur > eps:
                sub.append((prev, nxt_p))
            prev = nxt_p
            cur = tv

    # geometric cancellation of opposite coincident sub-segments
    bag = defaultdict(int)
    rep = {}
    for a, b in sub:
        ka, kb = q(a), q(b)
        if ka == kb:
            continue
        if bag[(kb, ka)] > 0:
            bag[(kb, ka)] -= 1
        else:
            bag[(ka, kb)] += 1
            rep[ka] = a
            rep[kb] = b

    nxt = defaultdict(list)
    for (ka, kb), c in bag.items():
        for _ in range(c):
            nxt[ka].append(kb)
    loops = []

    def pick_next(prev_k, cur_k):
        """At a junction, take the most-clockwise outgoing segment
        relative to the incoming direction (planar-graph face walk —
        keeps separate loops from being braided together)."""
        outs = nxt[cur_k]
        if len(outs) == 1:
            return outs[0]
        pin = rep[cur_k] - rep[prev_k]
        ain = math.atan2(pin[1], pin[0])
        best = None
        best_turn = None
        for kb in outs:
            po = rep[kb] - rep[cur_k]
            turn = (math.atan2(po[1], po[0]) - ain - math.pi) \
                % (2 * math.pi)
            if best_turn is None or turn < best_turn:
                best_turn = turn
                best = kb
        return best

    while True:
        start = None
        for ka, lst in nxt.items():
            if lst:
                start = ka
                break
        if start is None:
            break
        loop = [start]
        cur = nxt[start].pop()
        ok = True
        for _ in range(len(sub) + 1):
            if cur == start:
                break
            loop.append(cur)
            if not nxt[cur]:
                ok = False
                break
            kb = pick_next(loop[-2], cur)
            nxt[cur].remove(kb)
            cur = kb
        else:
            ok = False
        if not ok or len(loop) < 3:
            continue
        loops.append(np.asarray([rep[k] for k in loop]))
    if not loops:
        return None
    # drop degenerate slivers
    out = [l for l in loops
           if abs(signed_area(l)) > (eps * span) * 4]
    return out or None


def simplify_solid(solid: SolidShape) -> SolidShape:
    """Re-polygonize planar faces shattered by the BSP.

    A boolean clips every polygon of A through B's whole BSP tree, so a
    large planar face ends up as thousands of shards (measured: a 21-tri
    wedge fused with a 3k-tri cylinder ballooned to 64k tris). For each
    planar face-id group this rebuilds the region from its boundary
    loops and re-triangulates; curved faces are left alone."""
    from collections import defaultdict

    v, t, fid = solid.verts, solid.tris, solid.face_id
    if len(t) == 0:
        return solid
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    areas2 = np.linalg.norm(fn, axis=1)
    fn_unit = fn / np.maximum(areas2, 1e-30)[:, None]

    new_tris: List[np.ndarray] = []
    new_fid: List[np.ndarray] = []
    new_verts = [v]
    voff = len(v)
    for f in np.unique(fid):
        sel = np.flatnonzero(fid == f)
        if len(sel) <= 8:
            new_tris.append(t[sel])
            new_fid.append(np.full(len(sel), f, np.int32))
            continue
        # drop sliver shards (BSP splinters + welding leave flipped
        # near-zero-area triangles); planarity judged on the real area
        amax = float(areas2[sel].max())
        ok = sel[areas2[sel] > 1e-9 * amax]
        if len(ok) == 0:
            continue
        nsum = fn[ok].sum(axis=0)
        nn = np.linalg.norm(nsum)
        if nn < 1e-20:
            planar = False
        else:
            nref = nsum / nn
            align = fn_unit[ok] @ nref
            # BSP slivers flip; tolerate a small misaligned area share —
            # the directed boundary cancels their edges exactly
            w_bad = float(areas2[ok][np.abs(align) < 0.99995].sum())
            planar = w_bad < 1e-4 * float(areas2[ok].sum())
        if not planar:
            new_tris.append(t[sel])
            new_fid.append(np.full(len(sel), f, np.int32))
            continue
        # 2D frame for the group
        origin = v[int(t[ok[0], 0])]
        ref = np.array([1.0, 0, 0]) if abs(nref[0]) < 0.9 \
            else np.array([0.0, 1, 0])
        ex = np.cross(ref, nref)
        ex /= np.linalg.norm(ex)
        ey = np.cross(nref, ex)

        def uv(idx):
            rel = v[idx] - origin
            return np.stack([rel @ ex, rel @ ey], axis=-1)

        # directed boundary candidates (combinatorial count-1 edges),
        # flipped triangles contribute reversed direction
        cnt = defaultdict(int)
        for ti2 in ok:
            tri = t[ti2]
            order = (0, 1, 2) if fn_unit[ti2] @ nref > 0 else (0, 2, 1)
            for k in range(3):
                i = int(tri[order[k]])
                j = int(tri[order[(k + 1) % 3]])
                if cnt.get((j, i), 0) > 0:
                    cnt[(j, i)] -= 1
                else:
                    cnt[(i, j)] += 1
        segs2 = [(uv(i), uv(j)) for (i, j), c2 in cnt.items()
                 for _ in range(c2) if c2 > 0]
        loops_uv = _region_loops(segs2)
        if loops_uv is None:
            new_tris.append(t[sel])
            new_fid.append(np.full(len(sel), f, np.int32))
            continue
        outers2 = [l for l in loops_uv if signed_area(l) > 0]
        holes2 = [l for l in loops_uv if signed_area(l) < 0]
        from matplotlib.path import Path

        group_tris = []
        for oi in outers2:
            op = Path(oi)
            hs = [h for h in holes2 if op.contains_point(h.mean(axis=0))]
            v2, tt = triangulate(oi, hs)
            if len(tt) == 0:
                continue
            p3 = origin + v2[:, 0:1] * ex + v2[:, 1:2] * ey
            new_verts.append(p3)
            group_tris.append(tt + voff)
            voff += len(v2)
        if not group_tris:
            new_tris.append(t[sel])
            new_fid.append(np.full(len(sel), f, np.int32))
            continue
        gt = np.concatenate(group_tris).astype(np.int32)
        # orient like the source normal
        av = np.concatenate(new_verts)
        gn = np.cross(av[gt[:, 1]] - av[gt[:, 0]],
                      av[gt[:, 2]] - av[gt[:, 0]]).sum(axis=0)
        if float(gn @ nref) < 0:
            gt = gt[:, [0, 2, 1]]
        new_tris.append(gt)
        new_fid.append(np.full(len(gt), f, np.int32))
    av = np.concatenate(new_verts)
    at = np.concatenate(new_tris)
    af = np.concatenate(new_fid)
    av, at, af = _weld_faces(av, at, af, tol=1e-8)
    out = SolidShape(av, at, af)
    out.loc = solid.loc.copy()
    return out


# ---------------------------------------------------------------------------
# fillets
# ---------------------------------------------------------------------------


def extract_feature_edges(solid: SolidShape, angle_deg: float = 25.0
                          ) -> List[dict]:
    """Feature curves of a solid mesh, chained per face-id pair.

    A mesh edge is a feature when its two triangles belong to different
    faces (topological boundary — how OCCT enumerates edges) or form a
    dihedral sharper than `angle_deg` (creases inside one face id after
    booleans). Chaining is grouped per face pair so `explode <s> e`
    yields one name per topological edge, and Shape.tcl's indexed
    `blend ... _model_161` finds enough edges to address.

    Each entry: {"chain": (N,) vertex ids, "closed": bool}."""
    v, t = solid.verts, solid.tris
    from collections import defaultdict

    fid = solid.face_id
    emap = defaultdict(list)
    for ti, tri in enumerate(t):
        for k in range(3):
            i, j = int(tri[k]), int(tri[(k + 1) % 3])
            emap[(min(i, j), max(i, j))].append(ti)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    cos_th = math.cos(math.radians(angle_deg))
    groups = defaultdict(list)  # (fid_a, fid_b) -> [(i, j)]
    for (i, j), tl in emap.items():
        if len(tl) != 2:
            continue
        fa, fb = int(fid[tl[0]]), int(fid[tl[1]])
        sharp = float(fn[tl[0]] @ fn[tl[1]]) < cos_th
        if fa != fb:
            if not sharp and float(fn[tl[0]] @ fn[tl[1]]) > 0.999:
                # tessellation seam inside a geometrically smooth face
                # pair boundary — still a topological edge
                pass
            groups[(min(fa, fb), max(fa, fb))].append((i, j))
        elif sharp:
            groups[(fa, -1)].append((i, j))

    chains = []
    for pair in sorted(groups):
        segs = groups[pair]
        adj = defaultdict(list)
        for (i, j) in segs:
            adj[i].append(j)
            adj[j].append(i)
        unused = set(segs)
        while unused:
            i, j = next(iter(unused))
            unused.discard((i, j))
            chain = [i, j]
            for _ in range(2):
                while True:
                    last, prev = chain[-1], chain[-2]
                    nxt = None
                    for k in adj[last]:
                        e = (min(last, k), max(last, k))
                        if k != prev and e in unused:
                            nxt = k
                            break
                    if nxt is None:
                        break
                    unused.discard((min(last, nxt), max(last, nxt)))
                    chain.append(nxt)
                chain.reverse()
            closed = chain[0] == chain[-1]
            if closed:
                chain = chain[:-1]
            # split at sharp 3D corners: OCCT edges end at vertices, so a
            # polyline boundary contributes one edge per straight run
            for part, pclosed in _split_chain_at_corners(v, chain, closed):
                chains.append({"chain": np.asarray(part, np.int64),
                               "closed": pclosed})
    # deterministic order: by first world point
    chains.sort(key=lambda c: tuple(np.round(v[c["chain"][0]], 6)))
    return chains


def _split_chain_at_corners(v, chain, closed, angle_deg: float = 40.0):
    pts = v[np.asarray(chain)]
    n = len(pts)
    if n < 3:
        return [(chain, closed)]
    cos_th = math.cos(math.radians(angle_deg))
    corners = []
    rng = range(n) if closed else range(1, n - 1)
    for k in rng:
        a = pts[k] - pts[k - 1]
        b = pts[(k + 1) % n] - pts[k]
        la = np.linalg.norm(a)
        lb = np.linalg.norm(b)
        if la < 1e-12 or lb < 1e-12:
            continue
        if float(a @ b) / (la * lb) < cos_th:
            corners.append(k)
    if not corners:
        return [(chain, closed)]
    out = []
    if closed:
        for c_i in range(len(corners)):
            a = corners[c_i]
            b = corners[(c_i + 1) % len(corners)]
            seg = chain[a:b + 1] if b > a else chain[a:] + chain[:b + 1]
            if len(seg) >= 2:
                out.append((seg, False))
    else:
        bounds = [0] + corners + [n - 1]
        for k in range(len(bounds) - 1):
            seg = chain[bounds[k]:bounds[k + 1] + 1]
            if len(seg) >= 2:
                out.append((seg, False))
    return out


def fillet_edges(solid: SolidShape, blends: List[Tuple[np.ndarray, bool,
                                                       float]],
                 sections: int = 8) -> SolidShape:
    """Round the given feature edges with radius r (DRAW `blend`).

    blends: [(chain vertex ids, closed, radius)]. Convex edges subtract
    a swept corner-minus-cylinder cutter; concave edges add the
    complementary rounding solid — the mesh-level equivalent of OCCT's
    rolling-ball fillet, accurate to the tessellation."""
    from collections import defaultdict

    from cadrays_tpu.modeling.csg import SUBTRACT, UNION, solid_boolean

    v, t = solid.verts, solid.tris
    emap = defaultdict(list)
    for ti, tri in enumerate(t):
        for k in range(3):
            i, j = int(tri[k]), int(tri[(k + 1) % 3])
            emap[(min(i, j), max(i, j))].append(ti)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    cents = v[t].mean(axis=1)

    result = solid
    cutters_sub = []
    cutters_add = []
    for chain, closed, radius in blends:
        cutter = _fillet_cutter(v, t, fn, cents, emap, chain, closed,
                                radius)
        if cutter is None:
            continue
        solid_c, convex = cutter
        (cutters_sub if convex else cutters_add).append(solid_c)
    for c in cutters_add:
        result = solid_boolean(result, c, UNION)
    for c in cutters_sub:
        result = solid_boolean(result, c, SUBTRACT)
    return result


def _fillet_cutter(v, t, fn, cents, emap, chain, closed, radius):
    """Build the swept fillet cutter along one edge chain."""
    pts = v[chain]
    n_seg = len(chain) - (0 if closed else 1)
    if n_seg < 1:
        return None
    # per-vertex face normals from adjacent segment triangles
    n1s, n2s = [], []
    convex_votes = 0
    total = 0
    for k in range(len(chain)):
        segs = []
        if k > 0 or closed:
            a, b = int(chain[k - 1]), int(chain[k])
            segs.append((min(a, b), max(a, b)))
        if k < len(chain) - 1 or closed:
            a, b = int(chain[k]), int(chain[(k + 1) % len(chain)])
            segs.append((min(a, b), max(a, b)))
        ns = []
        for e in segs:
            tl = emap.get(e, [])
            if len(tl) == 2:
                ns.append((fn[tl[0]], fn[tl[1]], tl))
        if not ns:
            return None
        # average the two adjacent faces over the incident segments
        n1 = np.mean([x[0] for x in ns], axis=0)
        n2 = np.mean([x[1] for x in ns], axis=0)
        n1 = n1 / max(np.linalg.norm(n1), 1e-12)
        n2 = n2 / max(np.linalg.norm(n2), 1e-12)
        n1s.append(n1)
        n2s.append(n2)
        # convexity: the other face's centroid below face-1's plane?
        e = ns[0][2]
        c2 = cents[e[1]]
        p = v[chain[k]]
        if float((c2 - p) @ ns[0][0][None].ravel()) < 0:
            convex_votes += 1
        total += 1
    convex = convex_votes * 2 >= total

    xs = []  # cross-section rings
    arcs = 6
    for k in range(len(chain)):
        p = pts[k]
        n1, n2 = n1s[k], n2s[k]
        denom = 1.0 + float(n1 @ n2)
        if denom < 1e-6:
            denom = 1e-6
        c = p - radius * (n1 + n2) / denom
        q1 = c + radius * n1
        q2 = c + radius * n2
        # arc q1 -> q2 around c
        ring = [p + (p - c) * 0.2]  # push the corner point outward a bit
        for a in np.linspace(0, 1, arcs + 1):
            # slerp between n1 and n2
            w1 = math.sin((1 - a) * math.acos(max(min(float(n1 @ n2),
                                                      1.0), -1.0)) + 1e-12)
            w2 = math.sin(a * math.acos(max(min(float(n1 @ n2), 1.0),
                                            -1.0)) + 1e-12)
            nn = w1 * n1 + w2 * n2
            nn = nn / max(np.linalg.norm(nn), 1e-12)
            ring.append(c + radius * nn)
        xs.append(np.asarray(ring))
    S = len(xs)
    m = len(xs[0])
    verts = np.concatenate(xs)
    tris = []
    rng = range(S) if closed else range(S - 1)
    for k in rng:
        k2 = (k + 1) % S
        for i in range(m):
            j = (i + 1) % m
            a, b = k * m + i, k * m + j
            c2, d2 = k2 * m + i, k2 * m + j
            tris += [[a, b, d2], [a, d2, c2]]
    tris = np.asarray(tris, np.int32)
    if not closed:
        tris = np.concatenate([tris, _cap(xs[0], 0, True),
                               _cap(xs[-1], (S - 1) * m, False)])
    vv, tt = weld_vertices(verts, tris)
    if len(tt) == 0:
        return None
    tt = _fix_orientation(vv, tt)
    return SolidShape(vv, tt), convex


# ---------------------------------------------------------------------------
# 2D corner fillets (chfi2d)
# ---------------------------------------------------------------------------


def chfi2d_fillet(face: FaceShape, pairs: List[Tuple[int, int, float]]
                  ) -> FaceShape:
    """Fillet corners of a planar face between edge i and edge j (1-based
    indices into the face's recorded 2D edges) with radius r (DRAW
    `chfi2d ... F r`, Cpu.tcl:33-41)."""
    if not face.edges2d:
        raise ValueError("chfi2d needs a face built from a wire")
    edges = [np.asarray(e, np.float64) for e in face.edges2d]
    ne = len(edges)
    # fillet radius per corner (corner c = junction between edge c and
    # edge (c+1) % ne)
    rad = {}
    for (i, j, r) in pairs:
        a, b = i - 1, j - 1
        if (a + 1) % ne == b:
            rad[a] = r
        elif (b + 1) % ne == a:
            rad[b] = r
        else:
            rad[a] = r
    pts = []
    for ei in range(ne):
        cur = edges[ei]
        pts.append(cur[:-1] if len(cur) > 1 else cur)
        r = rad.get(ei)
        p = cur[-1]
        nxt = edges[(ei + 1) % ne]
        d_in = p - cur[-2] if len(cur) > 1 else p - cur[0]
        d_out = nxt[1] - nxt[0] if len(nxt) > 1 else -d_in
        if r is None or r <= 0:
            continue
        d_in = d_in / max(np.linalg.norm(d_in), 1e-12)
        d_out = d_out / max(np.linalg.norm(d_out), 1e-12)
        cosv = float(np.clip(-d_in @ d_out, -1.0, 1.0))
        ang = math.acos(cosv)
        if ang < 1e-3:
            continue
        dist = r / math.tan(ang / 2)
        p1 = p - d_in * dist
        p2 = p + d_out * dist
        # arc center
        bis = (d_out - d_in)
        bis = bis / max(np.linalg.norm(bis), 1e-12)
        c = p + bis * (r / math.sin(ang / 2))
        a1 = math.atan2(p1[1] - c[1], p1[0] - c[0])
        a2 = math.atan2(p2[1] - c[1], p2[0] - c[0])
        # shorter way
        da = (a2 - a1 + math.pi) % (2 * math.pi) - math.pi
        tt = np.linspace(0, 1, 8)
        arc = np.stack([c[0] + r * np.cos(a1 + da * tt),
                        c[1] + r * np.sin(a1 + da * tt)], axis=-1)
        # replace the corner: trim the tail of current edge, head of next
        pts[-1] = _trim_tail(pts[-1], p, dist)
        pts.append(arc)
        edges[(ei + 1) % ne] = _trim_head(nxt, p, dist)
    loop = np.concatenate(pts)
    return FaceShape(face.plane, [loop])


def _trim_tail(poly, corner, dist):
    out = list(poly)
    while len(out) > 1 and np.linalg.norm(out[-1] - corner) < dist:
        out.pop()
    return np.asarray(out)


def _trim_head(poly, corner, dist):
    out = list(poly)
    while len(out) > 1 and np.linalg.norm(out[0] - corner) < dist:
        out.pop(0)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def text_faces(text: str, height: float, font: Optional[str] = None,
               bold: bool = False, pos=(0, 0, 0),
               valign: str = "bottom") -> CompoundShape:
    """Text outlines as planar faces on z=const (DRAW `text2brep`,
    Bottle.tcl:88, Cpu.tcl:62-66). Glyph outlines come from matplotlib's
    font machinery (TextPath), holes resolved by containment."""
    from matplotlib.font_manager import FontProperties
    from matplotlib.path import Path
    from matplotlib.textpath import TextPath

    fp = FontProperties(family=font or "DejaVu Sans",
                        weight="bold" if bold else "normal")
    lines = text.split("\n")
    faces: List[FaceShape] = []
    pos = np.asarray(pos, np.float64)
    line_h = height * 1.3
    y0 = 0.0
    if valign == "topfirstline":
        y0 = -height
    for li, line in enumerate(lines):
        if not line.strip():
            continue
        tp = TextPath((0, 0), line, size=height, prop=fp)
        polys = [np.asarray(p, np.float64)
                 for p in tp.to_polygons(closed_only=True) if len(p) >= 3]
        if not polys:
            continue
        offset = np.array([0.0, y0 - li * line_h])
        polys = [p + offset for p in polys]
        # group outers and their holes by containment depth
        paths = [Path(p) for p in polys]
        depth = []
        for i, p in enumerate(polys):
            d = sum(1 for j, q in enumerate(paths)
                    if j != i and q.contains_point(p[0] + (p.mean(0)
                                                           - p[0]) * 1e-3))
            depth.append(d)
        plane = Plane(origin=pos, normal=(0, 0, 1), xdir=(1, 0, 0))
        for i, p in enumerate(polys):
            if depth[i] % 2 == 0:
                holes = [polys[j] for j in range(len(polys))
                         if depth[j] == depth[i] + 1
                         and paths[i].contains_point(polys[j].mean(axis=0))]
                faces.append(FaceShape(plane, [p] + holes))
    return CompoundShape(faces)

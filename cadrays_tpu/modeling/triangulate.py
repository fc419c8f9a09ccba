"""2D polygon triangulation (ear clipping with hole bridging).

Used to mesh planar faces (`mkplane`/`mkface`) and prism caps. Input
loops are point arrays; the outer loop may wind either way (normalized
to CCW), holes to CW. Holes are joined to the outer loop with bridge
edges (David Eberly's max-x visibility method), then the resulting
simple polygon is ear-clipped. O(n^2) — fine for script-scale faces.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _dedupe(loop: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicates and a duplicated closing point."""
    pts = np.asarray(loop, np.float64)
    if len(pts) > 1 and np.allclose(pts[0], pts[-1], atol=1e-12):
        pts = pts[:-1]
    keep = [0]
    for i in range(1, len(pts)):
        if np.linalg.norm(pts[i] - pts[keep[-1]]) > 1e-12:
            keep.append(i)
    if len(keep) > 1 and np.linalg.norm(pts[keep[0]] - pts[keep[-1]]) <= 1e-12:
        keep.pop()
    return pts[keep]


def _point_in_triangle(p, a, b, c, eps=1e-12):
    d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    d2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
    d3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
    has_neg = (d1 < -eps) or (d2 < -eps) or (d3 < -eps)
    has_pos = (d1 > eps) or (d2 > eps) or (d3 > eps)
    return not (has_neg and has_pos)


def _bridge_hole(outer: np.ndarray, hole: np.ndarray) -> np.ndarray:
    """Merge one CW hole into a CCW outer polygon with a bridge edge."""
    # hole vertex with max x
    hi = int(np.argmax(hole[:, 0]))
    hp = hole[hi]
    # find visible outer vertex: ray +x from hp, closest intersected edge
    best_t = np.inf
    best_edge = -1
    n = len(outer)
    for i in range(n):
        a, b = outer[i], outer[(i + 1) % n]
        if (a[1] > hp[1]) == (b[1] > hp[1]):
            continue
        t = a[0] + (hp[1] - a[1]) / (b[1] - a[1]) * (b[0] - a[0])
        if t >= hp[0] - 1e-12 and t < best_t:
            best_t = t
            best_edge = i
    if best_edge < 0:  # hole not inside outer (degenerate); append raw
        best_edge = int(np.argmin(np.linalg.norm(outer - hp, axis=1)))
        vis = best_edge
    else:
        a, b = outer[best_edge], outer[(best_edge + 1) % n]
        vis = best_edge if a[0] > b[0] else (best_edge + 1) % n
        # prefer a reflex-free connection: check no outer vertex inside
        # the triangle (hp, (best_t, hp.y), outer[vis])
        ip = np.array([best_t, hp[1]])
        cand = vis
        best_d = np.inf
        for j in range(n):
            p = outer[j]
            if p[0] >= hp[0] and _point_in_triangle(p, hp, ip, outer[vis]):
                d = abs(np.arctan2(p[1] - hp[1], p[0] - hp[0]))
                if d < best_d:
                    best_d = d
                    cand = j
        vis = cand
    merged = np.concatenate([
        outer[: vis + 1],
        hole[np.r_[hi:len(hole), 0:hi + 1]],
        outer[vis:],
    ])
    return merged


def decimate_polyline(pts: np.ndarray, tol: float,
                      closed: bool = True) -> np.ndarray:
    """Douglas-Peucker polyline simplification (any dimension).

    Contour-grid and cross-section outputs carry hundreds of nearly
    collinear points; the BSP boolean cost is quadratic in polygon
    count, so decimating to `tol` before downstream ops is a large
    constant-factor win."""
    pts = np.asarray(pts, np.float64)
    if len(pts) <= 3:
        return pts
    if closed:
        # split at the two farthest-apart anchor points
        i0 = 0
        d = np.linalg.norm(pts - pts[i0], axis=1)
        i1 = int(np.argmax(d))
        a = _dp(pts[np.r_[i0:i1 + 1]], tol)
        b = _dp(pts[np.r_[i1:len(pts), 0:1]], tol)
        out = np.concatenate([a[:-1], b[:-1]])
        return out if len(out) >= 3 else pts
    return _dp(pts, tol)


def _dp(pts: np.ndarray, tol: float) -> np.ndarray:
    if len(pts) <= 2:
        return pts
    a, b = pts[0], pts[-1]
    ab = b - a
    L2 = float(ab @ ab)
    if L2 < 1e-30:
        d = np.linalg.norm(pts - a, axis=1)
    else:
        t = np.clip((pts - a) @ ab / L2, 0.0, 1.0)
        proj = a + t[:, None] * ab
        d = np.linalg.norm(pts - proj, axis=1)
    i = int(np.argmax(d))
    if d[i] <= tol:
        return np.stack([a, b])
    left = _dp(pts[: i + 1], tol)
    right = _dp(pts[i:], tol)
    return np.concatenate([left[:-1], right])


def triangulate(outer: Sequence, holes: Sequence = ()) -> Tuple[
        np.ndarray, np.ndarray]:
    """Triangulate a polygon with holes.

    Returns (verts (V, 2) float64, tris (T, 3) int32) with CCW triangles.
    """
    outer = _dedupe(np.asarray(outer, np.float64))
    if len(outer) < 3:
        return outer.reshape(-1, 2), np.zeros((0, 3), np.int32)
    if signed_area(outer) < 0:
        outer = outer[::-1]
    hs = []
    for h in holes:
        h = _dedupe(np.asarray(h, np.float64))
        if len(h) < 3:
            continue
        if signed_area(h) > 0:
            h = h[::-1]
        hs.append(h)
    # bridge holes right-to-left (by max x) so bridges don't cross
    hs.sort(key=lambda h: -float(np.max(h[:, 0])))
    poly = outer
    for h in hs:
        poly = _bridge_hole(poly, h)

    verts = poly
    tris = _ear_clip_native(verts)
    if tris is not None:
        return verts, tris

    n = len(verts)
    idx = list(range(n))
    tris: List[Tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        found = False
        m = len(idx)
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = verts[i0], verts[i1], verts[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) \
                - (b[1] - a[1]) * (c[0] - a[0])
            if cross <= 1e-14:
                continue
            ear = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _point_in_triangle(verts[j], a, b, c, eps=-1e-12):
                    ear = False
                    break
            if ear:
                tris.append((i0, i1, i2))
                idx.pop(k)
                found = True
                break
        if not found:
            # numeric degeneracy: clip the least-reflex corner and go on
            best_k, best_cross = 0, -np.inf
            m = len(idx)
            for k in range(m):
                i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
                a, b, c = verts[i0], verts[i1], verts[i2]
                cross = (b[0] - a[0]) * (c[1] - a[1]) \
                    - (b[1] - a[1]) * (c[0] - a[0])
                if cross > best_cross:
                    best_cross = cross
                    best_k = k
            k = best_k
            m = len(idx)
            tris.append((idx[(k - 1) % m], idx[k], idx[(k + 1) % m]))
            idx.pop(k)
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return verts, np.asarray(tris, np.int32)


def _ear_clip_native(verts: np.ndarray):
    """C++ ear clip (same algorithm/tolerances as the python loop below);
    returns tris or None when the native library is unavailable."""
    try:
        from cadrays_tpu.modeling.csg import _load
    except Exception:
        return None
    try:
        lib = _load()
    except Exception:
        return None
    import ctypes

    v = np.ascontiguousarray(verts, np.float64)
    n = len(v)
    out = np.empty((max(n - 2, 1), 3), np.int32)
    P = ctypes.POINTER
    nt = lib.crt_ear_clip(v.ctypes.data_as(P(ctypes.c_double)), n,
                          out.ctypes.data_as(P(ctypes.c_int32)))
    if nt < 0:
        return None
    return out[:nt].copy()

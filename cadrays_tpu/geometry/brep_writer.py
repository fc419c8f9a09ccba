"""OCCT text .brep WRITER — the inverse of geometry/brep.py's reader.

Capability contract: the reference persists CAD shapes as
`shapes/<name>.brep` + `restore` on scene export so parametric identity
survives the round-trip (src/ImportExport/ImportExport.cxx:69-81). Here
modeling-kernel shapes (mesh-backed solids with face ids; planar
FaceShapes; compounds of either) are serialized as genuine topology:
one analytic surface per face, boundary wires of line edges with 3D
curves + pcurves for planar faces, shells/solids/compounds — the exact
dialect `parse_brep` consumes, and a valid "CASCADE Topology V1" subset.

Curved faces: the modeling kernel is mesh-backed, so the writer
*recovers* the analytic surface by exact-fit classification of each
face group — cylinder / cone / sphere / torus quadric fits against the
group's vertices and area-weighted normals. Tessellated-from-analytic
meshes (pcylinder/psphere/ptorus/pcone and their CSG descendants, whose
vertices still lie on the original quadrics) fit to machine precision;
fitted faces are written as rectangular-trimmed surfaces (record type
10) whose UV domain is the face's parametric footprint. A curved face
whose footprint is not a UV-axis-aligned rectangle (a quadric trimmed
by a freeform intersection curve) has no exact representation in this
dialect and falls back to PLY for the whole node — same observable
behavior as before, now only for genuinely irregular trims.

`load_brep_solid` restores a .brep straight into a modeling SolidShape
(face ids = file face order), so typed explode and the rest of the DRAW
semantics keep working on re-imported shapes.
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

    def add_surface_raw(self, rec: str) -> int:
        """Pre-rendered surface record (curved fits, trimmed wrappers)."""
        self.surfaces.append(rec)
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

    def shell(self, faces: List[int],
              signs: Optional[List[str]] = None) -> int:
        signs = signs or ["+"] * len(faces)
        return self.add_record("Sh", list(zip(signs, faces)))

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


# ---------------------------------------------------------------------------
# Curved-surface recovery: exact-fit classification of mesh face groups
# ---------------------------------------------------------------------------
# The modeling kernel is mesh-backed; primitives tessellate analytic
# quadrics, and CSG preserves operand vertices, so a curved face group's
# vertices still lie ON the original cylinder/cone/sphere/torus to
# machine precision. The fitters below recover surface + parametric
# footprint; acceptance is residual-gated so arbitrary sculpted meshes
# never misclassify (they fall back to PLY as before).

_TWO_PI = 2.0 * np.pi


def _frame_xdir(z):
    x = np.cross(z, [0.0, 0.0, 1.0])
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(z, [0.0, 1.0, 0.0])
    return x / np.linalg.norm(x)


def _group_boundary(sel: np.ndarray) -> np.ndarray:
    """Vertex ids on the group's open boundary (directed edges whose
    reverse is absent within the group)."""
    from collections import Counter

    cnt = Counter()
    for a, b, c in sel:
        for e in ((a, b), (b, c), (c, a)):
            cnt[e] += 1
    out = set()
    for (a, b), k in cnt.items():
        if cnt.get((b, a), 0) == 0:
            out.add(a)
            out.add(b)
    return np.array(sorted(out), np.int64)


def _tri_normals_areas(verts, sel):
    p0, p1, p2 = verts[sel[:, 0]], verts[sel[:, 1]], verts[sel[:, 2]]
    cr = np.cross(p1 - p0, p2 - p0)
    ln = np.linalg.norm(cr, axis=1)
    ok = ln > 1e-20
    return (cr[ok] / ln[ok][:, None], 0.5 * ln[ok],
            ((p0 + p1 + p2) / 3.0)[ok])


def _uv_footprint(surf, pts, b_pts, mesh_area, area_fn, tol_v):
    """UV rectangle of the face on `surf`, or None.

    pts: all group vertices; b_pts: boundary vertices (possibly empty =
    closed surface). Valid iff every boundary vertex sits on an edge of
    the rectangle and the patch area over the rect matches the mesh
    area (no interior holes / non-rect trims)."""
    uv = surf.inverse(np.asarray(pts, np.float64))
    u, v = uv[:, 0], uv[:, 1]
    per_u = getattr(surf, "period_u", None)
    per_v = getattr(surf, "period_v", None)

    def span(x, period):
        """[lo, hi] covering x, unwrapped across the period seam."""
        if period is None:
            return float(x.min()), float(x.max()), x
        xs = np.sort(np.unique(np.round(x / period * 4096.0))) \
            * period / 4096.0
        if len(xs) == 0:
            return 0.0, 0.0, x
        gaps = np.diff(np.concatenate([xs, [xs[0] + period]]))
        gi = int(np.argmax(gaps))
        if gaps[gi] < 0.02 * period:
            return 0.0, period, x  # full period
        lo = xs[(gi + 1) % len(xs)]
        xw = np.where(x < lo - 1e-9, x + period, x)
        return float(lo), float(xw.max()), xw
    u0, u1, uw = span(u, per_u)
    v0, v1, vw = span(v, per_v)
    if u1 - u0 < 1e-9 or v1 - v0 < 1e-9:
        return None
    if len(b_pts):
        buv = surf.inverse(np.asarray(b_pts, np.float64))
        bu, bv = buv[:, 0], buv[:, 1]
        if per_u is not None:
            bu = np.where(bu < u0 - 1e-9, bu + per_u, bu)
        if per_v is not None:
            bv = np.where(bv < v0 - 1e-9, bv + per_v, bv)
        tol_u = max(1e-6, 0.01 * (u1 - u0))
        tol_vv = max(tol_v, 0.01 * (v1 - v0))
        on_edge = (np.abs(bu - u0) < tol_u) | (np.abs(bu - u1) < tol_u) \
            | (np.abs(bv - v0) < tol_vv) | (np.abs(bv - v1) < tol_vv)
        if not np.all(on_edge):
            return None
    patch = area_fn(u0, u1, v0, v1)
    if not (0.9 * patch <= mesh_area <= 1.02 * patch):
        return None  # holes or non-rect trim (mesh under-areas slightly)
    return u0, u1, v0, v1


def _orient_sign(surf, normals, areas, cents) -> str:
    uv = surf.inverse(cents)
    sn = surf.normal(uv)
    agree = float(np.sum(areas * np.einsum("ij,ij->i", normals, sn)))
    return "+" if agree >= 0.0 else "-"


def _fit_curved(verts: np.ndarray, sel: np.ndarray, scale: float):
    """Classify one non-planar face group.

    Returns (surface_record_str, orient_sign) or None. The record is a
    rectangular-trimmed surface (type 10) so the reader's wire-less
    fallback tessellates exactly the parametric footprint."""
    from cadrays_tpu.geometry import tessellate as tz

    # Weld by position first: primitive meshes carry UV-seam / pole
    # duplicates which would read as phantom open boundaries. Tolerance
    # covers float32 trig noise (sin(2*pi) ~ 1.7e-7 in f32).
    q = np.round(verts / (2e-6 * scale)).astype(np.int64)
    _, first, inv = np.unique(q, axis=0, return_index=True,
                              return_inverse=True)
    wsel = inv[sel]
    wsel = wsel[(wsel[:, 0] != wsel[:, 1]) & (wsel[:, 1] != wsel[:, 2])
                & (wsel[:, 0] != wsel[:, 2])]
    wverts = verts[first]

    pts = wverts[np.unique(wsel)]
    normals, areas, cents = _tri_normals_areas(wverts, wsel)
    if len(normals) < 4 or len(pts) < 8:
        return None
    mesh_area = float(areas.sum())
    w = areas / areas.sum()
    tol = 1e-5 * scale
    b_idx = _group_boundary(wsel)
    b_pts = wverts[b_idx] if len(b_idx) else np.zeros((0, 3))

    # Max edge length: CSG-split vertices sit on CHORDS of the original
    # tessellation (up to sagitta ~ L^2/8r inside the true surface), so
    # fit acceptance scales with curvature via `sag(r)`.
    e0 = np.linalg.norm(wverts[wsel[:, 0]] - wverts[wsel[:, 1]], axis=1)
    e1 = np.linalg.norm(wverts[wsel[:, 1]] - wverts[wsel[:, 2]], axis=1)
    lmax = float(max(e0.max(), e1.max()))

    def sag(r):
        return max(tol, lmax * lmax / (8.0 * max(abs(r), 1e-9)))

    def trimmed(rec, rect):
        u0, u1, v0, v1 = rect
        return (f"10 {_fmt(u0)} {_fmt(u1)} {_fmt(v0)} {_fmt(v1)} {rec}")

    def frame_str(p, z, x):
        y = np.cross(z, x)
        return f"{_v3(p)} {_v3(z)} {_v3(x)} {_v3(y)}"

    # ---- sphere: |p - c| == r (linear LSQ) -----------------------------
    A = np.concatenate([2.0 * pts, np.ones((len(pts), 1))], axis=1)
    sol, *_ = np.linalg.lstsq(A, np.einsum("ij,ij->i", pts, pts),
                              rcond=None)
    c, k = sol[:3], sol[3]
    r2 = k + c @ c
    if r2 > 0:
        r = float(np.sqrt(r2))
        d = np.linalg.norm(pts - c, axis=1)
        if np.max(np.abs(d - r)) < sag(r) and r < 1e3 * scale:
            # CSG chord vertices bias the LSQ radius inward; the true
            # surface radius is where the original ring vertices sit
            r = float(np.quantile(d, 0.98))
            z = np.array([0.0, 0.0, 1.0])
            x = np.array([1.0, 0.0, 0.0])
            surf = tz.SphereSurface(tz.Frame(c, z, x), r)
            rect = _uv_footprint(
                surf, pts, b_pts, mesh_area,
                lambda u0, u1, v0, v1: r * r * (u1 - u0)
                * (np.sin(v1) - np.sin(v0)),
                tol_v=sag(r) / max(r, 1e-9))
            # closed sphere: footprint is the whole domain
            if rect is None and len(b_idx) == 0:
                rect = (0.0, _TWO_PI, -0.5 * np.pi, 0.5 * np.pi)
            if rect is not None:
                rec = f"4 {frame_str(c, z, x)} {_fmt(r)}"
                return (trimmed(rec, rect),
                        _orient_sign(surf, normals, areas, cents))

    # ---- axis from the normal covariance (cylinder / cone share it) ----
    M = (normals * w[:, None]).T @ normals
    evals, evecs = np.linalg.eigh(M)
    axis = evecs[:, 0]  # smallest: normals ~ perpendicular to axis
    cbar = float(np.sum(w * (normals @ axis)))

    # ---- cylinder: n . axis == 0, dist-to-axis == r --------------------
    if abs(cbar) < 0.02:
        cen0 = pts.mean(axis=0)
        q = pts - cen0
        qp = q - np.outer(q @ axis, axis)  # radial components
        # circle fit in the plane: |qp - c2|^2 = r^2, c2 . axis = 0
        A = np.concatenate([2.0 * qp, np.ones((len(pts), 1))], axis=1)
        sol, *_ = np.linalg.lstsq(A, np.einsum("ij,ij->i", qp, qp),
                                  rcond=None)
        c2, k = sol[:3], sol[3]
        c2 = c2 - (c2 @ axis) * axis
        r2 = k + c2 @ c2
        if r2 > 0:
            r = float(np.sqrt(r2))
            d = np.linalg.norm(qp - c2, axis=1)
            if np.max(np.abs(d - r)) < sag(r):
                r = float(np.quantile(d, 0.98))
                origin = cen0 + c2
                x = _frame_xdir(axis)
                surf = tz.CylinderSurface(tz.Frame(origin, axis, x), r)
                rect = _uv_footprint(
                    surf, pts, b_pts, mesh_area,
                    lambda u0, u1, v0, v1: r * (u1 - u0) * (v1 - v0),
                    tol_v=sag(r))
                if rect is not None:
                    rec = f"2 {frame_str(origin, axis, x)} {_fmt(r)}"
                    return (trimmed(rec, rect),
                            _orient_sign(surf, normals, areas, cents))

    # ---- cone: n . axis == const != 0 ----------------------------------
    if 0.02 <= abs(cbar) < 0.999:
        # apex: every tangent plane passes through it: n . (apex - p) = 0
        b = np.einsum("ij,ij->i", normals, cents)
        apex, res, *_ = np.linalg.lstsq(normals * w[:, None],
                                        b * w, rcond=None)
        q = pts - apex
        dist = np.linalg.norm(q, axis=1)
        if np.min(dist) > 1e-7 * scale:
            qn = q / dist[:, None]
            ca = qn @ axis
            if np.mean(ca) < 0:
                axis = -axis
                ca = -ca
            half = float(np.arccos(np.clip(np.mean(np.abs(ca)), -1, 1)))
            if 1e-4 < half < 0.5 * np.pi - 1e-4:
                # residual: angle of each point off the cone
                resid = dist * np.abs(ca - np.cos(half))
                r_mean = float(np.mean(dist)) * np.sin(half)
                if np.max(resid) < max(10 * tol, sag(r_mean)):
                    x = _frame_xdir(axis)
                    surf = tz.ConeSurface(tz.Frame(apex, axis, x), 0.0,
                                          half)
                    sa, ca_ = np.sin(half), np.cos(half)
                    rect = _uv_footprint(
                        surf, pts, b_pts, mesh_area,
                        lambda u0, u1, v0, v1: (u1 - u0) * sa
                        * 0.5 * (v1 * v1 - v0 * v0),
                        tol_v=sag(r_mean))
                    if rect is not None:
                        rec = (f"3 {frame_str(apex, axis, x)} 0 "
                               f"{_fmt(half)}")
                        return (trimmed(rec, rect),
                                _orient_sign(surf, normals, areas, cents))

    # ---- torus: axis = distinct principal direction of the vertex
    # covariance (full/partial ring), then linear fit of R, r ------------
    cen = pts.mean(axis=0)
    C = np.cov((pts - cen).T, aweights=None)
    tevals, tevecs = np.linalg.eigh(C)
    # distinct eigenvalue: the one farthest from the other two
    gaps = [abs(tevals[0] - tevals[1]) + abs(tevals[0] - tevals[2]),
            abs(tevals[1] - tevals[0]) + abs(tevals[1] - tevals[2]),
            abs(tevals[2] - tevals[0]) + abs(tevals[2] - tevals[1])]
    taxis = tevecs[:, int(np.argmax(gaps))]
    qz = (pts - cen) @ taxis
    rho = np.linalg.norm((pts - cen) - np.outer(qz, taxis), axis=1)
    # rho^2 + z^2 = 2 R rho + (r^2 - R^2): linear in (R, k)
    A = np.stack([2.0 * rho, np.ones(len(pts))], axis=1)
    sol, *_ = np.linalg.lstsq(A, rho * rho + qz * qz, rcond=None)
    R, k = float(sol[0]), float(sol[1])
    r2 = k + R * R
    if R > 0 and r2 > 0:
        r = float(np.sqrt(r2))
        if r < R:
            resid = np.abs(np.sqrt((rho - R) ** 2 + qz ** 2) - r)
            if np.max(resid) < max(10 * tol, sag(r)):
                x = _frame_xdir(taxis)
                surf = tz.TorusSurface(tz.Frame(cen, taxis, x), R, r)
                rect = _uv_footprint(
                    surf, pts, b_pts, mesh_area,
                    lambda u0, u1, v0, v1: (u1 - u0) * r
                    * (R * (v1 - v0) + r * (np.sin(v1) - np.sin(v0))),
                    tol_v=sag(r) / max(r, 1e-9))
                if rect is None and len(b_idx) == 0:
                    rect = (0.0, _TWO_PI, 0.0, _TWO_PI)
                if rect is not None:
                    rec = (f"5 {frame_str(cen, taxis, x)} "
                           f"{_fmt(R)} {_fmt(r)}")
                    return (trimmed(rec, rect),
                            _orient_sign(surf, normals, areas, cents))
    return None


def _face_groups(verts: np.ndarray, tris: np.ndarray,
                 face_id: np.ndarray):
    """Per face id: ("plane", f, orig, n, x, y, loops) for planar groups,
    ("curved", f, surface_record, sign) for recognized quadric groups.

    Returns None when any face group is neither planar nor a clean
    quadric patch (no analytic surface to write -> PLY fallback)."""
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
        curved = False
        if ln < 1e-20:
            curved = True  # normals cancel: closed surface (sphere/torus)
        else:
            n /= ln
            orig = verts[np.unique(sel)].mean(axis=0)
            d = (verts[np.unique(sel)] - orig) @ n
            curved = np.max(np.abs(d)) > tol
        if curved:
            fit = _fit_curved(verts, sel, scale)
            if fit is None:
                return None  # unrecognized curved group
            groups.append(("curved", f, fit[0], fit[1]))
            continue
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
        groups.append(("plane", f, orig, n, x, y, loops))
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
        fids, signs = [], []
        for g in groups:
            if g[0] == "plane":
                _, _, orig, n, x, y, loops = g
                fids.append(_emit_face(w, orig, n, x, y, loops))
                signs.append("+")
            else:
                _, _, rec, sign = g
                surf = w.add_surface_raw(rec)
                # wire-less face: the reader tessellates the trimmed
                # surface's full UV domain (brep.py:_tessellate_face
                # fallback), which IS this face's parametric footprint
                fids.append(w.face(surf, []))
                signs.append(sign)
        return w.solid([w.shell(fids, signs)])

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

"""Analytic primitive tessellators.

The reference's modeling commands come from the OCCT DRAW kernel (`box`,
`psphere`, `pcylinder`, ... driven from TCL, e.g. CornellBox.tcl:20,43 and
Materials.tcl:10-23); the engine consumes their triangulations. Here the
primitives tessellate directly to `TriangleMesh` with normals + UVs.
"""
from __future__ import annotations

import numpy as np

from cadrays_tpu.geometry.mesh import TriangleMesh


def quad(width: float = 1.0, height: float = 1.0) -> TriangleMesh:
    """Unit quad in the XY plane, +Z normal, centered at origin."""
    w, h = width * 0.5, height * 0.5
    v = np.array([[-w, -h, 0], [w, -h, 0], [w, h, 0], [-w, h, 0]], np.float32)
    i = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = np.tile(np.float32([0, 0, 1]), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return TriangleMesh(v, i, n, uv)


def box(sx: float = 1.0, sy: float = 1.0, sz: float = 1.0,
        origin_corner: bool = True) -> TriangleMesh:
    """Axis-aligned box, outward normals, 24 vertices (hard edges).

    With origin_corner=True the box spans [0,s] like DRAW's `box` command;
    otherwise centered at the origin.
    """
    faces = []
    # (axis, sign): face perpendicular to axis at +/- side
    for axis in range(3):
        for sign in (-1.0, 1.0):
            u_ax, v_ax = (axis + 1) % 3, (axis + 2) % 3
            if sign < 0:
                u_ax, v_ax = v_ax, u_ax  # flip winding for outward normal
            verts = np.zeros((4, 3), np.float32)
            corners = [(0, 0), (1, 0), (1, 1), (0, 1)]
            for k, (a, b) in enumerate(corners):
                verts[k, axis] = 0.5 * sign
                verts[k, u_ax] = a - 0.5
                verts[k, v_ax] = b - 0.5
            n = np.zeros((4, 3), np.float32)
            n[:, axis] = sign
            uv = np.array(corners, np.float32)
            faces.append(TriangleMesh(
                verts, np.array([[0, 1, 2], [0, 2, 3]], np.int32), n, uv))
    m = TriangleMesh.merge(faces)
    scale = np.float32([sx, sy, sz])
    m.vertices = m.vertices * scale
    if origin_corner:
        m.vertices = m.vertices + 0.5 * scale
    return m


def box_face(sx: float, sy: float, sz: float, face: int,
             origin_corner: bool = True) -> TriangleMesh:
    """One face of a box, DRAW `explode b FACE` order: faces 1..6 =
    -X, +X, -Y, +Y, -Z, +Z (OCCT face enumeration per axis, min then max)."""
    axis = (face - 1) // 2
    sign = -1.0 if (face - 1) % 2 == 0 else 1.0
    m = box(sx, sy, sz, origin_corner=origin_corner)
    # keep the 2 triangles whose normal matches
    fn = m.face_normals()
    keep = np.abs(fn[:, axis] - sign) < 0.5
    tri = m.indices[keep]
    used = np.unique(tri)
    remap = np.full(m.num_vertices, -1, np.int32)
    remap[used] = np.arange(used.size, dtype=np.int32)
    return TriangleMesh(m.vertices[used], remap[tri], m.normals[used],
                        m.uvs[used])


def sphere(radius: float = 1.0, segments: int = 48, rings: int = 24) -> TriangleMesh:
    """UV sphere centered at origin (DRAW `psphere` analogue)."""
    phi = np.linspace(0.0, 2.0 * np.pi, segments + 1, dtype=np.float32)
    theta = np.linspace(0.0, np.pi, rings + 1, dtype=np.float32)
    t, p = np.meshgrid(theta, phi, indexing="ij")  # (rings+1, segments+1)
    x = np.sin(t) * np.cos(p)
    y = np.sin(t) * np.sin(p)
    z = np.cos(t)
    n = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    v = (radius * n).astype(np.float32)
    uv = np.stack([p / (2 * np.pi), 1.0 - t / np.pi], axis=-1).reshape(-1, 2)
    idx = []
    cols = segments + 1
    for i in range(rings):
        for j in range(segments):
            a = i * cols + j
            b = a + 1
            c = a + cols
            d = c + 1
            if i > 0:
                idx.append([a, c, b])
            if i < rings - 1:
                idx.append([b, c, d])
    return TriangleMesh(v, np.array(idx, np.int32), n, uv.astype(np.float32))


def cylinder(radius: float = 1.0, height: float = 1.0, segments: int = 48,
             capped: bool = True) -> TriangleMesh:
    """Cylinder along +Z from z=0 to z=height (DRAW `pcylinder` analogue)."""
    phi = np.linspace(0.0, 2 * np.pi, segments + 1, dtype=np.float32)
    c, s = np.cos(phi), np.sin(phi)
    side_v = np.concatenate([
        np.stack([radius * c, radius * s, np.zeros_like(c)], -1),
        np.stack([radius * c, radius * s, np.full_like(c, height)], -1),
    ]).astype(np.float32)
    side_n = np.concatenate([
        np.stack([c, s, np.zeros_like(c)], -1)] * 2).astype(np.float32)
    side_uv = np.concatenate([
        np.stack([phi / (2 * np.pi), np.zeros_like(phi)], -1),
        np.stack([phi / (2 * np.pi), np.ones_like(phi)], -1),
    ]).astype(np.float32)
    idx = []
    for j in range(segments):
        a, b = j, j + 1
        c2, d = j + segments + 1, j + segments + 2
        idx += [[a, b, c2], [b, d, c2]]
    parts = [TriangleMesh(side_v, np.array(idx, np.int32), side_n, side_uv)]
    if capped:
        for z, sign in ((0.0, -1.0), (height, 1.0)):
            ring = np.stack([radius * c[:-1], radius * s[:-1],
                             np.full(segments, z, np.float32)], -1)
            center = np.float32([[0, 0, z]])
            cv = np.concatenate([center, ring]).astype(np.float32)
            cn = np.tile(np.float32([0, 0, sign]), (segments + 1, 1))
            cuv = 0.5 + 0.5 * np.concatenate(
                [np.zeros((1, 2), np.float32),
                 np.stack([c[:-1], s[:-1]], -1)])
            ci = []
            for j in range(segments):
                nj = (j + 1) % segments
                tri = [0, 1 + j, 1 + nj] if sign > 0 else [0, 1 + nj, 1 + j]
                ci.append(tri)
            parts.append(TriangleMesh(cv, np.array(ci, np.int32), cn,
                                      cuv.astype(np.float32)))
    return TriangleMesh.merge(parts)


def cone(radius1: float = 1.0, radius2: float = 0.0, height: float = 1.0,
         segments: int = 48) -> TriangleMesh:
    """Cone/frustum along +Z (DRAW `pcone` analogue)."""
    phi = np.linspace(0.0, 2 * np.pi, segments + 1, dtype=np.float32)
    c, s = np.cos(phi), np.sin(phi)
    v = np.concatenate([
        np.stack([radius1 * c, radius1 * s, np.zeros_like(c)], -1),
        np.stack([radius2 * c, radius2 * s, np.full_like(c, height)], -1),
    ]).astype(np.float32)
    slope = (radius1 - radius2) / max(height, 1e-8)
    nz = slope / np.sqrt(1 + slope * slope)
    nr = 1.0 / np.sqrt(1 + slope * slope)
    n = np.concatenate([np.stack([nr * c, nr * s, np.full_like(c, nz)], -1)] * 2)
    uv = np.concatenate([
        np.stack([phi / (2 * np.pi), np.zeros_like(phi)], -1),
        np.stack([phi / (2 * np.pi), np.ones_like(phi)], -1),
    ]).astype(np.float32)
    idx = []
    for j in range(segments):
        a, b = j, j + 1
        c2, d = j + segments + 1, j + segments + 2
        idx += [[a, b, c2], [b, d, c2]]
    return TriangleMesh(v, np.array(idx, np.int32), n.astype(np.float32), uv)


def torus(major: float = 1.0, minor: float = 0.25, segments: int = 48,
          rings: int = 24) -> TriangleMesh:
    """Torus in the XY plane (DRAW `ptorus` analogue)."""
    u = np.linspace(0, 2 * np.pi, segments + 1, dtype=np.float32)
    v_ = np.linspace(0, 2 * np.pi, rings + 1, dtype=np.float32)
    uu, vv = np.meshgrid(u, v_, indexing="ij")
    cx = (major + minor * np.cos(vv)) * np.cos(uu)
    cy = (major + minor * np.cos(vv)) * np.sin(uu)
    cz = minor * np.sin(vv)
    verts = np.stack([cx, cy, cz], -1).reshape(-1, 3).astype(np.float32)
    nx = np.cos(vv) * np.cos(uu)
    ny = np.cos(vv) * np.sin(uu)
    nz = np.sin(vv)
    norms = np.stack([nx, ny, nz], -1).reshape(-1, 3).astype(np.float32)
    uvs = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], -1).reshape(-1, 2)
    idx = []
    cols = rings + 1
    for i in range(segments):
        for j in range(rings):
            a = i * cols + j
            b = a + 1
            c = a + cols
            d = c + 1
            idx += [[a, c, b], [b, c, d]]
    return TriangleMesh(verts, np.array(idx, np.int32), norms,
                        uvs.astype(np.float32))


def wedge(dx: float, dy: float, dz: float, ltx: float) -> TriangleMesh:
    """DRAW `wedge name dx dy dz ltx`: a box [0,dx]x[0,dy]x[0,dz] whose
    top face (y=dy) has its x extent shrunk to [0,ltx] (Shape.tcl-style
    solids). Flat shading via duplicated vertices per face."""
    b = [(0, 0, 0), (dx, 0, 0), (dx, 0, dz), (0, 0, dz)]   # y=0 ring
    t = [(0, dy, 0), (ltx, dy, 0), (ltx, dy, dz), (0, dy, dz)]  # y=dy ring
    quads = [
        (b[3], b[2], b[1], b[0]),      # bottom (y=0), normal -y
        (t[0], t[1], t[2], t[3]),      # top (y=dy), normal +y
        (b[0], b[1], t[1], t[0]),      # z=0 side
        (b[2], b[3], t[3], t[2]),      # z=dz side
        (b[1], b[2], t[2], t[1]),      # slanted +x side
        (b[3], b[0], t[0], t[3]),      # x=0 side
    ]
    parts = []
    for q in quads:
        v = np.asarray(q, np.float32)
        e1, e2 = v[1] - v[0], v[2] - v[0]
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n)
        if ln < 1e-12:  # degenerate (ltx == 0 collapses the top)
            continue
        n = np.tile((n / ln).astype(np.float32), (4, 1))
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        parts.append(TriangleMesh(
            v, np.array([[0, 1, 2], [0, 2, 3]], np.int32), n, uv))
    return TriangleMesh.merge(parts)

"""Native STEP reader + trimmed-surface tessellator tests.

Fixtures are generated as genuine Part-21 text (the same entity graph
OCCT emits for these shapes), so the parser is tested on the real
grammar: refs, enums, nested lists, complex records, seams on periodic
surfaces, full-circle edges."""
import math

import numpy as np
import pytest

from cadrays_tpu.geometry.nurbs import BSplineCurve, BSplineSurface
from cadrays_tpu.geometry.step import load_step
from cadrays_tpu.geometry import tessellate as tz


class W:
    """Tiny Part-21 writer."""

    def __init__(self):
        self.recs = []

    def add(self, txt: str) -> int:
        self.recs.append(txt)
        return len(self.recs)

    def pt(self, p):
        return self.add(
            f"CARTESIAN_POINT('',({p[0]:.9g},{p[1]:.9g},{p[2]:.9g}))")

    def dir(self, d):
        return self.add(f"DIRECTION('',({d[0]:.9g},{d[1]:.9g},{d[2]:.9g}))")

    def a2p(self, origin, z, x):
        return self.add(
            f"AXIS2_PLACEMENT_3D('',#{self.pt(origin)},#{self.dir(z)},"
            f"#{self.dir(x)})")

    def text(self) -> str:
        body = "\n".join(f"#{i + 1}={r};" for i, r in enumerate(self.recs))
        return ("ISO-10303-21;\nHEADER;\nFILE_DESCRIPTION(('t'),'2;1');\n"
                "FILE_NAME('t','',(''),(''),'','','');\n"
                "FILE_SCHEMA(('AUTOMOTIVE_DESIGN'));\nENDSEC;\nDATA;\n"
                + body + "\nENDSEC;\nEND-ISO-10303-21;\n")


def _edge(w, va, vb, pa, pb):
    d = np.subtract(pb, pa)
    ln = float(np.linalg.norm(d))
    vec = w.add(f"VECTOR('',#{w.dir(d / ln)},{ln:.9g})")
    line = w.add(f"LINE('',#{w.pt(pa)},#{vec})")
    return w.add(f"EDGE_CURVE('',#{va},#{vb},#{line},.T.)")


def step_box(path, a=0.0, b=1.0):
    """Unit box as MANIFOLD_SOLID_BREP with 6 planar ADVANCED_FACEs."""
    w = W()
    c = [(x, y, z) for z in (a, b) for y in (a, b) for x in (a, b)]
    vp = [w.add(f"VERTEX_POINT('',#{w.pt(p)})") for p in c]
    # faces as CCW-from-outside corner index loops (z-,z+,y-,y+,x-,x+)
    faces_idx = [(0, 2, 3, 1), (4, 5, 7, 6), (0, 1, 5, 4),
                 (2, 6, 7, 3), (0, 4, 6, 2), (1, 3, 7, 5)]
    normals = [(0, 0, -1), (0, 0, 1), (0, -1, 0),
               (0, 1, 0), (-1, 0, 0), (1, 0, 0)]
    edges = {}

    def get_edge(i, j):
        if (i, j) in edges:
            return edges[(i, j)], ".T."
        if (j, i) in edges:
            return edges[(j, i)], ".F."
        e = _edge(w, vp[i], vp[j], c[i], c[j])
        edges[(i, j)] = e
        return e, ".T."

    face_ids = []
    for quad, n in zip(faces_idx, normals):
        oes = []
        for k in range(4):
            i, j = quad[k], quad[(k + 1) % 4]
            e, sense = get_edge(i, j)
            oes.append(w.add(f"ORIENTED_EDGE('',*,*,#{e},{sense})"))
        loop = w.add("EDGE_LOOP('',(" + ",".join(f"#{o}" for o in oes) + "))")
        bound = w.add(f"FACE_OUTER_BOUND('',#{loop},.T.)")
        x = np.subtract(c[quad[1]], c[quad[0]])
        plane = w.add(f"PLANE('',#{w.a2p(c[quad[0]], n, tuple(x))})")
        face_ids.append(
            w.add(f"ADVANCED_FACE('',(#{bound}),#{plane},.T.)"))
    shell = w.add("CLOSED_SHELL('',("
                  + ",".join(f"#{f}" for f in face_ids) + "))")
    w.add(f"MANIFOLD_SOLID_BREP('',#{shell})")
    path.write_text(w.text())
    return path


def step_cylinder(path, r=1.0, h=2.0):
    """Capped cylinder: periodic side face with a seam + full-circle
    edges, two planar caps trimmed by circles."""
    w = W()
    pb, pt = (r, 0.0, 0.0), (r, 0.0, h)
    cb, ct = (0.0, 0.0, 0.0), (0.0, 0.0, h)
    vb = w.add(f"VERTEX_POINT('',#{w.pt(pb)})")
    vt = w.add(f"VERTEX_POINT('',#{w.pt(pt)})")
    circ_b = w.add(f"CIRCLE('',#{w.a2p(cb, (0, 0, 1), (1, 0, 0))},{r})")
    circ_t = w.add(f"CIRCLE('',#{w.a2p(ct, (0, 0, 1), (1, 0, 0))},{r})")
    e_b = w.add(f"EDGE_CURVE('',#{vb},#{vb},#{circ_b},.T.)")
    e_t = w.add(f"EDGE_CURVE('',#{vt},#{vt},#{circ_t},.T.)")
    vec = w.add(f"VECTOR('',#{w.dir((0, 0, 1))},1.)")
    seam_line = w.add(f"LINE('',#{w.pt(pb)},#{vec})")
    e_s = w.add(f"EDGE_CURVE('',#{vb},#{vt},#{seam_line},.T.)")

    def oe(e, sense):
        return w.add(f"ORIENTED_EDGE('',*,*,#{e},{sense})")

    side_loop = w.add(
        "EDGE_LOOP('',(#%d,#%d,#%d,#%d))"
        % (oe(e_b, ".T."), oe(e_s, ".T."), oe(e_t, ".F."), oe(e_s, ".F.")))
    side_bound = w.add(f"FACE_OUTER_BOUND('',#{side_loop},.T.)")
    cyl = w.add(
        f"CYLINDRICAL_SURFACE('',#{w.a2p(cb, (0, 0, 1), (1, 0, 0))},{r})")
    f_side = w.add(f"ADVANCED_FACE('',(#{side_bound}),#{cyl},.T.)")

    lb = w.add(f"EDGE_LOOP('',(#{oe(e_b, '.F.')}))")
    bb = w.add(f"FACE_OUTER_BOUND('',#{lb},.T.)")
    pl_b = w.add(f"PLANE('',#{w.a2p(cb, (0, 0, -1), (1, 0, 0))})")
    f_b = w.add(f"ADVANCED_FACE('',(#{bb}),#{pl_b},.T.)")

    lt = w.add(f"EDGE_LOOP('',(#{oe(e_t, '.T.')}))")
    bt = w.add(f"FACE_OUTER_BOUND('',#{lt},.T.)")
    pl_t = w.add(f"PLANE('',#{w.a2p(ct, (0, 0, 1), (1, 0, 0))})")
    f_t = w.add(f"ADVANCED_FACE('',(#{bt}),#{pl_t},.T.)")

    shell = w.add(f"CLOSED_SHELL('',(#{f_side},#{f_b},#{f_t}))")
    w.add(f"MANIFOLD_SOLID_BREP('',#{shell})")
    path.write_text(w.text())
    return path


def step_plate_with_hole(path, s=2.0, r=0.5):
    """Single planar face: square outer bound + circular inner bound —
    exercises hole bridging in the ear clipper."""
    w = W()
    z = 0.0
    corners = [(-s, -s, z), (s, -s, z), (s, s, z), (-s, s, z)]
    vp = [w.add(f"VERTEX_POINT('',#{w.pt(p)})") for p in corners]
    oes = []
    for k in range(4):
        e = _edge(w, vp[k], vp[(k + 1) % 4], corners[k], corners[(k + 1) % 4])
        oes.append(w.add(f"ORIENTED_EDGE('',*,*,#{e},.T.)"))
    outer_loop = w.add(
        "EDGE_LOOP('',(" + ",".join(f"#{o}" for o in oes) + "))")
    outer = w.add(f"FACE_OUTER_BOUND('',#{outer_loop},.T.)")

    ph = (r, 0.0, z)
    vh = w.add(f"VERTEX_POINT('',#{w.pt(ph)})")
    circ = w.add(f"CIRCLE('',#{w.a2p((0, 0, z), (0, 0, 1), (1, 0, 0))},{r})")
    e_h = w.add(f"EDGE_CURVE('',#{vh},#{vh},#{circ},.T.)")
    hole_loop = w.add(
        f"EDGE_LOOP('',(#{w.add(f'''ORIENTED_EDGE('',*,*,#{e_h},.F.)''')}))")
    hole = w.add(f"FACE_BOUND('',#{hole_loop},.T.)")

    plane = w.add(f"PLANE('',#{w.a2p((0, 0, z), (0, 0, 1), (1, 0, 0))})")
    face = w.add(f"ADVANCED_FACE('',(#{outer},#{hole}),#{plane},.T.)")
    shell = w.add(f"OPEN_SHELL('',(#{face}))")
    w.add(f"SHELL_BASED_SURFACE_MODEL('',(#{shell}))")
    path.write_text(w.text())
    return path


def _area(mesh):
    return float(mesh.areas().sum())


def _volume(mesh):
    v = mesh.vertices.astype(np.float64)
    t = mesh.indices
    return float(np.einsum(
        "ij,ij->i", v[t[:, 0]], np.cross(v[t[:, 1]], v[t[:, 2]])).sum() / 6)


def test_step_box(tmp_path):
    meshes = load_step(str(step_box(tmp_path / "box.step")))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.part_ranges is not None and len(m.part_ranges) == 6
    assert abs(_area(m) - 6.0) < 1e-6
    assert abs(_volume(m) - 1.0) < 1e-6
    # normals outward: at each face centroid, normal . (centroid-center) > 0
    ctr = m.vertices[m.indices].mean(1) - 0.5
    fn = m.face_normals()
    assert (np.einsum("ij,ij->i", ctr, fn) > 0).all()


def test_step_cylinder(tmp_path):
    meshes = load_step(str(step_cylinder(tmp_path / "cyl.step")),
                       deflection=0.002)
    assert len(meshes) == 1
    m = meshes[0]
    area, vol = _area(m), _volume(m)
    true_area = 2 * math.pi * 1 * 2 + 2 * math.pi
    assert abs(area - true_area) / true_area < 0.02
    assert abs(vol - 2 * math.pi) / (2 * math.pi) < 0.02
    # UVs present for texturing (DataNode::Parameterize parity)
    assert m.uvs is not None and m.uvs.shape[0] == m.vertices.shape[0]


def test_step_plate_with_hole(tmp_path):
    meshes = load_step(str(step_plate_with_hole(tmp_path / "p.step")),
                       deflection=0.002)
    m = meshes[0]
    true_area = 4 * 4 - math.pi * 0.25
    assert abs(_area(m) - true_area) / true_area < 0.02
    # no triangle centroid may fall inside the hole
    ctr = m.vertices[m.indices].mean(1)
    assert (np.hypot(ctr[:, 0], ctr[:, 1]) > 0.45).all()


def test_step_via_command_surface(tmp_path):
    """testreadstep-equivalent path through the Tcl command set
    (ImportSettingsEditor.cxx:317-343)."""
    from cadrays_tpu.cli.commands import Console

    p = step_box(tmp_path / "b.step")
    it = Console()
    it.exec(f"rtmeshread {p} part")
    out = it.exec("rtmodel -print")
    assert "part" in out


def test_bspline_curve_matches_line():
    # degree-1 b-spline through two points == segment
    c = BSplineCurve(1, [0, 0, 1, 1], [[0, 0, 0], [2, 4, 6]])
    t = np.linspace(0, 1, 7)
    assert np.allclose(c.eval(t), t[:, None] * [2, 4, 6], atol=1e-12)


def test_bspline_circle_rational():
    # exact quarter circle: degree-2 rational with w=(1, 1/sqrt2, 1)
    w = 1 / math.sqrt(2)
    c = BSplineCurve(2, [0, 0, 0, 1, 1, 1],
                     [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     weights=[1, w, 1])
    t = np.linspace(0, 1, 33)
    p = c.eval(t)
    assert np.allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-12)


def test_bspline_surface_bilinear():
    s = BSplineSurface(1, 1, [0, 0, 1, 1], [0, 0, 1, 1],
                       [[[0, 0, 0], [0, 1, 0]], [[1, 0, 0], [1, 1, 1]]])
    p = s.eval(np.array([0.5]), np.array([0.5]))
    assert np.allclose(p, [[0.5, 0.5, 0.25]], atol=1e-12)


def test_tessellate_sphere_area():
    """Full analytic pipeline: hemisphere face bounded by equator + seam
    meridians + the degenerate polar edge (how B-rep kernels bound a
    periodic-surface face)."""
    surf = tz.SphereSurface(tz.Frame([0, 0, 0], [0, 0, 1], [1, 0, 0]), 1.0)
    eq_u = np.linspace(0, 2 * math.pi, 96, endpoint=False)
    seam_v = np.linspace(0, math.pi / 2, 16, endpoint=False)
    pole_u = np.linspace(2 * math.pi, 0, 8, endpoint=False)
    uv = np.concatenate([
        np.stack([eq_u, np.zeros_like(eq_u)], -1),           # equator CCW
        np.stack([np.full_like(seam_v, 2 * math.pi), seam_v], -1),  # seam up
        np.stack([pole_u, np.full_like(pole_u, math.pi / 2)], -1),  # pole
        np.stack([np.zeros(15), seam_v[1:][::-1]], -1),      # seam down
    ])
    pts = surf.eval(uv)
    res = tz.tessellate_face(surf, [tz.TrimLoop(uv, pts)], deflection=0.003)
    assert res is not None
    v, n, uvs, tris = res
    e1 = v[tris[:, 1]] - v[tris[:, 0]]
    e2 = v[tris[:, 2]] - v[tris[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    assert abs(area - 2 * math.pi) / (2 * math.pi) < 0.02

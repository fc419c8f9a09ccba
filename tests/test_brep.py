"""Native OCCT .brep reader tests.

Fixtures are generated as genuine "CASCADE Topology" text following the
documented BREP format (sections Locations/Curve2ds/Curves/Surfaces/
TShapes, leaf-first TShape records, end-counted subshape references) —
the same layout BRepTools::Write emits.
"""
import math

import os
import numpy as np
import pytest

from cadrays_tpu.geometry.brep import load_brep, parse_brep


class BW:
    """Tiny .brep text writer. Shape refs count from the END of the
    TShapes section, so `ref()` converts a file-order record id."""

    def __init__(self):
        self.locations = []
        self.curves = []
        self.surfaces = []
        self.tshapes = []  # list of text blocks

    def loc(self, R=np.eye(3), t=(0, 0, 0)) -> int:
        rows = []
        m = np.concatenate([np.asarray(R, float),
                            np.asarray(t, float)[:, None]], axis=1)
        for r in range(3):
            rows.append(" ".join(f"{v:.17g}" for v in m[r]))
        self.locations.append("1\n" + "\n".join(rows))
        return len(self.locations)

    def line(self, p, d) -> int:
        self.curves.append(
            "1 " + " ".join(f"{v:.17g}" for v in (*p, *d)))
        return len(self.curves)

    def circle(self, c, n, x, y, r) -> int:
        self.curves.append(
            "2 " + " ".join(f"{v:.17g}" for v in (*c, *n, *x, *y, r)))
        return len(self.curves)

    def plane(self, p, n, x, y) -> int:
        self.surfaces.append(
            "1 " + " ".join(f"{v:.17g}" for v in (*p, *n, *x, *y)))
        return len(self.surfaces)

    def cylinder(self, p, z, x, y, r) -> int:
        self.surfaces.append(
            "2 " + " ".join(f"{v:.17g}" for v in (*p, *z, *x, *y, r)))
        return len(self.surfaces)

    def vertex(self, p) -> int:
        """Returns the file-order record id (1-based). Sub-shape
        references are resolved to end-counted numbers in text()."""
        self.tshapes.append((
            "Ve\n1e-07\n" + " ".join(f"{v:.17g}" for v in p)
            + "\n0 0\n\n0101101\n", []))
        return len(self.tshapes)

    def edge(self, curve, first, last, loc=0) -> int:
        self.tshapes.append((
            f"Ed\n 1e-07 1 1 0\n1  {curve} {loc} {first:.17g} {last:.17g}"
            "\n0\n\n0101000\n", []))
        return len(self.tshapes)

    def wire(self, edge_recs) -> int:
        """edge_recs: list of (record id, orientation +1/-1)."""
        self.tshapes.append(("Wi\n\n0101100\n",
                             [(r, o, 0) for r, o in edge_recs]))
        return len(self.tshapes)

    def face(self, surface, wire_recs, natural=0, loc=0) -> int:
        self.tshapes.append((
            f"Fa\n{natural}  1e-07 {surface} {loc}\n\n0101000\n",
            [(r, 1, 0) for r in wire_recs]))
        return len(self.tshapes)

    def compound(self, child_recs_locs) -> int:
        self.tshapes.append(("Co\n\n1100000\n",
                             [(r, 1, lo) for r, lo in child_recs_locs]))
        return len(self.tshapes)

    def text(self, root_rec=None) -> str:
        n = len(self.tshapes)
        ref = lambda rec: n - rec + 1  # end-counted reference
        root = ref(root_rec) if root_rec else 1
        tshape_blocks = []
        for body, subs in self.tshapes:
            s = " ".join(
                f"{'+' if o > 0 else '-'}{ref(r)} {lo}"
                for r, o, lo in subs)
            tshape_blocks.append(body + (s + " *" if s else "*"))
        out = ["DBRep_DrawableShape", "",
               "CASCADE Topology V1, (c) Matra-Datavision",
               f"Locations {len(self.locations)}"]
        out += self.locations
        out += ["Curve2ds 0", f"Curves {len(self.curves)}"]
        out += self.curves
        out += ["Polygon3D 0", "PolygonOnTriangulations 0",
                f"Surfaces {len(self.surfaces)}"]
        out += self.surfaces
        out += ["Triangulations 0", "",
                f"TShapes {len(self.tshapes)}"]
        out += tshape_blocks
        out += ["", f"+{root} 0", ""]
        return "\n".join(out)


def _rect_face(w: BW, size=2.0):
    """Planar rectangle [0,size]^2 in z=0 bounded by a 4-edge wire."""
    s = w.plane((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0))
    corners = [(0, 0, 0), (size, 0, 0), (size, size, 0), (0, size, 0)]
    for p in corners:
        w.vertex(p)
    edges = []
    for k in range(4):
        a = np.array(corners[k], float)
        b = np.array(corners[(k + 1) % 4], float)
        c = w.line(a, b - a)
        edges.append(w.edge(c, 0.0, 1.0))
    wi = w.wire([(e, 1) for e in edges])
    return w.face(s, [wi])


def _area(m):
    return 0.5 * np.linalg.norm(np.cross(
        m.vertices[m.indices[:, 1]] - m.vertices[m.indices[:, 0]],
        m.vertices[m.indices[:, 2]] - m.vertices[m.indices[:, 0]]),
        axis=-1).sum()


class TestParse:
    def test_sections(self, tmp_path):
        w = BW()
        _rect_face(w)
        model = parse_brep(w.text())
        assert len(model.surfaces) == 1
        assert len(model.curves) == 4
        kinds = [s.kind for s in model.shapes]
        assert kinds.count("Ve") == 4
        assert kinds.count("Ed") == 4
        assert kinds[-1] == "Fa"
        assert model.root == 1

    def test_not_brep_error(self, tmp_path):
        p = tmp_path / "x.brep"
        p.write_text("garbage\n")
        with pytest.raises(ValueError, match="CASCADE Topology"):
            load_brep(str(p))


class TestFaces:
    def test_planar_rectangle(self, tmp_path):
        w = BW()
        fa = _rect_face(w, size=2.0)
        p = tmp_path / "rect.brep"
        p.write_text(w.text(fa))
        meshes = load_brep(str(p))
        assert len(meshes) == 1
        assert _area(meshes[0]) == pytest.approx(4.0, rel=1e-3)

    def test_compound_with_location(self, tmp_path):
        """Compound of two rectangles, one moved by a Location."""
        w = BW()
        fa = _rect_face(w, size=1.0)
        lo = w.loc(t=(5.0, 0.0, 0.0))
        co = w.compound([(fa, 0), (fa, lo)])
        p = tmp_path / "co.brep"
        p.write_text(w.text(co))
        meshes = load_brep(str(p))
        assert len(meshes) == 2
        xs = sorted(m.vertices[:, 0].min() for m in meshes)
        assert xs[0] == pytest.approx(0.0, abs=1e-6)
        assert xs[1] == pytest.approx(5.0, abs=1e-6)

    def test_half_cylinder_face(self, tmp_path):
        """Half-cylinder band: two circular arcs + two seam lines, the
        same 4-edge wire OCCT builds for a trimmed cylindrical face."""
        w = BW()
        s = w.cylinder((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0), 1.0)
        for p3 in [(1, 0, 0), (-1, 0, 0), (-1, 0, 2), (1, 0, 2)]:
            w.vertex(p3)
        c0 = w.circle((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0), 1.0)
        c1 = w.circle((0, 0, 2), (0, 0, 1), (1, 0, 0), (0, 1, 0), 1.0)
        lseam = w.line((-1, 0, 0), (0, 0, 1))
        rseam = w.line((1, 0, 0), (0, 0, 1))
        e_bot = w.edge(c0, 0.0, math.pi)
        e_l = w.edge(lseam, 0.0, 2.0)
        e_top = w.edge(c1, 0.0, math.pi)
        e_r = w.edge(rseam, 0.0, 2.0)
        wi = w.wire([(e_bot, 1), (e_l, 1), (e_top, -1), (e_r, -1)])
        fa = w.face(s, [wi])
        p = tmp_path / "cyl.brep"
        p.write_text(w.text(fa))
        meshes = load_brep(str(p), deflection=0.005)
        m = meshes[0]
        r = np.linalg.norm(m.vertices[:, :2], axis=-1)
        assert np.allclose(r, 1.0, atol=0.01)
        assert _area(m) == pytest.approx(math.pi * 2.0, rel=2e-2)


class TestCommandSurface:
    def test_restore_brep(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session

        w = BW()
        fa = _rect_face(w)
        p = tmp_path / "part.brep"
        p.write_text(w.text(fa))
        sess = Session()
        c = Console(sess)
        c.exec(f"restore {p} part")
        assert "part" in sess.staging
        c.exec("vdisplay part")
        assert sess.scene.model.get("part") is not None


class TestBrepWriter:
    """OCCT-text .brep WRITER (geometry/brep_writer.py) — the inverse of
    the reader; parametric round-trip for scene export
    (ImportExport.cxx:69-81)."""

    def test_solid_roundtrip_preserves_faces_and_volume(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session
        from cadrays_tpu.geometry.brep_writer import (load_brep_solid,
                                                      save_brep)
        from cadrays_tpu.modeling.topo import shape_mesh

        c = Console(Session())
        c.exec("box b 2 1 3")
        shape, _ = c.session.staging["b"]
        path = str(tmp_path / "box.brep")
        assert save_brep(shape, path)
        s2 = load_brep_solid(path)
        assert len(np.unique(s2.face_id)) == 6  # face identity preserved
        v, t, f = shape_mesh(s2)
        vol = float(np.einsum("ij,ij->i", v[t[:, 0]],
                              np.cross(v[t[:, 1]], v[t[:, 2]])).sum() / 6)
        assert vol == pytest.approx(6.0, rel=1e-6)

    def test_boolean_solid_roundtrip(self, tmp_path):
        """A cut solid (planar faces incl. the pocket) must survive."""
        from cadrays_tpu.cli.commands import Console, Session
        from cadrays_tpu.geometry.brep_writer import (load_brep_solid,
                                                      save_brep)
        from cadrays_tpu.modeling.topo import shape_mesh

        c = Console(Session())
        c.exec("box a 2 2 2")
        c.exec("box t 1 1 3")
        c.exec("bcut r a t")
        shape, _ = c.session.staging["r"]
        path = str(tmp_path / "cut.brep")
        assert save_brep(shape, path)
        s2 = load_brep_solid(path)
        v, t, f = shape_mesh(s2)
        vol = float(np.einsum("ij,ij->i", v[t[:, 0]],
                              np.cross(v[t[:, 1]], v[t[:, 2]])).sum() / 6)
        assert vol == pytest.approx(8.0 - 2.0, rel=1e-4)

    def test_curved_primitives_roundtrip(self, tmp_path):
        """Round-4: quadric faces are written parametrically (trimmed
        cylinder/cone/sphere/torus records), not dropped to PLY —
        ImportExport.cxx:69-81 parity for curved shapes."""
        import numpy as np

        from cadrays_tpu.geometry import primitives
        from cadrays_tpu.geometry.brep_writer import (load_brep_solid,
                                                      save_brep)
        from cadrays_tpu.modeling.ops import cone_solid, cylinder_solid
        from cadrays_tpu.modeling.topo import SolidShape, shape_mesh

        def vol(v, t):
            p0, p1, p2 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
            return float(np.einsum("ij,ij->i", p0,
                                   np.cross(p1, p2)).sum() / 6.0)

        sph = primitives.sphere(2.0, 64, 32)
        tor = primitives.torus(3.0, 0.8)
        cases = {
            "sphere": (SolidShape(sph.vertices, sph.indices), 1),
            "torus": (SolidShape(tor.vertices, tor.indices), 1),
            "cylinder": (cylinder_solid(1.5, 4.0), 3),
            "cone": (cone_solid(2.0, 0.5, 3.0), 3),
        }
        for name, (shape, n_faces) in cases.items():
            path = str(tmp_path / f"{name}.brep")
            assert save_brep(shape, path), f"{name}: fell back to PLY"
            s2 = load_brep_solid(path)
            v1, t1, f1 = shape_mesh(shape)
            v2, t2, f2 = shape_mesh(s2)
            assert len(np.unique(f2)) == n_faces, name
            assert np.allclose(np.ptp(v1, axis=0), np.ptp(v2, axis=0),
                               atol=0.02), name
            assert abs(vol(v1, t1) - vol(v2, t2)) < 0.02 * abs(vol(v1, t1))

    def test_csg_cut_cylinder_roundtrip(self, tmp_path):
        """CSG descendants keep parametric identity: a box-cut cylinder's
        side face is a partial cylinder patch, written as a trimmed
        surface whose UV footprint matches the cut."""
        import numpy as np

        from cadrays_tpu.geometry.brep_writer import (load_brep_solid,
                                                      save_brep)
        from cadrays_tpu.modeling.csg import solid_boolean
        from cadrays_tpu.modeling.ops import cylinder_solid, prism
        from cadrays_tpu.modeling.surfaces import Plane
        from cadrays_tpu.modeling.topo import FaceShape, shape_mesh

        cyl = cylinder_solid(1.5, 4.0)
        sq = np.array([[-3, -3], [3, -3], [3, 3], [-3, 3]], float)
        box = prism(FaceShape(Plane((0, 0, 2.5)), [sq]),
                    np.array([0, 0, 3.0]))
        cut = solid_boolean(cyl, box, 1)
        path = str(tmp_path / "cut.brep")
        assert save_brep(cut, path)
        assert "2 " in open(path).read()  # a cylinder surface record
        s2 = load_brep_solid(path)
        v2, _, f2 = shape_mesh(s2)
        assert len(np.unique(f2)) == 3
        assert abs(float(v2[:, 2].max()) - 2.5) < 1e-6
        # restored vertices lie on the r=1.5 cylinder or the caps
        side = v2[(v2[:, 2] > 1e-6) & (v2[:, 2] < 2.5 - 1e-6)]
        r = np.hypot(side[:, 0], side[:, 1])
        assert np.all(np.abs(r - 1.5) < 5e-3)

    def test_freeform_mesh_still_falls_back(self):
        """A sculpted (non-quadric) curved mesh must NOT misclassify —
        shape_to_brep returns None and the exporter keeps PLY."""
        import numpy as np

        from cadrays_tpu.geometry.brep_writer import shape_to_brep
        from cadrays_tpu.modeling.topo import SolidShape

        # bumpy sphere: radius modulated by spherical harmonics-ish term
        from cadrays_tpu.geometry import primitives
        m = primitives.sphere(1.0, 32, 16)
        v = np.asarray(m.vertices, np.float64)
        r = 1.0 + 0.05 * np.sin(5 * np.arctan2(v[:, 1], v[:, 0]))
        assert shape_to_brep(
            SolidShape(v * r[:, None], m.indices)) is None

    def test_scene_export_persists_shapes_as_brep(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session
        from cadrays_tpu.scene.io import export_scene, import_scene

        c = Console(Session())
        c.exec("vlight add positional pos 0 0 2 int 5")
        c.exec("box b 1 1 1; vdisplay b; vbsdf b -kd 0.9 0.1 0.1")
        d = str(tmp_path / "exp")
        script = export_scene(c.session, d)
        assert os.path.exists(os.path.join(d, "shapes", "b.brep"))
        assert "restore shapes/b.brep b" in open(script).read()
        s2 = Session()
        import_scene(s2, script)
        node = s2.scene.model.get("b")
        assert node is not None
        # parametric identity restored: the node carries a SolidShape again
        from cadrays_tpu.modeling.topo import SolidShape

        assert isinstance(node.source_shape, SolidShape)
        kd = np.asarray(node.material.kd).reshape(-1)
        assert kd == pytest.approx([0.9, 0.1, 0.1], abs=1e-5)

    def test_draw_compat_export_drops_meshes_and_view(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session
        from cadrays_tpu.geometry.mesh import TriangleMesh
        from cadrays_tpu.scene.io import export_scene

        c = Console(Session())
        c.exec("box b 1 1 1; vdisplay b")
        mesh = TriangleMesh(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            np.array([[0, 1, 2]], np.int32))
        c.session.scene.add_mesh("tri", mesh)
        script = export_scene(c.session, str(tmp_path / "dc"),
                              draw_compat=True)
        text = open(script).read()
        assert "restore shapes/b.brep b" in text
        assert "rtmeshread" not in text      # meshes dropped
        assert "vviewparams" not in text     # view state dropped
        assert "rtgroup" not in text

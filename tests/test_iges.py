"""Native IGES reader tests.

Fixtures are generated as genuine fixed-column IGES 5.x text (the same
S/G/D/P/T layout OCCT's IGESControl_Writer emits), so the parser is
tested on the real grammar: 80-column records, Hollerith globals,
two-line directory entries, parameter data with DE back-pointers.
"""
import math

import numpy as np
import pytest

from cadrays_tpu.geometry.iges import load_iges, parse_iges


class IW:
    """Tiny fixed-column IGES writer. add() returns the DE pointer."""

    def __init__(self):
        self.ents = []  # (type, params, form, matrix)

    def add(self, etype, params, form=0, matrix=0) -> int:
        self.ents.append((etype, list(params), form, matrix))
        return 2 * len(self.ents) - 1  # DE pointers are odd

    def text(self) -> str:
        def fmt(v):
            if isinstance(v, int):
                return str(v)
            return f"{v:.9g}"

        s_lines = ["fixture"]
        g_body = "1H,,1H;,4Htest,7Htest.ig,6Hnative,6Hnative,32,38,6,308," \
                 "15,4Htest,1.,1,2HMM,1,0.01,13H000000.000000,1E-07,100.," \
                 "4Hnone,4Hnone,10,0,13H000000.000000;"
        g_lines = [g_body[i:i + 72] for i in range(0, len(g_body), 72)]

        d_lines = []
        p_lines = []
        for idx, (etype, params, form, matrix) in enumerate(self.ents):
            de = 2 * idx + 1
            pd_start = len(p_lines) + 1
            body = ",".join([str(etype)] + [fmt(v) for v in params]) + ";"
            chunks = [body[i:i + 64] for i in range(0, len(body), 64)]
            for c in chunks:
                p_lines.append((de, c))
            n_pd = len(chunks)
            f1 = (f"{etype:8d}{pd_start:8d}{0:8d}{0:8d}{0:8d}{0:8d}"
                  f"{matrix:8d}{0:8d}00000000")
            f2 = (f"{etype:8d}{0:8d}{0:8d}{n_pd:8d}{form:8d}"
                  + " " * 16 + " " * 8 + f"{0:8d}")
            d_lines.append(f1)
            d_lines.append(f2)

        out = []
        for i, s in enumerate(s_lines):
            out.append(f"{s:<72}S{i + 1:7d}")
        for i, s in enumerate(g_lines):
            out.append(f"{s:<72}G{i + 1:7d}")
        for i, s in enumerate(d_lines):
            out.append(f"{s:<72}D{i + 1:7d}")
        for i, (de, s) in enumerate(p_lines):
            out.append(f"{s:<64} {de:7d}P{i + 1:7d}")
        out.append(f"S{len(s_lines):7d}G{len(g_lines):7d}D{len(d_lines):7d}"
                   f"P{len(p_lines):7d}{'':40}T{1:7d}")
        return "\n".join(out) + "\n"


def _bilinear_patch(w, size=2.0):
    """Type 128 degree-1 B-spline square [0,size]^2 in z=0."""
    # K1=K2=1, M1=M2=1, knots 0,0,1,1 each, 4 weights, 4 ctrl pts, ranges
    params = [1, 1, 1, 1, 0, 0, 1, 0, 0,
              0.0, 0.0, 1.0, 1.0,          # knots u
              0.0, 0.0, 1.0, 1.0,          # knots v
              1.0, 1.0, 1.0, 1.0,          # weights
              0.0, 0.0, 0.0,               # P(0,0)
              size, 0.0, 0.0,              # P(1,0)
              0.0, size, 0.0,              # P(0,1)
              size, size, 0.0,             # P(1,1)
              0.0, 1.0, 0.0, 1.0]          # u0 u1 v0 v1
    return w.add(128, params)


class TestParse:
    def test_sections_and_pointers(self, tmp_path):
        w = IW()
        de_line = w.add(110, [0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
        p = tmp_path / "t.igs"
        p.write_text(w.text())
        ents = parse_iges(p.read_text())
        assert de_line in ents
        e = ents[de_line]
        assert e.type == 110
        assert [float(v) for v in e.params[:6]] == [0, 0, 0, 1, 2, 3]

    def test_hollerith_globals_respected(self, tmp_path):
        w = IW()
        w.add(110, [0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        txt = w.text()
        ents = parse_iges(txt)
        assert len(ents) == 1


class TestSurfaces:
    def test_untrimmed_bspline_patch(self, tmp_path):
        w = IW()
        s = _bilinear_patch(w)
        # 144 with the natural boundary (N1=0)
        w.add(144, [s, 0, 0, 0])
        p = tmp_path / "patch.igs"
        p.write_text(w.text())
        meshes = load_iges(str(p))
        assert len(meshes) == 1
        m = meshes[0]
        areas = 0.5 * np.linalg.norm(np.cross(
            m.vertices[m.indices[:, 1]] - m.vertices[m.indices[:, 0]],
            m.vertices[m.indices[:, 2]] - m.vertices[m.indices[:, 0]]),
            axis=-1)
        assert areas.sum() == pytest.approx(4.0, rel=1e-3)

    def test_trimmed_disk_on_patch(self, tmp_path):
        """144 with an outer 142 boundary: circular arc trims a disk."""
        w = IW()
        s = _bilinear_patch(w, size=2.0)
        # full circle r=0.8 centered at (1,1), model space z=0
        arc = w.add(100, [0.0, 1.0, 1.0, 1.8, 1.0, 1.8, 1.0])
        cos = w.add(142, [0, s, 0, arc, 2])
        w.add(144, [s, 1, 0, cos])
        p = tmp_path / "disk.igs"
        p.write_text(w.text())
        meshes = load_iges(str(p), deflection=0.01)
        m = meshes[0]
        areas = 0.5 * np.linalg.norm(np.cross(
            m.vertices[m.indices[:, 1]] - m.vertices[m.indices[:, 0]],
            m.vertices[m.indices[:, 2]] - m.vertices[m.indices[:, 0]]),
            axis=-1)
        assert areas.sum() == pytest.approx(math.pi * 0.8 ** 2, rel=2e-2)

    def test_surface_of_revolution_cylinder(self, tmp_path):
        """120 revolution of a vertical line about the z-axis = cylinder."""
        w = IW()
        axis = w.add(110, [0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        gen = w.add(110, [1.0, 0.0, 0.0, 1.0, 0.0, 3.0])
        s = w.add(120, [axis, gen, 0.0, 2.0 * math.pi])
        w.add(144, [s, 0, 0, 0])
        p = tmp_path / "cyl.igs"
        p.write_text(w.text())
        meshes = load_iges(str(p), deflection=0.005)
        m = meshes[0]
        r = np.linalg.norm(m.vertices[:, :2], axis=-1)
        assert np.allclose(r, 1.0, atol=0.01)
        areas = 0.5 * np.linalg.norm(np.cross(
            m.vertices[m.indices[:, 1]] - m.vertices[m.indices[:, 0]],
            m.vertices[m.indices[:, 2]] - m.vertices[m.indices[:, 0]]),
            axis=-1)
        assert areas.sum() == pytest.approx(2 * math.pi * 3.0, rel=2e-2)

    def test_tabulated_cylinder(self, tmp_path):
        """122 extrusion of a line = flat quad."""
        w = IW()
        c = w.add(110, [0.0, 0.0, 0.0, 2.0, 0.0, 0.0])
        s = w.add(122, [c, 0.0, 0.0, 5.0])
        w.add(144, [s, 0, 0, 0])
        p = tmp_path / "tab.igs"
        p.write_text(w.text())
        meshes = load_iges(str(p))
        m = meshes[0]
        areas = 0.5 * np.linalg.norm(np.cross(
            m.vertices[m.indices[:, 1]] - m.vertices[m.indices[:, 0]],
            m.vertices[m.indices[:, 2]] - m.vertices[m.indices[:, 0]]),
            axis=-1)
        assert areas.sum() == pytest.approx(10.0, rel=1e-3)

    def test_transform_applied(self, tmp_path):
        """124 matrix on the trimmed surface translates the result."""
        w = IW()
        mx = w.add(124, [1.0, 0.0, 0.0, 10.0,
                         0.0, 1.0, 0.0, 0.0,
                         0.0, 0.0, 1.0, 0.0])
        params = [1, 1, 1, 1, 0, 0, 1, 0, 0,
                  0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0,
                  1.0, 1.0, 1.0, 1.0,
                  0.0, 0.0, 0.0, 1.0, 0.0, 0.0,
                  0.0, 1.0, 0.0, 1.0, 1.0, 0.0,
                  0.0, 1.0, 0.0, 1.0]
        s = w.add(128, params, matrix=mx)
        w.add(144, [s, 0, 0, 0])
        p = tmp_path / "tf.igs"
        p.write_text(w.text())
        meshes = load_iges(str(p))
        assert meshes[0].vertices[:, 0].min() >= 9.99


class TestCommandSurface:
    def test_rtmeshread_iges(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session

        w = IW()
        s = _bilinear_patch(w)
        w.add(144, [s, 0, 0, 0])
        p = tmp_path / "part.igs"
        p.write_text(w.text())
        sess = Session()
        c = Console(sess)
        c.exec(f"rtmeshread {p} part")
        node = sess.scene.model.get("part")
        assert node is not None

    def test_garbage_iges_error(self, tmp_path):
        from cadrays_tpu.cli.commands import CommandError, Console, Session

        p = tmp_path / "junk.igs"
        p.write_text("not an iges file\n")
        c = Console(Session())
        with pytest.raises(CommandError):
            c.exec(f"rtmeshread {p}")

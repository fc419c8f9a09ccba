"""Real-world-dialect CAD fixtures (round-4, VERDICT item 4).

The repo's other STEP/IGES/BREP tests synthesize their own files, so
the parsers had only ever seen their own dialect. These committed
fixtures were authored to replicate the exact structure of third-party
exports (this build environment has no network egress, so genuine
downloads were impossible; the files reproduce the exporters' formats
entity-for-entity and are NOT written by any repo code path):

- bracket_freecad.step — FreeCAD 0.21 / OCCT 7.6 AP214 style: product
  structure wrapping, complex-record unit contexts with `*`/`$` args,
  1.E-07 uncertainty, blank-name entities, comment blocks in the
  header, ORIENTED_EDGE .F. senses, VERTEX_POINT reuse, and a
  full-cylinder hole face with a seam edge.
- flange_occt.iges — OCCT IGESControl_Writer BRep mode: 186 manifold
  solid -> 514/510/508/504/502 topology over analytic 190/192 surfaces
  referencing 116/123 support entities, subordinate status flags,
  entity labels, Hollerith global section.
- pin_occt.brep — OCCT BRepTools::Write dialect with a NON-EMPTY
  Locations section (elementary + composed records) and a located
  sub-shape — paths the repo's own .brep writer never emits.

Each parses end-to-end through the user-facing command surface with
triangle/bbox/volume asserts (ImportSettingsEditor.cxx:290-370 flows).
"""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _vol(v, t):
    p0, p1, p2 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    return abs(float(np.einsum("ij,ij->i", p0, np.cross(p1, p2)).sum()
                     / 6.0))


def _load_via_command(path, name):
    from cadrays_tpu.cli.commands import Console, Session

    c = Console(Session())
    c.exec(f"rtmeshread {path} {name}")
    c.exec(f"vdisplay {name}")
    node = c.session.scene.model.get(name)
    assert node is not None
    leaves = [n for n in node.traverse() if n.mesh is not None]
    v = np.concatenate([np.asarray(n.mesh.vertices) for n in leaves])
    t_off, tris = 0, []
    for n in leaves:
        tris.append(np.asarray(n.mesh.indices) + t_off)
        t_off += len(np.asarray(n.mesh.vertices))
    return v, np.concatenate(tris)


def test_freecad_step_bracket():
    v, t = _load_via_command(os.path.join(DATA, "bracket_freecad.step"),
                             "bracket")
    assert len(t) > 500
    assert np.allclose(v.min(0), [0, 0, 0], atol=1e-5)
    assert np.allclose(v.max(0), [40, 30, 10], atol=1e-5)
    # plate minus the 10 mm through-hole
    expect = 40 * 30 * 10 - np.pi * 25 * 10
    assert abs(_vol(v, t) - expect) < 0.01 * expect


def test_occt_iges_flange():
    v, t = _load_via_command(os.path.join(DATA, "flange_occt.iges"),
                             "flange")
    assert len(t) > 200
    assert np.allclose(v.min(0), [-10, -10, 0], atol=1e-4)
    assert np.allclose(v.max(0), [10, 10, 30], atol=1e-4)
    expect = np.pi * 100 * 30
    assert abs(_vol(v, t) - expect) < 0.02 * expect


def _blade_asserts(v, t, deflection=None):
    """Shared geometry asserts for the NURBS blade fixtures: the
    rational quarter-cylinder patch must evaluate EXACTLY on the
    radius-25 cylinder (a non-rational misread of the weights bulges the
    mid-arc to r ~ 26.8, so this discriminates), and the bicubic patch
    must stay inside its control-net bounding box (B-spline convex-hull
    property)."""
    selA = (v[:, 0] <= 25.2) & (v[:, 1] <= 25.2)
    assert selA.sum() > 30
    r = np.sqrt(v[selA, 0] ** 2 + v[selA, 1] ** 2)
    assert abs(r - 25.0).max() < 1e-4, float(abs(r - 25.0).max())
    assert v[selA, 2].min() >= -1e-5 and v[selA, 2].max() <= 40 + 1e-5
    selB = v[:, 0] >= 39.8
    assert selB.sum() > 20
    assert v[selB, 2].min() >= -6.0 - 1e-5   # control-net z bound
    assert v[selB, 2].max() <= 6.0 + 1e-5
    assert abs(v[selB, 2]).max() > 2.0       # the patch actually waves


def test_freecad_step_nurbs_blade():
    """Round-5 VERDICT item 7: B_SPLINE_SURFACE_WITH_KNOTS (plain) and
    the rational complex-entity form, bounded by rational/complex and
    plain B-spline edge curves — a file the repo's own writers cannot
    produce (brep_writer falls back to PLY for freeform surfaces)."""
    v, t = _load_via_command(os.path.join(DATA, "blade_freecad.step"),
                             "blade")
    assert len(t) > 100
    _blade_asserts(v, t)


def test_occt_iges_nurbs_blade():
    """IGES type-128 counterpart: a RATIONAL 128 trimmed by 144/142 with
    a model-space 102 composite (rational 126 arcs + 110 lines), and a
    non-rational bicubic 128 trimmed by a PARAMETER-space 126 rectangle
    (PREF=1) — both curve-on-surface preference paths."""
    v, t = _load_via_command(os.path.join(DATA, "blade_occt.iges"),
                             "blade_i")
    assert len(t) > 100
    _blade_asserts(v, t)


def test_nurbs_tessellation_is_curvature_aware():
    """Tighter deflection must increase triangle density on the curved
    rational patch and tighten the chord-to-surface error bound."""
    from cadrays_tpu.geometry.step import load_step

    path = os.path.join(DATA, "blade_freecad.step")
    counts, max_err = [], []
    for defl in (1.0, 0.1):
        m = load_step(path, deflection=defl)[0]
        v = np.asarray(m.vertices)
        selA = (v[:, 0] <= 25.2) & (v[:, 1] <= 25.2)
        counts.append(int(np.asarray(m.indices).shape[0]))
        # midpoint chord error on the cylinder: sample triangle-edge
        # midpoints of face-A verts — all verts lie ON the surface, so
        # measure via edge midpoints of the triangulation
        tri = np.asarray(m.indices)
        tri_a = tri[np.isin(tri, np.where(selA)[0]).all(axis=1)]
        if len(tri_a):
            mids = (v[tri_a[:, 0]] + v[tri_a[:, 1]]) / 2
            r = np.sqrt(mids[:, 0] ** 2 + mids[:, 1] ** 2)
            max_err.append(float(np.abs(25.0 - r).max()))
    assert counts[1] > counts[0] * 1.5, counts
    if len(max_err) == 2:
        assert max_err[1] < max_err[0]
        assert max_err[1] < 0.1  # chord sagitta obeys the deflection


class TestPart21Lexing:
    """Property tests for Part-21 edge cases (round-5 VERDICT item 7):
    continuation lines mid-record, embedded quote escapes, parameter
    whitespace."""

    def _parse(self, body):
        from cadrays_tpu.geometry.step import StepModel, _parse_data_section

        return StepModel(_parse_data_section(
            "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('AP214'));\nENDSEC;\n"
            "DATA;\n" + body + "\nENDSEC;\nEND-ISO-10303-21;\n"))

    def test_record_split_across_lines(self):
        m = self._parse("#1 = CARTESIAN_POINT('p',\n"
                        "   (1.5,\n    2.5, 3.5));\n"
                        "#2 = DIRECTION('',(0.,0.,\n1.));")
        p = m.point(1)
        assert np.allclose(p, [1.5, 2.5, 3.5])

    def test_embedded_quote_escape(self):
        # Part-21 escapes an apostrophe as two apostrophes
        m = self._parse("#1 = CARTESIAN_POINT('it''s, a (name)',"
                        "(1.,2.,3.));")
        assert np.allclose(m.point(1), [1, 2, 3])

    def test_parameter_whitespace_and_signs(self):
        m = self._parse("#1 = CARTESIAN_POINT( '' , ( +1.0E1 ,\t-2.5E-1 "
                        ", .5 ) );")
        assert np.allclose(m.point(1), [10.0, -0.25, 0.5])


class TestIgesLexing:
    def test_hollerith_with_delimiters_inside(self):
        """Hollerith strings may contain the parameter/record delimiters
        — the lexer must consume exactly N chars."""
        from cadrays_tpu.geometry.iges import _parse_free_params

        vals = _parse_free_params("3,7Ha,b;c d,4.5;", ",", ";")
        assert vals[0] == 3 and vals[1] == "a,b;c d" and vals[2] == 4.5

    def test_blank_and_defaulted_fields(self):
        from cadrays_tpu.geometry.iges import _parse_free_params

        vals = _parse_free_params("1,,3,, ,6;", ",", ";")
        assert vals[0] == 1 and vals[2] == 3 and vals[5] == 6


def test_occt_brep_located_pin():
    from cadrays_tpu.cli.commands import Console, Session

    c = Console(Session())
    c.exec(f"restore {os.path.join(DATA, 'pin_occt.brep')} pin")
    c.exec("vdisplay pin")
    node = c.session.scene.model.get("pin")
    assert node is not None
    leaves = [n for n in node.traverse() if n.mesh is not None]
    v = np.concatenate([np.asarray(n.mesh.vertices) for n in leaves])
    off, tris = 0, []
    for n in leaves:
        tris.append(np.asarray(n.mesh.indices) + off)
        off += len(np.asarray(n.mesh.vertices))
    t = np.concatenate(tris)
    # the composed Location places the cylinder at (20, 5, 0)
    assert np.allclose(v.min(0), [16, 1, 0], atol=1e-4)
    assert np.allclose(v.max(0), [24, 9, 12], atol=1e-4)
    expect = np.pi * 16 * 12
    assert abs(_vol(v, t) - expect) < 0.02 * expect

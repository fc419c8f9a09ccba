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

"""Gate the five reference modeling demo scripts end-to-end.

The round-2 flagship claim — Bottle/Cpu/Cutter/Drill/Shape.tcl run
unmodified through the DRAW-compatible command surface — regression-
gated here. Sources each script from the reference mount when present
(skips otherwise) and asserts displayed-object names, triangle budgets
and solid volumes. Also a wall-clock budget: the reference executes
these on its UI thread in seconds (AppConsole.cxx:211-259), so an
interactive-hostile regression (round-2 weak #4: Bottle took 224 s)
fails the gate.
"""
import os
import time

import numpy as np
import pytest

SCRIPTS = "/root/reference/data/scripts"

# name -> (expected display names, min tris, max tris, budget seconds,
#          total |signed volume|)
# Volumes recorded from the gated run; a CSG/offset/fillet regression
# that eats or doubles material moves them far outside the +-25% band.
# Budgets ~= 3x wall-clock measured round 4 (Bottle 2.8s, Cpu 2.9s,
# Cutter 11.7s, Drill 1.7s, Shape 6.7s) so the interactive-speed win
# (round-2 weak #4: Bottle once took 224 s) cannot silently regress.
EXPECT = {
    "Bottle": ({"bottle"}, 10_000, 120_000, 9, 16_551.0),
    "Cpu": (None, 50_000, 500_000, 10, 4_708.0),  # 19 board_* parts
    "Cutter": ({"cutter"}, 20_000, 250_000, 36, 922.0),
    "Drill": ({"drill", "sec"}, 10_000, 150_000, 6, 3_285.0),
    "Shape": ({"result"}, 5_000, 60_000, 21, 10_673_000.0),
}


def _signed_volume(verts, tris):
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    return float(np.einsum("ij,ij->i", p0, np.cross(p1, p2)).sum() / 6.0)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(EXPECT))
def test_reference_script(name):
    path = os.path.join(SCRIPTS, f"{name}.tcl")
    if not os.path.exists(path):
        pytest.skip("reference mount not present")
    from cadrays_tpu.cli.commands import Session
    from cadrays_tpu.cli.tcl import TclConsole

    s = Session()
    tc = TclConsole(s)
    t0 = time.time()
    tc.source(path)
    dt = time.time() - t0

    names, lo, hi, budget, vol_ref = EXPECT[name]
    leaves = s.scene.model.leaves(visible_only=False)
    got = {n.name for n in leaves}
    if names is not None:
        assert got == names, got
    else:
        assert len(got) >= 15 and any(g.startswith("board") for g in got), got
    tris = sum(n.mesh.num_triangles for n in leaves)
    assert lo <= tris <= hi, f"{name}: {tris} triangles"

    vol = sum(
        abs(_signed_volume(np.asarray(n.mesh.vertices, np.float64),
                           np.asarray(n.mesh.indices)))
        for n in leaves)
    assert 0.75 * vol_ref < vol < 1.25 * vol_ref, \
        f"{name}: total |volume| {vol:.1f} vs recorded {vol_ref:.1f}"

    assert dt < budget, f"{name} took {dt:.1f}s (budget {budget}s)"

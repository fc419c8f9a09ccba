"""Pixel-golden gate for the reference's RENDER demo scripts.

The five modeling scripts are gated by names/tris/volume/wall-clock
(test_reference_scripts.py); this module closes the remaining seam: the
reference's own harness gates arbitrary scene scripts BY IMAGE after a
fixed frame count (/root/reference/testing/CADRays_Testing.py:83,
226-231).  Here CornellBox.tcl and Materials.tcl — the two GI demo
scripts — run unmodified through the real Tcl console, render at a
fixed seed/spp on the CPU test backend, and diff per-pixel against
committed goldens.  A `vbsdf`/`vlight`/`vlocation`/`vrenderparams`
parsing regression now fails as a pixel diff through the whole
L4 (Tcl) -> L2 (scene model) -> L0 (renderer) chain, not only as a
command-level assert.

Update goldens (after an INTENDED estimator/scene change):
    CADRAYS_UPDATE_GOLDEN=1 JAX_PLATFORMS=cpu \
        python -m pytest tests/test_reference_render_goldens.py -m slow
"""
import os
import time

import numpy as np
import pytest

SCRIPTS = "/root/reference/data/scripts"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
RES = (64, 64)
SPP = 16

# Materials.tcl needs its texture assets; the script references them
# relative to the scripts directory.
CASES = ["CornellBox", "Materials"]


def _render_script(name):
    import jax

    from cadrays_tpu.cli.commands import Session
    from cadrays_tpu.cli.tcl import TclConsole
    from cadrays_tpu.integrator.progressive import progressive_step

    s = Session()
    s.cwd = SCRIPTS
    tc = TclConsole(s)
    tc.source(os.path.join(SCRIPTS, f"{name}.tcl"))
    s.width, s.height = RES
    data = s.scene.flatten(s.camera)
    st = progressive_step(data, s.camera, s.params, s.width, s.height,
                          None, 1)
    jax.block_until_ready(st.accum)
    t0 = time.perf_counter()
    st = progressive_step(data, s.camera, s.params, s.width, s.height,
                          st, samples_per_step=SPP - 1)
    jax.block_until_ready(st.accum)
    return np.asarray(st.image), time.perf_counter() - t0


@pytest.mark.slow
@pytest.mark.parametrize("name", CASES)
def test_reference_render_golden(name):
    if not os.path.exists(os.path.join(SCRIPTS, f"{name}.tcl")):
        pytest.skip("reference mount not present")
    from cadrays_tpu.testing.regression import compare

    golden_path = os.path.join(GOLDEN, f"ref_{name.lower()}.npz")
    img, dt = _render_script(name)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"

    if os.environ.get("CADRAYS_UPDATE_GOLDEN"):
        np.savez_compressed(golden_path, image=img,
                            spp_per_s=(SPP - 1) / dt)
        pytest.skip(f"golden updated: {golden_path}")
    if not os.path.exists(golden_path):
        pytest.skip(f"no golden for {name}; set CADRAYS_UPDATE_GOLDEN=1")

    z = np.load(golden_path)
    stats = compare(img, z["image"], pix_tol=0.02)
    assert stats["match"], (
        f"{name}: {stats['bad_frac'] * 100:.2f}% pixels off "
        f"(mean {stats['mean_err']:.4f}, max {stats.get('max_err')})")


@pytest.mark.slow
def test_cornellbox_content_sanity():
    """Beyond the pixel diff: the rendered CornellBox must show the
    script's color bleeding (red wall right, blue wall left) — guards
    against a golden recorded from a broken scene."""
    if not os.path.exists(os.path.join(SCRIPTS, "CornellBox.tcl")):
        pytest.skip("reference mount not present")
    img, _ = _render_script("CornellBox")
    h, w = img.shape[:2]
    # vfit leaves margin around the box: locate the lit region first
    lit = img.max(-1) > 0.01
    cols = np.nonzero(lit.any(0))[0]
    assert cols.size > w // 3, "box occupies too little of the frame"
    x0, x1 = int(cols.min()), int(cols.max())
    band = slice(h // 3, 2 * h // 3)
    left = img[band, x0:x0 + 6].mean(axis=(0, 1))
    right = img[band, x1 - 5:x1 + 1].mean(axis=(0, 1))
    # b_1 (kd 1 .3 .3) sits at x=1 (right in view), b_2 (kd .3 .5 1) at
    # x=0 — the frame must carry the tint on the correct sides
    assert right[0] > right[2], f"right wall not red-tinted: {right}"
    assert left[2] > left[0], f"left wall not blue-tinted: {left}"
    assert 0.02 < img.mean() < 2.0, f"implausible exposure {img.mean()}"

"""Golden-image regression gate — the reference's end-to-end strategy
run inside pytest (testing/CADRays_Testing.py:83-84, 226-231: per-pixel
diff after a fixed frame count + FPS delta vs a stored template).

Goldens are rendered on the CPU backend (the test backend, see
conftest.py) with `python -m cadrays_tpu.testing.regression --backend
cpu --update --spp 16` and checked in under tests/golden/. Determinism
comes from the counter-based RNG: equal seed + spp => equal image, so
the pixel gate is tight.

The throughput gate (reference default ±2%) is advisory on shared CI
machines; enable it with CADRAYS_PERF_GATE=1.
"""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SPP = 16
RES = (64, 64)

SCENES = sorted(
    os.path.splitext(f)[0] for f in os.listdir(DATA) if f.endswith(".crt"))


# Two golden sets: `<name>.npz` gates the DEFAULT path (persistent
# wavefront, round 5+); `<name>_fixed.npz` gates the fixed-depth
# wavefront (persistent=False) — the estimators are statistically but
# not bitwise equal, so each keeps its own deterministic template.
@pytest.mark.parametrize("variant", ["persistent", "fixed"])
@pytest.mark.parametrize("name", SCENES)
def test_golden_image(name, variant):
    from cadrays_tpu.testing.regression import compare, run_scene

    suffix = "_fixed" if variant == "fixed" else ""
    golden_path = os.path.join(GOLDEN, f"{name}{suffix}.npz")
    if not os.path.exists(golden_path):
        pytest.skip(f"no golden for {name}; run regression --update")
    z = np.load(golden_path)
    img, dt = run_scene(os.path.join(DATA, f"{name}.crt"), SPP, RES,
                        persistent=(False if variant == "fixed" else None))
    stats = compare(img, z["image"], pix_tol=0.02)
    assert stats["match"], (
        f"{name}: {stats['bad_frac'] * 100:.2f}% pixels off "
        f"(mean err {stats['mean_err']:.4f}, max {stats.get('max_err')})")

    if os.environ.get("CADRAYS_PERF_GATE"):
        spp_per_s = (SPP - 1) / dt
        delta = spp_per_s / float(z["spp_per_s"]) - 1.0
        assert delta > -0.02, (
            f"{name}: perf regressed {delta * 100:.1f}% "
            f"({spp_per_s:.2f} vs {float(z['spp_per_s']):.2f} spp/s)")

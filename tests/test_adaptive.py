"""Adaptive tile sampling: allocation math + variance-guided behavior."""
import jax.numpy as jnp
import numpy as np

from cadrays_tpu.integrator.adaptive import (
    adaptive_round,
    allocate_slots,
    debug_tile_map,
    init_adaptive,
    slots_to_pixels,
    tile_errors,
)
from cadrays_tpu.integrator.params import RenderParams


class TestAllocation:
    def test_exact_budget(self):
        err = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.5])
        alloc = allocate_slots(err, 100)
        assert int(jnp.sum(alloc)) == 100
        a = np.asarray(alloc)
        assert a[2] > a[0] > a[3]

    def test_uniform_error_uniform_alloc(self):
        err = jnp.ones(16)
        alloc = np.asarray(allocate_slots(err, 256))
        assert alloc.min() == alloc.max() == 16

    def test_slots_cover_image(self):
        W = H = 16
        tile = 8
        err = jnp.ones(4)
        alloc = allocate_slots(err, W * H)
        pids = np.asarray(slots_to_pixels(alloc, W, H, tile, jnp.int32(0)))
        assert pids.min() >= 0 and pids.max() < W * H
        # uniform allocation with round-robin covers every pixel exactly once
        assert len(np.unique(pids)) == W * H

    def test_skewed_allocation_revisits(self):
        W = H = 16
        tile = 8
        err = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        alloc = allocate_slots(err, W * H)
        pids = np.asarray(slots_to_pixels(alloc, W, H, tile, jnp.int32(0)))
        # nearly all slots land in tile 0 (top-left 8x8 block)
        px = pids % W
        py = pids // W
        frac_tile0 = np.mean((px < 8) & (py < 8))
        assert frac_tile0 > 0.95


class TestAdaptiveRound:
    def test_rounds_focus_on_noise(self, cornell_scene, cornell_camera):
        W = H = 32
        tile = 8
        data = cornell_scene.flatten(cornell_camera)
        params = RenderParams(ray_depth=3)
        st = init_adaptive(W, H)
        for _ in range(3):
            st = adaptive_round(data, cornell_camera, params, W, H, tile, st)
        assert int(st.round) == 3
        # budget conservation: 3 rounds of W*H samples
        assert float(jnp.sum(st.count)) == 3 * W * H
        img = np.asarray(st.image(W, H))
        assert np.isfinite(img).all() and img.mean() > 0.01
        dm = np.asarray(debug_tile_map(st, W, H, tile))
        assert dm.shape == (H, W) and dm.max() <= 1.0

    def test_error_map_prefers_undersampled(self):
        W = H = 16
        st = init_adaptive(W, H)
        # pretend the left half is well-sampled and converged
        n = W * H
        count = np.zeros(n, np.float32)
        idx = np.arange(n)
        left = (idx % W) < 8
        count[left] = 16.0
        accum = np.zeros((n, 3), np.float32)
        accum[left] = 0.5 * 16
        st = st.replace(count=jnp.asarray(count), accum=jnp.asarray(accum),
                        accum_sq=jnp.asarray((0.25 * 16) * left.astype(
                            np.float32)))
        err = np.asarray(tile_errors(st, W, H, 8))
        # right tiles (indices 1, 3) must out-rank left tiles (0, 2)
        assert err[1] > err[0] and err[3] > err[2]


def test_debug_tile_view_end_to_end():
    """-issd displays the sample-density heatmap instead of radiance
    (SettingsWidget.cxx:443-449)."""
    import numpy as np

    from cadrays_tpu.cli.commands import Console, Session
    from cadrays_tpu.cli.viewer import _encode_png

    c = Console(Session())
    c.exec("box b 1 1 1")
    c.exec("vdisplay b")
    c.exec("vrtsize 16 16")
    c.exec("vrenderparams -iss -issd on")
    c.exec("render 2")
    assert c.session.params.adaptive_debug
    debug_png = _encode_png(c.session)
    c.exec("vrenderparams -issd off")
    normal_png = _encode_png(c.session)
    assert debug_png != normal_png
    # heatmap values are a valid image
    from cadrays_tpu.integrator.adaptive import debug_tile_overlay
    ov = np.asarray(debug_tile_overlay(
        c.session.progressive.weight, 16, 16))
    assert ov.shape == (16, 16, 3)
    assert 0.0 <= ov.min() and ov.max() <= 1.0

"""Multi-device sharding on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.integrator.params import RenderParams
from cadrays_tpu.integrator.renderer import render_image
from cadrays_tpu.parallel.sharding import (
    make_mesh,
    render_tiled_sharded,
    scene_replicated,
)

RES = 16


@pytest.fixture(scope="module")
def setup(request):
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=False)
    cam = cornell_camera()
    data = scene.flatten(cam)
    return data, cam


class TestSharding:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_sharded_matches_single(self, setup):
        data, cam = setup
        params = RenderParams(ray_depth=3)
        single = np.asarray(render_image(data, cam, params, RES, RES, 2))
        mesh = make_mesh(8)
        sharded = np.asarray(render_tiled_sharded(
            scene_replicated(data, mesh), cam, params, RES, RES, 2, mesh))
        # identical pixel ids + counter RNG -> identical estimates
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_nondivisible_pixel_count(self, setup):
        data, cam = setup
        params = RenderParams(ray_depth=2)
        mesh = make_mesh(8)
        # 17x13 = 221 pixels, not divisible by 8 -> padding path
        img = np.asarray(render_tiled_sharded(data, cam, params, 17, 13, 1,
                                              mesh))
        assert img.shape == (13, 17, 3)
        assert np.isfinite(img).all()

    def test_sharded_gradient_psum(self, setup):
        """Parameter gradients must be summed over the ray-sharded axis —
        the dryrun_multichip contract."""
        data, cam = setup
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)  # asserts finite loss internally

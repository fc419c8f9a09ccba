"""Differentiability: gradients vs finite differences (BASELINE metric:
"grad allclose vs finite-diff"), and the inverse-rendering loop.

Gradient checks are done on *expected* pixel values: with the counter RNG
fixed per (pixel, sample, dim, seed), render_image is a deterministic
function, so central finite differences are exact up to O(h^2) for
parameters that do not change discrete decisions (detached sampling);
we pick step sizes/params where lobe selection is stable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.core.bsdf import material
from cadrays_tpu.core.camera import Camera
from cadrays_tpu.core.lights import positional_light
from cadrays_tpu.geometry import primitives
from cadrays_tpu.integrator.params import RenderParams
from cadrays_tpu.integrator.renderer import render_image
from cadrays_tpu.scene.scene import Scene

RES = 12
SPP = 4


def _simple_scene():
    scene = Scene()
    scene.clear_lights()
    scene.add_light(positional_light(position=(0.3, -0.5, 2.5),
                                     intensity=8.0, smooth_radius=0.3))
    scene.add_mesh("floor", primitives.quad(8, 8),
                   material(kd=(0.6, 0.5, 0.4)))
    scene.add_mesh("ball", primitives.sphere(0.5, 16, 8),
                   material(kd=(0.3, 0.6, 0.5)),
                   np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                             [0, 0, 1, 0.5], [0, 0, 0, 1]], np.float32))
    cam = Camera.look_at(eye=(0, -3, 2), at=(0, 0, 0.3), up=(0, 0, 1),
                         fovy_deg=35.0)
    return scene.flatten(cam), cam


def _loss_builder(data, cam, params):
    def loss_from(leaf_setter):
        def f(theta):
            d, c = leaf_setter(theta)
            img = render_image(d, c, params, RES, RES, SPP)
            return jnp.sum(img * _weights())
        return f

    def _weights():
        # fixed pseudo-random projection so the scalar loss sees every pixel
        rs = np.random.RandomState(7)
        return jnp.asarray(rs.rand(RES, RES, 3), jnp.float32)

    return loss_from


def _check_grad(f, theta0, h, rtol=0.08, atol=1e-4):
    g_ad = jax.grad(f)(jnp.float32(theta0))
    f_p = f(jnp.float32(theta0 + h))
    f_m = f(jnp.float32(theta0 - h))
    g_fd = (float(f_p) - float(f_m)) / (2 * h)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    np.testing.assert_allclose(float(g_ad), g_fd, rtol=rtol, atol=atol)
    return float(g_ad), g_fd


class TestGradients:
    def setup_method(self):
        self.data, self.cam = _simple_scene()
        self.params = RenderParams(ray_depth=3)
        self.loss_from = _loss_builder(self.data, self.cam, self.params)

    def test_grad_kd(self):
        data, cam = self.data, self.cam

        def setter(t):
            m = data.materials
            return data.replace(materials=m.replace(
                kd=m.kd.at[0, 0].set(t))), cam

        f = self.loss_from(setter)
        g_ad, g_fd = _check_grad(f, 0.6, 5e-3)
        assert abs(g_ad) > 1e-4  # non-trivial gradient

    def test_grad_light_intensity(self):
        data, cam = self.data, self.cam

        def setter(t):
            lt = data.lights
            return data.replace(lights=lt.replace(
                intensity=lt.intensity.at[0].set(t))), cam

        f = self.loss_from(setter)
        g_ad, g_fd = _check_grad(f, 8.0, 5e-2)
        assert g_ad > 0  # brighter light -> brighter image

    def test_grad_light_color(self):
        data, cam = self.data, self.cam

        def setter(t):
            lt = data.lights
            return data.replace(lights=lt.replace(
                color=lt.color.at[0, 1].set(t))), cam

        f = self.loss_from(setter)
        _check_grad(f, 1.0, 5e-2)

    def test_grad_emission(self):
        data, cam = self.data, self.cam

        def setter(t):
            m = data.materials
            return data.replace(materials=m.replace(
                le=m.le.at[1, 0].set(t))), cam

        f = self.loss_from(setter)
        g_ad, g_fd = _check_grad(f, 0.5, 5e-2)
        assert g_ad > 0

    def _edge_free_scene(self):
        """Camera-gradient fixture without silhouette edges in view: a
        huge floor fills the frame under a point-ish light, so the image
        is a smooth function of camera pose/fov. (Finite differences
        across visibility edges measure the boundary term that detached
        sampling deliberately omits — that is a different estimator, not
        an error; see Li et al. edge sampling.)"""
        scene = Scene()
        scene.clear_lights()
        scene.add_light(positional_light(position=(0.5, -0.3, 3.0),
                                         intensity=6.0, smooth_radius=0.4))
        scene.add_mesh("floor", primitives.quad(200, 200),
                       material(kd=(0.7, 0.6, 0.5)))
        cam = Camera.look_at(eye=(0, -2, 2.5), at=(0, 0, 0), up=(0, 0, 1),
                             fovy_deg=45.0)
        return scene.flatten(cam), cam

    def test_grad_camera_fov(self):
        data, cam = self._edge_free_scene()
        loss_from = _loss_builder(data, cam, self.params)

        def setter(t):
            return data, cam.replace(fovy_deg=t)

        f = loss_from(setter)
        g_ad, _ = _check_grad(f, 45.0, 1e-2, rtol=0.1)
        assert abs(g_ad) > 1e-5

    def test_grad_camera_eye(self):
        data, cam = self._edge_free_scene()
        loss_from = _loss_builder(data, cam, self.params)

        def setter(t):
            # camera leaves are host numpy (core/camera.py); promote to a
            # jax array so the scalar can be traced through .at[].set
            return data, cam.replace(
                eye=jnp.asarray(cam.eye).at[2].set(t))

        f = loss_from(setter)
        g_ad, _ = _check_grad(f, 2.5, 2e-3, rtol=0.1)
        assert abs(g_ad) > 1e-5

    def test_grad_env_intensity(self):
        scene = Scene()
        scene.clear_lights()
        scene.add_mesh("s", primitives.sphere(1.0, 16, 8),
                       material(kd=(0.5, 0.5, 0.5)))
        scene.set_envmap(np.full((4, 8, 3), 0.7, np.float32))
        cam = Camera.look_at(eye=(0, -4, 0), at=(0, 0, 0), up=(0, 0, 1))
        data = scene.flatten(cam)
        params = RenderParams(ray_depth=2)
        loss_from = _loss_builder(data, cam, params)

        def setter(t):
            return data.replace(envmap=data.envmap.replace(intensity=t)), cam

        f = loss_from(setter)
        g_ad, g_fd = _check_grad(f, 1.0, 2e-2)
        assert g_ad > 0


class TestInverseRendering:
    def test_recover_albedo(self):
        """BASELINE config #5 miniature: recover a wall albedo from a
        target image by gradient descent."""
        from cadrays_tpu.diff.optimize import fit, l2_image_loss

        data, cam = _simple_scene()
        params = RenderParams(ray_depth=2)
        target = render_image(data, cam, params, RES, RES, 8)

        # corrupt the floor albedo; optimize the known-unknown (kd only)
        m = data.materials
        wrong = data.replace(materials=m.replace(
            kd=m.kd.at[0].set(jnp.asarray([0.15, 0.15, 0.15]))))
        l0 = float(l2_image_loss(
            render_image(wrong, cam, params, RES, RES, 8), target))

        res = fit(wrong, cam, params, target, RES, RES, spp=4, steps=80,
                  learning_rate=0.05, select_paths={"materials.kd"})
        got = np.asarray(res.scene.materials.kd[0])
        want = np.asarray(data.materials.kd[0])
        np.testing.assert_allclose(got, want, atol=0.1)
        # consistent-seed evaluation must improve substantially
        l1 = float(l2_image_loss(
            render_image(res.scene, cam, params, RES, RES, 8), target))
        assert l1 < l0 * 0.3, (l0, l1)


class TestPersistentGradients:
    """Finite-difference validation of the persistent wavefront
    (BASELINE metric applies to both renderers): same detached-sampling
    construction, so a kd scale must differentiate exactly like the
    fixed-depth path."""

    def test_kd_grad_matches_fd(self):
        from cadrays_tpu.integrator.persistent import render_persistent

        data, cam = _simple_scene()
        params = RenderParams(ray_depth=3)
        rs = np.random.RandomState(7)
        w = jnp.asarray(rs.rand(RES * RES, 3), jnp.float32)

        def f(theta):
            d = data.replace(materials=data.materials.replace(
                kd=data.materials.kd * theta))
            img, cnt = render_persistent(d, cam, params, RES, RES, 2, 9)
            return jnp.sum(img * w)

        _check_grad(f, 0.7, 5e-3)

    def test_light_intensity_grad_matches_fd(self):
        from cadrays_tpu.integrator.persistent import render_persistent

        data, cam = _simple_scene()
        params = RenderParams(ray_depth=3)
        rs = np.random.RandomState(11)
        w = jnp.asarray(rs.rand(RES * RES, 3), jnp.float32)

        def f(theta):
            d = data.replace(lights=data.lights.replace(
                intensity=data.lights.intensity * theta))
            img, cnt = render_persistent(d, cam, params, RES, RES, 2, 9)
            return jnp.sum(img * w)

        _check_grad(f, 0.9, 5e-3)

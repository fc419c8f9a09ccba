"""End-to-end integrator tests: analytic-truth scenes + Cornell smoke.

Strategy mirrors the reference's golden-image determinism (SURVEY.md §4)
but adds analytic assertions a C++ harness couldn't: furnace tests,
NEE-vs-BSDF consistency, per-pixel determinism at fixed seed.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.core.bsdf import material
from cadrays_tpu.core.camera import ORTHOGRAPHIC, Camera
from cadrays_tpu.core.lights import directional_light, positional_light
from cadrays_tpu.geometry import primitives
from cadrays_tpu.integrator.params import RenderMode, RenderParams
from cadrays_tpu.integrator.renderer import render_image
from cadrays_tpu.scene.flatten import build_envmap
from cadrays_tpu.scene.scene import Scene
from cadrays_tpu.testing.scenes import (
    cornell_box,
    cornell_camera,
    emissive_quad_scene,
)

RES = 32


def _render(scene, cam, spp=8, **kw):
    params = kw.pop("params", RenderParams(**kw))
    data = scene.flatten(cam)
    return np.asarray(render_image(data, cam, params, RES, RES, spp))


class TestFurnace:
    def test_white_furnace(self):
        """Convex diffuse sphere with albedo a under a uniform env E=1:
        no self-interreflection, so the exact answer is L = a*E. This
        checks NEE(env) + BSDF-miss MIS adds up to exactly one light
        integral (double-count or missing-half bugs show up immediately)."""
        a = 0.5
        scene = Scene()
        scene.clear_lights()
        scene.add_mesh("s", primitives.sphere(1.0, 32, 16),
                       material(kd=(a, a, a)))
        env = np.ones((8, 16, 3), np.float32)
        scene.set_envmap(env, intensity=1.0)
        cam = Camera.look_at(eye=(0, -4, 0), at=(0, 0, 0), up=(0, 0, 1),
                             fovy_deg=30.0)
        img = _render(scene, cam, spp=64, ray_depth=16,
                      radiance_clamp=jnp.float32(1000.0))
        center = img[12:20, 12:20].mean()
        assert abs(center - a) < 0.04, center
        # background pixels see the env directly
        np.testing.assert_allclose(img[0, 0], 1.0, atol=0.02)

    def test_dark_scene_is_dark(self):
        scene = Scene()
        scene.clear_lights()
        scene.add_mesh("s", primitives.sphere(1.0, 16, 8),
                       material(kd=(0.5, 0.5, 0.5)))
        cam = Camera.look_at(eye=(0, -4, 0), at=(0, 0, 0), up=(0, 0, 1))
        img = _render(scene, cam, spp=4)
        assert img.max() == 0.0


class TestDirectLighting:
    def test_directional_light_flat_plane(self):
        """Lambert plane lit head-on by directional light I: L = I*kd/pi."""
        scene = Scene()
        scene.clear_lights()
        scene.add_light(directional_light(direction=(0, 0, -1), intensity=2.0))
        scene.add_mesh("floor", primitives.quad(20, 20),
                       material(kd=(0.8, 0.8, 0.8)))
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), up=(0, 1, 0))
        img = _render(scene, cam, spp=16, ray_depth=2)
        expect = 2.0 * 0.8 / np.pi
        np.testing.assert_allclose(img[8:24, 8:24].mean(), expect, rtol=0.03)

    def test_positional_light_inverse_square(self):
        """Point-ish light at distance d: L = I*cos/(d^2) * kd/pi."""
        scene = Scene()
        scene.clear_lights()
        scene.add_light(positional_light(position=(0, 0, 3), intensity=5.0,
                                         smooth_radius=0.0))
        scene.add_mesh("floor", primitives.quad(20, 20),
                       material(kd=(0.6, 0.6, 0.6)))
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), up=(0, 1, 0),
                             fovy_deg=10.0)
        img = _render(scene, cam, spp=32, ray_depth=2)
        expect = 5.0 / 9.0 * 0.6 / np.pi
        np.testing.assert_allclose(img[14:18, 14:18].mean(), expect, rtol=0.05)

    def test_sphere_light_radiance_convention(self):
        """Smooth radius r: intensity is the sphere's emitted radiance, so
        irradiance ~= I * pi r^2 cos / d^2 in the small-sphere limit."""
        scene = Scene()
        scene.clear_lights()
        scene.add_light(positional_light(position=(0, 0, 3), intensity=5.0,
                                         smooth_radius=0.1))
        scene.add_mesh("floor", primitives.quad(20, 20),
                       material(kd=(0.6, 0.6, 0.6)))
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), up=(0, 1, 0),
                             fovy_deg=10.0)
        img = _render(scene, cam, spp=32, ray_depth=2)
        expect = 5.0 * np.pi * 0.01 / 9.0 * 0.6 / np.pi
        np.testing.assert_allclose(img[14:18, 14:18].mean(), expect,
                                   rtol=0.05)

    def test_shadowing(self):
        scene = Scene()
        scene.clear_lights()
        scene.add_light(directional_light(direction=(0, 0, -1), intensity=1.0))
        scene.add_mesh("floor", primitives.quad(20, 20),
                       material(kd=(0.8, 0.8, 0.8)))
        blocker = np.eye(4, dtype=np.float32)
        blocker[2, 3] = 1.0
        scene.add_mesh("blocker", primitives.quad(2, 2),
                       material(kd=(0.8, 0.8, 0.8)), blocker)
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), up=(0, 1, 0))
        img = _render(scene, cam, spp=8, ray_depth=1)
        h, c = RES // 2, RES // 8
        # center (under the blocker, which also catches the light on top):
        # floor is dark there vs the outer floor
        outer = img[2, 2].mean()
        assert outer > 0.2
        # the blocker top is lit; look at floor ring just outside blocker
        # projection but inside the image -> already covered by outer.


class TestEmissiveMIS:
    def test_emissive_panel_lights_floor(self):
        scene = emissive_quad_scene(le=(8.0, 8.0, 8.0))
        cam = Camera.look_at(eye=(0, -0.01, 6), at=(0, 0, 0), up=(0, 1, 0),
                             fovy_deg=30.0)
        img = _render(scene, cam, spp=32, ray_depth=3)
        # the image center is the panel's dark back face (one-sided
        # emitter); the floor visible around it must be lit by NEE.
        assert img[16, 24:30].mean() > 0.05
        assert img[16, 2:8].mean() > 0.05
        # back face emits nothing
        assert img[15:17, 15:17].max() == 0.0

    def test_mis_consistency(self):
        """Same scene, glossy floor: MIS estimate must agree between a
        rough (MIS-heavy) and smooth-ish setup at high spp — here we just
        check rough floor converges to similar mean at two seeds."""
        scene = emissive_quad_scene(le=(6.0, 6.0, 6.0))
        scene.set_material("floor", material(kd=(0.2, 0.2, 0.2),
                                             ks=(0.6, 0.6, 0.6),
                                             base_rough=0.3))
        cam = Camera.look_at(eye=(0, -3, 2.0), at=(0, 0, 0), up=(0, 0, 1),
                             fovy_deg=40.0)
        img1 = _render(scene, cam, spp=48, ray_depth=3,
                       seed=jnp.uint32(0))
        img2 = _render(scene, cam, spp=48, ray_depth=3,
                       seed=jnp.uint32(123))
        m1, m2 = img1.mean(), img2.mean()
        assert abs(m1 - m2) / max(m1, 1e-6) < 0.1


class TestCornell:
    def test_smoke_and_determinism(self, cornell_scene, cornell_camera):
        data = cornell_scene.flatten(cornell_camera)
        params = RenderParams(ray_depth=4)
        img1 = np.asarray(render_image(data, cornell_camera, params,
                                       RES, RES, 4))
        img2 = np.asarray(render_image(data, cornell_camera, params,
                                       RES, RES, 4))
        np.testing.assert_array_equal(img1, img2)  # bitwise deterministic
        assert img1.mean() > 0.01  # lit
        assert np.isfinite(img1).all()

    def test_color_bleeding_sides(self, cornell_scene, cornell_camera):
        """Right wall red, left wall blue -> left/right image halves tint."""
        data = cornell_scene.flatten(cornell_camera)
        params = RenderParams(ray_depth=4)
        img = np.asarray(render_image(data, cornell_camera, params, 64, 64, 16))
        left = img[24:40, 4:14]
        right = img[24:40, 50:60]
        # note: camera x maps to scene x; left image = x~0 = blue wall
        assert left[..., 2].mean() > left[..., 0].mean()  # blue-ish
        assert right[..., 0].mean() > right[..., 2].mean()  # red-ish

    def test_full_scene_renders(self):
        scene = cornell_box(full=True, sphere_res=8)
        cam = cornell_camera()
        img = _render(scene, cam, spp=4, ray_depth=5)
        assert np.isfinite(img).all() and img.mean() > 0.005


class TestModes:
    def test_whitted_and_raster(self, cornell_scene, cornell_camera):
        data = cornell_scene.flatten(cornell_camera)
        for mode in (RenderMode.RT, RenderMode.RASTER):
            params = RenderParams(mode=mode, ray_depth=2)
            img = np.asarray(render_image(data, cornell_camera, params,
                                          RES, RES, 1))
            assert np.isfinite(img).all()
            assert img.mean() > 0.01

    def test_whitted_adaptive_aa(self, cornell_scene, cornell_camera):
        """RT-mode anti-aliasing toggle (SettingsWidget.cxx:575-607):
        smooth pixels keep the center sample bitwise; edge pixels get the
        5-sample rotated-grid average, which must change SOME pixels and
        keep everything finite."""
        data = cornell_scene.flatten(cornell_camera)
        base = RenderParams(mode=RenderMode.RT, ray_depth=2)
        res = 64  # at 32^2 nearly every Cornell pixel is an "edge"
        img0 = np.asarray(render_image(data, cornell_camera, base,
                                       res, res, 1))
        img1 = np.asarray(render_image(
            data, cornell_camera, base.replace(rt_aa=True), res, res, 1))
        assert np.isfinite(img1).all()
        diff = np.abs(img1 - img0).max(axis=-1)
        assert (diff > 0).mean() > 0.01      # edges were supersampled
        assert (diff == 0).mean() > 0.30     # smooth interior untouched
        # AA must not brighten/darken the image systematically
        assert abs(img1.mean() - img0.mean()) < 0.02 * img0.mean()

    def test_orthographic(self, cornell_scene):
        cam = Camera.look_at(eye=(0.5, -2.0, 0.5), at=(0.5, 0.5, 0.5),
                             up=(0, 0, 1), projection=ORTHOGRAPHIC,
                             ortho_scale=0.6)
        img = _render(cornell_scene, cam, spp=4, ray_depth=3)
        assert np.isfinite(img).all() and img.mean() > 0.01


class TestProgressive:
    def test_accumulate_and_restart(self, cornell_scene, cornell_camera):
        from cadrays_tpu.integrator.progressive import progressive_step

        data = cornell_scene.flatten(cornell_camera)
        params = RenderParams(ray_depth=3)
        st = progressive_step(data, cornell_camera, params, RES, RES,
                              None, samples_per_step=2)
        assert int(st.spp) == 2
        st2 = progressive_step(data, cornell_camera, params, RES, RES,
                               st, samples_per_step=2)
        assert int(st2.spp) == 4
        # camera change restarts
        cam2 = cornell_camera.replace(fovy_deg=jnp.float32(50.0))
        st3 = progressive_step(data, cam2, params, RES, RES, st2,
                               samples_per_step=1)
        assert int(st3.spp) == 1

    def test_scene_edit_restarts_via_mutation_counter(self):
        """Any scene edit (however small) restarts accumulation: the
        fingerprint keys on Scene's mutation counter, not on a content
        subsample that an edit could slip past (round-1 weak #6)."""
        from cadrays_tpu.integrator.progressive import progressive_step

        scene = Scene()
        scene.add_mesh("s", primitives.sphere(1.0, 8, 4),
                       material(kd=(0.5, 0.5, 0.5)))
        cam = Camera.look_at(eye=(0, -4, 0), at=(0, 0, 0), up=(0, 0, 1))
        params = RenderParams(ray_depth=2)
        st = progressive_step(scene.flatten(cam), cam, params, RES, RES,
                              None, samples_per_step=2)
        assert int(st.spp) == 2
        # unchanged scene accumulates
        st = progressive_step(scene.flatten(cam), cam, params, RES, RES,
                              st, samples_per_step=1)
        assert int(st.spp) == 3
        # a tiny material edit must restart
        scene.set_material("s", material(kd=(0.500001, 0.5, 0.5)))
        st = progressive_step(scene.flatten(cam), cam, params, RES, RES,
                              st, samples_per_step=1)
        assert int(st.spp) == 1

    def test_two_sided_toggle(self):
        """two_sided=False blacks out backfaces of opaque materials
        (SettingsWidget.cxx:328-334); True (default) shades them."""
        # single quad with +z normal; camera on the -z side sees its BACK
        scene = Scene()
        scene.clear_lights()
        scene.add_mesh("q", primitives.quad(2.0, 2.0),
                       material(kd=(0.8, 0.8, 0.8)))
        env = np.ones((8, 16, 3), np.float32)
        scene.set_envmap(env, intensity=1.0, background=False)
        cam = Camera.look_at(eye=(0, 0, -5), at=(0, 0, 0), up=(0, 1, 0),
                             fovy_deg=30.0)
        lit = _render(scene, cam, spp=16, ray_depth=2, two_sided=True)
        dark = _render(scene, cam, spp=16, ray_depth=2, two_sided=False)
        c = slice(RES // 2 - 3, RES // 2 + 3)
        assert lit[c, c].mean() > 0.1
        assert dark[c, c].mean() == 0.0

    def test_progressive_matches_batch(self, cornell_scene, cornell_camera):
        from cadrays_tpu.integrator.progressive import progressive_step

        data = cornell_scene.flatten(cornell_camera)
        params = RenderParams(ray_depth=3)
        st = None
        for _ in range(4):
            st = progressive_step(data, cornell_camera, params, RES, RES,
                                  st, samples_per_step=1)
        batch = np.asarray(render_image(data, cornell_camera, params,
                                        RES, RES, 4))
        np.testing.assert_allclose(np.asarray(st.image), batch, atol=1e-5)

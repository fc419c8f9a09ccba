"""Unit tests: vecmath, rng, fresnel, sampling, camera, tonemap, bsdf."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.core import rng, sampling as smp, vecmath as vm
from cadrays_tpu.core.bsdf import (
    eval_bsdf,
    material,
    normalize_energy,
    sample_bsdf,
)
from cadrays_tpu.core.camera import ORTHOGRAPHIC, Camera
from cadrays_tpu.core.fresnel import (
    FRESNEL_CONDUCTOR,
    FRESNEL_CONSTANT,
    FRESNEL_DIELECTRIC,
    FRESNEL_SCHLICK,
    dielectric_reflectance,
    eval_fresnel,
    fresnel,
)
from cadrays_tpu.core.tonemap import (
    TONE_FILMIC,
    ToneMapParams,
    apply_tonemap,
    linear_to_srgb,
    srgb_to_linear,
)


class TestVecmath:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0]])
        n = vm.normalize(v)
        np.testing.assert_allclose(vm.length(n), 1.0, atol=1e-6)

    def test_reflect(self):
        d = vm.normalize(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = vm.reflect(d, n)
        np.testing.assert_allclose(r, vm.normalize(jnp.array([1.0, 1.0, 0.0])),
                                   atol=1e-6)

    def test_refract_straight(self):
        d = jnp.array([0.0, 0.0, -1.0])
        n = jnp.array([0.0, 0.0, 1.0])
        r, tir = vm.refract(d, n, 1.0 / 1.5)
        assert not bool(tir)
        np.testing.assert_allclose(r, d, atol=1e-6)

    def test_refract_tir(self):
        # From dense to sparse at grazing angle -> TIR
        d = vm.normalize(jnp.array([0.9, 0.0, -0.1]))
        n = jnp.array([0.0, 0.0, 1.0])
        _, tir = vm.refract(d, n, 1.5)
        assert bool(tir)

    def test_onb_orthogonal(self):
        n = vm.normalize(jnp.array([[0.3, -0.5, 0.8], [0.0, 0.0, -1.0]]))
        t, b = vm.orthonormal_basis(n)
        for a, c in [(t, b), (t, n), (b, n)]:
            np.testing.assert_allclose(vm.dot(a, c), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)

    def test_to_world_roundtrip(self):
        n = vm.normalize(jnp.array([0.2, 0.7, 0.3]))
        local = vm.normalize(jnp.array([0.5, -0.1, 0.85]))
        w = vm.to_world(local, n)
        back = vm.to_local(w, n)
        np.testing.assert_allclose(back, local, atol=1e-5)


class TestRng:
    def test_range_and_determinism(self):
        pid = jnp.arange(1024)
        a1, b1, c1, d1 = rng.sample4(pid, 3, 7, 42)
        a2, _, _, _ = rng.sample4(pid, 3, 7, 42)
        np.testing.assert_array_equal(a1, a2)
        for x in (a1, b1, c1, d1):
            assert float(x.min()) >= 0.0 and float(x.max()) < 1.0

    def test_uniformity(self):
        pid = jnp.arange(1 << 16)
        a, _, _, _ = rng.sample4(pid, 0, 0, 1)
        hist, _ = np.histogram(np.asarray(a), bins=16, range=(0, 1))
        assert hist.min() > (1 << 16) / 16 * 0.9

    def test_decorrelated_dims(self):
        pid = jnp.arange(1 << 14)
        a, _, _, _ = rng.sample4(pid, 0, 0, 1)
        b, _, _, _ = rng.sample4(pid, 0, 1, 1)
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.03


class TestFresnel:
    def test_schlick_limits(self):
        t, p = fresnel(FRESNEL_SCHLICK, (0.04, 0.04, 0.04))
        f_normal = eval_fresnel(jnp.int32(t), jnp.asarray(p), jnp.float32(1.0))
        np.testing.assert_allclose(f_normal, 0.04, atol=1e-6)
        f_grazing = eval_fresnel(jnp.int32(t), jnp.asarray(p), jnp.float32(0.0))
        np.testing.assert_allclose(f_grazing, 1.0, atol=1e-6)

    def test_dielectric_normal_incidence(self):
        # R0 = ((n-1)/(n+1))^2 = 0.04 for n=1.5
        f = dielectric_reflectance(jnp.float32(1.5), jnp.float32(1.0))
        np.testing.assert_allclose(f, 0.04, atol=1e-3)

    def test_constant(self):
        t, p = fresnel(FRESNEL_CONSTANT, 0.7)
        f = eval_fresnel(jnp.int32(t), jnp.asarray(p), jnp.float32(0.3))
        np.testing.assert_allclose(f, 0.7, atol=1e-6)

    def test_conductor_high_reflectance(self):
        # gold-ish n=0.2, k=3: very reflective at normal incidence
        t, p = fresnel(FRESNEL_CONDUCTOR, 0.2, 3.0)
        f = eval_fresnel(jnp.int32(t), jnp.asarray(p), jnp.float32(1.0))
        assert float(f[0]) > 0.9


class TestSampling:
    def test_cosine_hemisphere_mean(self):
        u = np.random.RandomState(0).rand(2, 20000)
        d = smp.cosine_hemisphere(jnp.asarray(u[0]), jnp.asarray(u[1]))
        # E[cos] under pdf cos/pi is 2/3
        assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01
        np.testing.assert_allclose(vm.length(d), 1.0, atol=1e-5)

    def test_ggx_d_normalization(self):
        # integral over hemisphere of D(h) cos(h) == 1
        n = 256
        theta = (np.arange(n) + 0.5) / n * np.pi / 2
        for alpha in (0.1, 0.3, 0.8):
            d = np.asarray(smp.ggx_d(jnp.cos(jnp.asarray(theta)), alpha))
            integral = np.sum(
                d * np.cos(theta) * np.sin(theta)) * (np.pi / 2 / n) * 2 * np.pi
            assert abs(integral - 1.0) < 0.01, alpha

    def test_uniform_cone(self):
        u = np.random.RandomState(1).rand(2, 10000)
        cos_max = 0.9
        d = smp.uniform_cone(jnp.asarray(u[0]), jnp.asarray(u[1]), cos_max)
        assert float(jnp.min(d[..., 2])) >= cos_max - 1e-5


class TestCamera:
    def test_center_ray_hits_at(self):
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), fovy_deg=60.0)
        o, d = cam.generate_rays(
            jnp.float32(32.0), jnp.float32(32.0), jnp.float32(0.0),
            jnp.float32(0.0), 64, 64)
        np.testing.assert_allclose(d, jnp.array([0.0, 0.0, -1.0]), atol=1e-5)

    def test_ortho_parallel(self):
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0),
                             projection=ORTHOGRAPHIC, ortho_scale=2.0)
        px = jnp.array([0.0, 10.0, 63.0])
        py = jnp.array([0.0, 40.0, 63.0])
        z = jnp.zeros(3)
        o, d = cam.generate_rays(px, py, z, z, 64, 64)
        np.testing.assert_allclose(d, jnp.tile(jnp.array([0.0, 0.0, -1.0]),
                                               (3, 1)), atol=1e-5)
        assert float(jnp.std(o[:, 0])) > 0.1  # origins spread on the film

    def test_dof_converges_at_focal_plane(self):
        cam = Camera.look_at(eye=(0, 0, 5), at=(0, 0, 0), aperture=0.2,
                             focal_dist=5.0)
        px = jnp.full(8, 32.0)
        py = jnp.full(8, 32.0)
        u = jnp.linspace(0.1, 0.9, 8)
        o, d = cam.generate_rays(px, py, u, u[::-1], 64, 64)
        # all rays pass through the focal point (0,0,0)
        t = -o[:, 2] / d[:, 2]
        p = o + d * t[:, None]
        np.testing.assert_allclose(p, 0.0, atol=1e-4)


class TestToneMap:
    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x,
                                   atol=1e-5)

    def test_filmic_white_point(self):
        tm = ToneMapParams(method=TONE_FILMIC, exposure=jnp.float32(0.0),
                           white_point=jnp.float32(4.0))
        out = apply_tonemap(jnp.float32(4.0), tm)
        np.testing.assert_allclose(out, 1.0, atol=1e-5)

    def test_exposure_doubles(self):
        tm = ToneMapParams(exposure=jnp.float32(1.0))
        np.testing.assert_allclose(apply_tonemap(jnp.float32(0.25), tm), 0.5,
                                   atol=1e-6)


class TestBSDF:
    def test_energy_normalization(self):
        m = material(kd=(0.9, 0.9, 0.9), ks=(0.5, 0.5, 0.5))
        mn = normalize_energy(m)
        total = np.asarray(mn.kd + mn.ks + mn.kt)
        assert total.max() <= 1.0 + 1e-6

    def test_diffuse_eval_matches_lambert(self):
        m = material(kd=(0.6, 0.5, 0.4))
        import jax

        mg = jax.tree.map(lambda x: jnp.asarray(x)[0], m)
        n = jnp.array([0.0, 0.0, 1.0])
        wo = vm.normalize(jnp.array([0.3, 0.1, 0.9]))
        wi = vm.normalize(jnp.array([-0.2, 0.4, 0.7]))
        f, pdf = eval_bsdf(mg, wo, wi, n)
        np.testing.assert_allclose(f, np.array([0.6, 0.5, 0.4]) / np.pi,
                                   rtol=1e-5)
        np.testing.assert_allclose(pdf, float(wi[2]) / np.pi, rtol=1e-4)

    def test_white_furnace_diffuse(self):
        """Integral of weight over many samples ~= albedo (energy cons.)."""
        import jax

        m = material(kd=(0.7, 0.7, 0.7))
        N = 4096
        mg = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x)[0],
                                                     (N,) + x.shape[1:]), m)
        n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
        wo = jnp.tile(vm.normalize(jnp.array([0.0, 0.3, 0.95])), (N, 1))
        u = jnp.asarray(np.random.RandomState(0).rand(N, 4), jnp.float32)
        s = sample_bsdf(mg, wo, n, u)
        mean_w = float(jnp.mean(jnp.where(s["valid"][:, None],
                                          s["weight"][:, 0:1], 0.0)))
        assert abs(mean_w - 0.7) < 0.02

    def test_glass_split_energy(self):
        import jax

        from cadrays_tpu.core.fresnel import FRESNEL_DIELECTRIC, fresnel

        m = material(kd=(0, 0, 0), kt=(1, 1, 1),
                     base_fresnel=fresnel(FRESNEL_DIELECTRIC, 1.5))
        N = 4096
        mg = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x)[0],
                                                     (N,) + x.shape[1:]), m)
        n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
        wo = jnp.tile(vm.normalize(jnp.array([0.0, 0.0, 1.0])), (N, 1))
        u = jnp.asarray(np.random.RandomState(1).rand(N, 4), jnp.float32)
        s = sample_bsdf(mg, wo, n, u)
        assert bool(jnp.all(s["is_delta"]))
        # ~4% of samples reflect at normal incidence, rest refract straight
        frac_trans = float(jnp.mean(s["transmitted"]))
        assert 0.9 < frac_trans < 0.99
        mean_w = float(jnp.mean(s["weight"][:, 0]))
        assert abs(mean_w - 1.0) < 0.05  # lossless interface

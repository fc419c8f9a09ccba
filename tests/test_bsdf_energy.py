"""BSDF sampling-vs-quadrature consistency (the estimator correctness
contract behind every render).

The one-sample-MIS construction in sample_bsdf is unbiased iff the pdf
eval_bsdf reports for a smooth direction equals the true marginal density
of sample_bsdf's procedure: sum over smooth lobes of p_lobe * pdf_lobe
with p_lobe normalized over ALL lobes (delta ones included). These tests
pin that down by comparing the Monte-Carlo directional albedo
E[weight] against direct hemispherical quadrature of eval_bsdf plus the
analytic delta-lobe contributions — the round-1 bug (delta coat weight
dropped from the eval denominator) fails the coated cases by >10%.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.core.bsdf import (
    eval_bsdf,
    material,
    sample_bsdf,
)
from cadrays_tpu.core.fresnel import FRESNEL_CONSTANT, fresnel


def _mc_albedo(m, cos_o, n_samples=200_000, seed=0):
    """Monte-Carlo directional albedo: mean one-sample weight."""
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n_samples, 4))
    n = jnp.tile(jnp.float32([0.0, 0.0, 1.0]), (n_samples, 1))
    s = math.sqrt(max(1.0 - cos_o * cos_o, 0.0))
    wo = jnp.tile(jnp.float32([s, 0.0, cos_o]), (n_samples, 1))
    mm = jax.tree.map(lambda x: jnp.repeat(jnp.asarray(x), n_samples, 0), m)
    out = sample_bsdf(mm, wo, n, u)
    w = jnp.where(out["valid"][:, None], out["weight"], 0.0)
    return np.asarray(w.mean(axis=0))


def _quad_albedo_smooth(m, cos_o, n_theta=256, n_phi=256):
    """Quadrature of the smooth part: int eval(wo, wi) cos_i dwi."""
    th = (np.arange(n_theta) + 0.5) / n_theta * (0.5 * np.pi)
    ph = (np.arange(n_phi) + 0.5) / n_phi * (2.0 * np.pi)
    T, P = np.meshgrid(th, ph, indexing="ij")
    wi = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                   np.cos(T)], axis=-1).reshape(-1, 3).astype(np.float32)
    R = wi.shape[0]
    s = math.sqrt(max(1.0 - cos_o * cos_o, 0.0))
    wo = jnp.tile(jnp.float32([s, 0.0, cos_o]), (R, 1))
    n = jnp.tile(jnp.float32([0.0, 0.0, 1.0]), (R, 1))
    mm = jax.tree.map(lambda x: jnp.repeat(jnp.asarray(x), R, 0), m)
    f, _ = eval_bsdf(mm, wo, jnp.asarray(wi), n)
    cos_i = wi[:, 2]
    sin_t = np.sin(T).reshape(-1)
    dw = (0.5 * np.pi / n_theta) * (2.0 * np.pi / n_phi)
    integrand = np.asarray(f) * (cos_i * sin_t * dw)[:, None]
    return integrand.sum(axis=0)


class TestSamplingConsistency:
    def test_diffuse_albedo(self):
        m = material(kd=(0.6, 0.3, 0.1))
        mc = _mc_albedo(m, 0.8)
        np.testing.assert_allclose(mc, [0.6, 0.3, 0.1], atol=0.01)

    def test_delta_coat_over_diffuse(self):
        """Ruby/jade-style preset: delta coat (coat_rough=0) over a
        diffuse base. MC albedo must equal quadrature(smooth diffuse)
        + analytic delta coat term Kc*Fc(cos_o)."""
        cos_o = 0.7
        fc = 0.3
        m = material(kd=(0.5, 0.2, 0.1), kc=(0.9, 0.9, 0.9),
                     coat_rough=0.0,
                     coat_fresnel=fresnel(FRESNEL_CONSTANT, fc))
        mc = _mc_albedo(m, cos_o)
        quad = _quad_albedo_smooth(m, cos_o)
        delta = 0.9 * fc  # Kc * Fc, per channel
        np.testing.assert_allclose(mc, quad + delta, atol=0.015)

    def test_delta_coat_over_glossy(self):
        cos_o = 0.6
        fc = 0.25
        m = material(kd=(0.1, 0.1, 0.1), ks=(0.4, 0.4, 0.4),
                     base_rough=0.3, kc=(0.8, 0.8, 0.8), coat_rough=0.0,
                     coat_fresnel=fresnel(FRESNEL_CONSTANT, fc))
        mc = _mc_albedo(m, cos_o, n_samples=400_000)
        quad = _quad_albedo_smooth(m, cos_o)
        delta = 0.8 * fc
        np.testing.assert_allclose(mc, quad + delta, atol=0.02)

    def test_smooth_coat_over_diffuse(self):
        """Rough coat: everything is smooth, MC must match quadrature."""
        cos_o = 0.75
        m = material(kd=(0.4, 0.4, 0.4), kc=(0.6, 0.6, 0.6),
                     coat_rough=0.4,
                     coat_fresnel=fresnel(FRESNEL_CONSTANT, 0.3))
        mc = _mc_albedo(m, cos_o, n_samples=400_000)
        quad = _quad_albedo_smooth(m, cos_o)
        np.testing.assert_allclose(mc, quad, atol=0.02)

    def test_delta_glossy_under_smooth_coat(self):
        """Mirror base (base_rough=0) under a rough coat."""
        cos_o = 0.8
        m = material(kd=(0.2, 0.2, 0.2), ks=(0.5, 0.5, 0.5),
                     base_rough=0.0, kc=(0.5, 0.5, 0.5), coat_rough=0.35,
                     coat_fresnel=fresnel(FRESNEL_CONSTANT, 0.2),
                     base_fresnel=fresnel(FRESNEL_CONSTANT, 1.0))
        mc = _mc_albedo(m, cos_o, n_samples=400_000)
        quad = _quad_albedo_smooth(m, cos_o)
        # analytic delta glossy: through(cos_o) * Ks * Fb / 1
        through = 1.0 - 0.5 * 0.2
        delta = through * 0.5 * 1.0
        np.testing.assert_allclose(mc, quad + delta, atol=0.02)

"""Sampling warps and pdfs (local frame, z = normal).

All warps are pure functions of uniforms -> vectorized over the wavefront.
"""
from __future__ import annotations

import jax.numpy as jnp

from cadrays_tpu.core import vecmath as vm

INV_PI = 1.0 / jnp.pi


def cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere sample (local frame). pdf = cos/pi."""
    r = jnp.sqrt(jnp.maximum(u1, 1e-12))
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 1e-12))
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdf(cos_t):
    return jnp.maximum(cos_t, 0.0) * INV_PI


def uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_cone(u1, u2, cos_max):
    """Uniform direction in a cone around +z. pdf = 1/(2pi(1-cos_max))."""
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def uniform_cone_pdf(cos_max):
    return 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-8)


def uniform_disk(u1, u2):
    r = jnp.sqrt(jnp.maximum(u1, 1e-12))
    phi = 2.0 * jnp.pi * u2
    return r * jnp.cos(phi), r * jnp.sin(phi)


# ---------------------------------------------------------------------------
# GGX (Trowbridge-Reitz) microfacet distribution, isotropic
# ---------------------------------------------------------------------------

def ggx_d(cos_h, alpha):
    """GGX normal distribution function D(h)."""
    a2 = alpha * alpha
    c2 = cos_h * cos_h
    denom = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def ggx_lambda(cos_t, alpha):
    c2 = jnp.clip(cos_t * cos_t, 1e-8, 1.0)
    tan2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)


def ggx_g1(cos_t, alpha):
    return 1.0 / (1.0 + ggx_lambda(cos_t, alpha))


def ggx_g2(cos_o, cos_i, alpha):
    """Height-correlated Smith masking-shadowing."""
    return 1.0 / (1.0 + ggx_lambda(cos_o, alpha) + ggx_lambda(cos_i, alpha))


def ggx_sample_h(u1, u2, alpha):
    """Sample the GGX NDF half-vector (local frame, z up)."""
    a2 = alpha * alpha
    cos2 = (1.0 - u1) / jnp.maximum(1.0 + (a2 - 1.0) * u1, 1e-12)
    cos_h = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos2, 1e-12))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h], axis=-1)


def ggx_reflect_pdf(wo, wi, n, alpha):
    """pdf (solid angle, wrt wi) of sampling the NDF then reflecting wo."""
    h = vm.normalize(wo + wi)
    cos_h = jnp.clip(vm.dot(h, n), 0.0, 1.0)
    d = ggx_d(cos_h, alpha)
    wo_dot_h = jnp.clip(vm.dot(wo, h), 1e-6, 1.0)
    return d * cos_h / (4.0 * wo_dot_h)


# ---------------------------------------------------------------------------
# MIS
# ---------------------------------------------------------------------------

def power_heuristic(pdf_a, pdf_b):
    """Power heuristic (beta=2) weight for strategy a."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)

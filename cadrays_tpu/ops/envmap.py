"""Environment map: lat-long lookup, importance sampling, pdf.

Contract: the engine lights scenes with a lat-long environment texture
(`vtextureenv on <img>`, AppGui.cxx:963) optionally shown as background
(LightSourcesEditor.cxx:339-352). Importance sampling uses the standard
luminance*sin(theta) marginal/conditional CDFs built at flatten time.
Mapping: direction d -> (phi = atan2(d.y, d.x), theta = acos(d.z befitting
z-up)) with u = phi/2pi, v = theta/pi.
"""
from __future__ import annotations

import jax.numpy as jnp

from cadrays_tpu.core import vecmath as vm
from cadrays_tpu.scene.flatten import EnvMapData

TWO_PI = 2.0 * jnp.pi


def dir_to_uv(d):
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    u = (phi / TWO_PI) % 1.0
    v = theta / jnp.pi
    return u, v


def uv_to_dir(u, v):
    phi = u * TWO_PI
    theta = v * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)],
                     axis=-1)


def _bilinear(img, u, v):
    H, W = img.shape[0], img.shape[1]
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def eval_env(env: EnvMapData, d):
    """Radiance arriving from direction d (unit). Zero if disabled."""
    if not env.enabled:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    u, v = dir_to_uv(d)
    return _bilinear(env.image, u, v) * env.intensity


def pdf_env(env: EnvMapData, d):
    """Solid-angle pdf of sampling direction d via sample_env."""
    if not env.enabled:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    H, W = env.image.shape[0], env.image.shape[1]
    u, v = dir_to_uv(d)
    c = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    r = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return env.pdf_map[r, c]


def sample_env(env: EnvMapData, u1, u2):
    """Importance-sample a direction. Returns (dir, radiance, pdf)."""
    if not env.enabled:
        z = jnp.zeros(jnp.shape(u1) + (3,), jnp.float32)
        return z, z, jnp.zeros(jnp.shape(u1), jnp.float32)
    H, W = env.image.shape[0], env.image.shape[1]
    row = jnp.searchsorted(env.marginal_cdf, u1, side="left")
    row = jnp.clip(row, 0, H - 1)
    cond = env.conditional_cdf[row]
    col = jax_searchsorted_rows(cond, u2)
    col = jnp.clip(col, 0, W - 1)
    # jitter inside the texel for a continuous estimator
    u = (col.astype(jnp.float32) + 0.5) / W
    v = (row.astype(jnp.float32) + 0.5) / H
    d = uv_to_dir(u, v)
    rad = env.image[row, col] * env.intensity
    pdf = env.pdf_map[row, col]
    return d, rad, pdf


def jax_searchsorted_rows(cdf_rows, u):
    """Per-row searchsorted: cdf_rows (..., W) monotone, u (...)."""
    return jnp.sum((cdf_rows < u[..., None]).astype(jnp.int32), axis=-1)

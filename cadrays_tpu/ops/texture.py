"""Texture atlas sampling (bilinear, wrap).

Contract: per-material diffuse texture with per-shape UV scale
(MaterialEditor.cxx:1128-1299, rttexture ImportExportPlugin.cxx:608-752).
Textures live in one packed atlas (scene/flatten.py) so a whole wavefront
samples with a single gather pattern regardless of which texture each ray
touches.
"""
from __future__ import annotations

import jax.numpy as jnp

from cadrays_tpu.scene.flatten import TextureAtlas


def sample_texture(atlas: TextureAtlas, tex_id, uv, uv_scale):
    """Sample per-ray textures; tex_id < 0 lanes return white.

    tex_id: (R,) int32; uv: (R, 2); uv_scale: (R,).
    """
    if not atlas.enabled:
        return jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
    tid = jnp.maximum(tex_id, 0)
    rect = atlas.rect[tid]  # (R, 4)
    u = (uv[..., 0] * uv_scale) % 1.0
    v = (uv[..., 1] * uv_scale) % 1.0
    au = rect[..., 0] + u * rect[..., 2]
    av = rect[..., 1] + v * rect[..., 3]

    img = atlas.image
    H, W = img.shape[0], img.shape[1]
    x = au * W - 0.5
    y = av * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    c = (
        img[y0i, x0i] * (1 - fx) * (1 - fy)
        + img[y0i, x1i] * fx * (1 - fy)
        + img[y1i, x0i] * (1 - fx) * fy
        + img[y1i, x1i] * fx * fy
    )
    return jnp.where((tex_id >= 0)[..., None], c, 1.0)

"""Renderer facade: jit-compiled multi-spp rendering + mode dispatch.

Batch semantics mirror the reference's `CADRays.exe <script> <N frames>`
loop (main.cxx:164-229, AppViewer.cxx:1063-1069): N progressive passes
accumulated into one image. Here a "frame" is one sample-per-pixel pass of
the wavefront integrator; `render(spp=N)` folds N passes inside a single
jitted `lax.scan` (on-device accumulation, no host round-trips).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cadrays_tpu.core.camera import Camera
from cadrays_tpu.core.tonemap import apply_tonemap, linear_to_srgb
from cadrays_tpu.integrator.params import RenderMode, RenderParams
from cadrays_tpu.integrator.wavefront import render_sample
from cadrays_tpu.integrator.whitted import render_raster, render_whitted
from cadrays_tpu.scene.flatten import SceneData


@partial(jax.jit, static_argnames=("width", "height", "spp"))
def render_image(scene: SceneData, camera: Camera, params: RenderParams,
                 width: int, height: int, spp: int = 1,
                 sample_offset: jnp.ndarray = 0):
    """Render an (H, W, 3) HDR image with `spp` accumulated samples."""
    if params.mode == RenderMode.RT:
        img = render_whitted(scene, camera, params, width, height)
        return img.reshape(height, width, 3)
    if params.mode == RenderMode.RASTER:
        img = render_raster(scene, camera, params, width, height)
        return img.reshape(height, width, 3)

    sample_offset = jnp.asarray(sample_offset, jnp.uint32)

    def body(acc, i):
        s = render_sample(scene, camera, params, width, height,
                          sample_offset + i)
        return acc + s, None

    acc0 = jnp.zeros((width * height, 3), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(spp, dtype=jnp.uint32),
                          length=spp)
    return (acc / spp).reshape(height, width, 3)


@partial(jax.jit, static_argnames=("width", "height", "spp", "n_steps"))
def _persistent_pass(scene, camera, params, width, height, spp, n_steps,
                     sample_offset, sid0=None, done0=None):
    from cadrays_tpu.integrator.persistent import render_persistent

    return render_persistent(scene, camera, params, width, height, spp,
                             n_steps, sid_base=sample_offset,
                             sid0=sid0, done0=done0)


def render_persistent_image(scene: SceneData, camera: Camera,
                            params: RenderParams, width: int, height: int,
                            spp: int = 1, sample_offset: jnp.ndarray = 0):
    """(H, W, 3) HDR image via the persistent wavefront — the default GI
    path. Runs one regenerating scan sized for the measured ~2.7-bounce
    average path length, then tops up any under-completed pixel quota
    (restarting dropped in-flight samples) until cnt == spp, so the
    result is the exact spp-sample estimator (no truncation bias)."""
    sample_offset = jnp.asarray(sample_offset, jnp.uint32)
    n_steps = spp * 4 + params.ray_depth
    sum_img, cnt = _persistent_pass(scene, camera, params, width, height,
                                    spp, n_steps, sample_offset)
    missing = int(spp - jnp.min(cnt))
    while missing > 0:
        # next power of two: n_steps is jit-static, so raw shortfall
        # counts would compile a fresh scan per distinct value
        m = 1 << (missing - 1).bit_length()
        top_img, top_cnt = _persistent_pass(
            scene, camera, params, width, height, spp,
            m * params.ray_depth, sample_offset,
            sid0=sample_offset + cnt.astype(jnp.uint32), done0=cnt)
        sum_img = sum_img + top_img
        cnt = cnt + top_cnt
        missing = int(spp - jnp.min(cnt))
    return (sum_img / jnp.maximum(cnt[:, None], 1)).reshape(
        height, width, 3)


class Renderer:
    """Stateful convenience wrapper around the functional core."""

    def __init__(self, params: Optional[RenderParams] = None):
        self.params = params or RenderParams()

    def render(self, scene, camera: Camera, width: int, height: int,
               spp: int = 16, sample_offset: int = 0) -> jnp.ndarray:
        """HDR render. `scene` is a SceneData or anything with .flatten()."""
        data = scene if isinstance(scene, SceneData) else scene.flatten()
        if self.params.persistent and self.params.mode == RenderMode.GI:
            return render_persistent_image(
                data, camera, self.params, width, height, spp,
                jnp.uint32(sample_offset))
        return render_image(data, camera, self.params, width, height, spp,
                            jnp.uint32(sample_offset))

    def render_ldr(self, scene, camera: Camera, width: int, height: int,
                   spp: int = 16) -> np.ndarray:
        """Tone-mapped sRGB uint8 image (the reference's LDR dump path,
        AppGui.cxx:424-433)."""
        hdr = self.render(scene, camera, width, height, spp)
        ldr = linear_to_srgb(apply_tonemap(hdr, self.params.tonemap))
        return np.asarray(jnp.round(ldr * 255.0).astype(jnp.uint8))

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


class Renderer:
    """Stateful convenience wrapper around the functional core."""

    def __init__(self, params: Optional[RenderParams] = None):
        self.params = params or RenderParams()

    def render(self, scene, camera: Camera, width: int, height: int,
               spp: int = 16, sample_offset: int = 0) -> jnp.ndarray:
        """HDR render. `scene` is a SceneData or anything with .flatten()."""
        data = scene if isinstance(scene, SceneData) else scene.flatten()
        return render_image(data, camera, self.params, width, height, spp,
                            jnp.uint32(sample_offset))

    def render_ldr(self, scene, camera: Camera, width: int, height: int,
                   spp: int = 16) -> np.ndarray:
        """Tone-mapped sRGB uint8 image (the reference's LDR dump path,
        AppGui.cxx:424-433)."""
        hdr = self.render(scene, camera, width, height, spp)
        ldr = linear_to_srgb(apply_tonemap(hdr, self.params.tonemap))
        return np.asarray(jnp.round(ldr * 255.0).astype(jnp.uint8))

"""Picking: pixel -> scene intersection (selection + autofocus).

Capability contract: the reference maps clicks to AIS selection via the
triangulation (AisMesh.cxx:158-173 Select3D sensitive primitives;
AppViewer.cxx:283-460 selection flow) and sets the camera focal distance
from the pick depth for autofocus (AppGui.cxx:78-94). Here a pick is just
a one-ray trace — the same traversal stack as rendering, so picking is
exact against what is drawn.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cadrays_tpu.core.camera import Camera
from cadrays_tpu.ops.hit import hit_attributes
from cadrays_tpu.ops.intersect import INF
from cadrays_tpu.ops.traverse import trace
from cadrays_tpu.scene.flatten import SceneData


def pick(scene: SceneData, camera: Camera, px: float, py: float,
         width: int, height: int) -> dict:
    """Trace the camera ray through pixel (px, py); returns hit info:
    {hit, t, position, mat_id, tri} (host scalars/np arrays)."""
    import numpy as np

    z = jnp.zeros((1,), jnp.float32)
    o, d = camera.generate_rays(
        jnp.full((1,), float(px), jnp.float32),
        jnp.full((1,), float(py), jnp.float32), z, z, width, height)
    res = trace(scene.geometry, o, d, jnp.full((1,), INF))
    h = hit_attributes(scene.geometry, o, d, res["tri"])
    return {
        "hit": bool(h["hit"][0]),
        "t": float(h["t"][0]),
        "position": np.asarray(h["position"][0]),
        "normal": np.asarray(h["n_shade"][0]),
        "mat_id": int(h["mat_id"][0]),
        "tri": int(res["tri"][0]),
    }


def autofocus(scene: SceneData, camera: Camera, width: int, height: int,
              px: Optional[float] = None,
              py: Optional[float] = None) -> Camera:
    """Set the focal plane from the pick depth (defaults to the image
    center) — AppGui.cxx:78-94 autofocus-on-selection semantics."""
    px = width * 0.5 if px is None else px
    py = height * 0.5 if py is None else py
    info = pick(scene, camera, px, py, width, height)
    if not info["hit"]:
        return camera
    return camera.replace(focal_dist=jnp.float32(info["t"]))


def material_of_pick(scene: SceneData, info: dict):
    """Convenience: gather the picked material row (selection -> material
    editor flow)."""
    import jax

    return jax.tree.map(lambda x: x[info["mat_id"]], scene.materials)

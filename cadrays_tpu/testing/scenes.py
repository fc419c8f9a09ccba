"""Canonical test/bench scenes.

`cornell_box` reconstructs the reference's CornellBox fixture
(data/scripts/CornellBox.tcl): unit open box (interior [0,1]^3, +Y side
open toward the camera, z up), colored side walls, positional sphere
light at (0.5, 0.5, 0.85) with smooth radius 0.06 and intensity 25,
plus — in the full variant — the glass sphere/boxes/plastic sphere of the
original script. The diffuse-only variant is the minimum end-to-end slice
(SURVEY.md §7.2, BASELINE.json config #1).
"""
from __future__ import annotations

import numpy as np

from cadrays_tpu.core.bsdf import material
from cadrays_tpu.core.camera import Camera
from cadrays_tpu.core.fresnel import (
    FRESNEL_CONSTANT,
    FRESNEL_DIELECTRIC,
    fresnel,
)
from cadrays_tpu.core.lights import positional_light
from cadrays_tpu.geometry import primitives
from cadrays_tpu.scene.scene import Scene


def _translate(v):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = v
    return m


def _rot_z(deg):
    a = np.deg2rad(deg)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = np.cos(a)
    m[0, 1] = -np.sin(a)
    m[1, 0] = np.sin(a)
    m[1, 1] = np.cos(a)
    return m


def cornell_box(full: bool = False, sphere_res: int = 24) -> Scene:
    scene = Scene()
    scene.clear_lights()
    scene.add_light(positional_light(position=(0.5, 0.5, 0.85),
                                     intensity=25.0, smooth_radius=0.06))

    white = material(kd=(1.0, 1.0, 1.0))
    red = material(kd=(1.0, 0.3, 0.3))
    blue = material(kd=(0.3, 0.5, 1.0))

    # CornellBox.tcl:20-31 — exploded box faces re-positioned into an open
    # box: interior [0,1]^3, +Y face missing (camera side).
    walls = [
        ("b_1", 1, _translate((1, 0, 0)), red),  # right wall at x=1
        ("b_2", 2, _translate((-1, 0, 0)), blue),  # left wall at x=0
        ("b_3", 3, _translate((0, 1, 0)), white),  # back wall at y=1
        ("b_5", 5, _translate((0, 0, 1)), white),  # ceiling at z=1
        ("b_6", 6, _translate((0, 0, -1)), white),  # floor at z=0
    ]
    for name, face, tf, mat in walls:
        mesh = primitives.box_face(1.0, 1.0, 1.0, face)
        scene.add_shape(name, mesh, mat, tf)

    if not full:
        # Diffuse-only contents: one box (the script's 'c', sans gloss).
        scene.add_shape(
            "c", primitives.box(0.3, 0.3, 0.2),
            material(kd=(1.0, 0.8, 0.2)),
            _translate((0.55, 0.3, 0.0)) @ _rot_z(-30),
        )
        return scene

    # CornellBox.tcl:43-72 — full contents.
    glass_blue = material(
        kd=(0, 0, 0), kt=(1.0, 1.0, 1.0),
        absorp_color=(0.8, 0.8, 1.0), absorp_coeff=6.0,
        base_fresnel=fresnel(FRESNEL_DIELECTRIC, 1.5),
    )
    glass_green = material(
        kd=(0, 0, 0), kt=(1.0, 1.0, 1.0),
        absorp_color=(0.8, 1.0, 0.8), absorp_coeff=6.0,
        base_fresnel=fresnel(FRESNEL_DIELECTRIC, 1.5),
    )
    glossy = material(kd=(1.0, 0.8, 0.2), ks=(0.3, 0.3, 0.3),
                      base_rough=0.2)
    mirror_ball = material(kd=(0.5, 0.9, 0.3), ks=(0.3, 0.3, 0.3),
                           base_rough=0.0,
                           base_fresnel=fresnel(FRESNEL_CONSTANT, 1.0))

    scene.add_shape("s", primitives.sphere(0.2, sphere_res * 2, sphere_res),
                    glass_blue, _translate((0.21, 0.3, 0.2)))
    scene.add_shape("c", primitives.box(0.3, 0.3, 0.2), glossy,
                    _translate((0.55, 0.3, 0.0)) @ _rot_z(-30))
    scene.add_shape("g", primitives.box(0.15, 0.15, 0.3), glass_green,
                    _translate((0.7, 0.25, 0.2)) @ _rot_z(10))
    scene.add_shape("r", primitives.sphere(0.1, sphere_res * 2, sphere_res),
                    mirror_ball, _translate((0.5, 0.65, 0.1)))
    return scene


def cornell_camera(aperture: float = 0.0) -> Camera:
    """Front view of the open box (vfront; vfit analogue)."""
    return Camera.look_at(
        eye=(0.5, -1.6, 0.5),
        at=(0.5, 0.5, 0.5),
        up=(0.0, 0.0, 1.0),
        fovy_deg=40.0,
        aperture=aperture,
        focal_dist=2.1,
    )


def emissive_quad_scene(le=(8.0, 8.0, 8.0)) -> Scene:
    """Floor + emissive ceiling quad — exercises area-light NEE + MIS."""
    scene = Scene()
    scene.clear_lights()
    floor = primitives.quad(4.0, 4.0)
    scene.add_mesh("floor", floor, material(kd=(0.7, 0.7, 0.7)))
    panel = primitives.quad(1.0, 1.0)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)  # face down
    tf[:3, 3] = (0.0, 0.0, 2.0)
    scene.add_mesh("panel", panel, material(kd=(0, 0, 0), le=le), tf)
    return scene

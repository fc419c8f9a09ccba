"""Interactive camera controllers: Orbit and Flight.

Capability contract (reference src/Launcher/OrbitControls.cxx,
FlightControls.cxx, ViewControls.h): two strategies over the camera —
* Orbit: rotate about a fixed target (RMB-drag semantics,
  OrbitControls.cxx:213-298), pan in the view plane (MMB), dolly zoom
  toward the target (wheel / LMB-vertical, :70-158);
* Flight: WASD-style velocity movement + mouse-look about the eye,
  forces perspective (FlightControls.cxx:223-263, 362-414).

Pure host-side math producing new `Camera` pytrees — shared by the REPL
(`vrotate`-style commands could drive it) and any embedded viewer. Every
mutation is a *new* camera, which is exactly what triggers the
progressive accumulator restart (AppViewer.cxx:979-984 semantics).
"""
from __future__ import annotations

import numpy as np

from cadrays_tpu.core.camera import PERSPECTIVE, Camera


def _np(v):
    return np.asarray(v, np.float64)


def _cam_basis(cam: Camera):
    eye = _np(cam.eye)
    at = _np(cam.at)
    up = _np(cam.up)
    fwd = at - eye
    fwd /= max(np.linalg.norm(fwd), 1e-12)
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-12)
    true_up = np.cross(right, fwd)
    return eye, at, up, fwd, right, true_up


def _replace(cam: Camera, eye=None, at=None, up=None) -> Camera:
    # host numpy: interactive controls must never touch the device
    out = cam
    if eye is not None:
        out = out.replace(eye=np.asarray(eye, np.float32))
    if at is not None:
        out = out.replace(at=np.asarray(at, np.float32))
    if up is not None:
        out = out.replace(up=np.asarray(up, np.float32))
    return out


class OrbitControls:
    """Rotate/pan/zoom about a target point."""

    def __init__(self, rotate_speed: float = 0.005,
                 pan_speed: float = 1.0, zoom_speed: float = 0.1):
        self.rotate_speed = rotate_speed
        self.pan_speed = pan_speed
        self.zoom_speed = zoom_speed

    def rotate(self, cam: Camera, dx_px: float, dy_px: float) -> Camera:
        """Drag rotation: yaw about world-up through the target, pitch
        about the view right axis (OrbitControls.cxx:213-298)."""
        eye, at, up, fwd, right, _ = _cam_basis(cam)
        offset = eye - at
        yaw = -dx_px * self.rotate_speed
        pitch = -dy_px * self.rotate_speed
        # yaw about the up axis
        offset = _rotate_about(offset, up / np.linalg.norm(up), yaw)
        # pitch about right, clamped so we never flip over the pole
        new_off = _rotate_about(offset, right, pitch)
        cosang = np.dot(new_off / np.linalg.norm(new_off),
                        up / np.linalg.norm(up))
        if abs(cosang) < 0.995:
            offset = new_off
        return _replace(cam, eye=at + offset)

    def pan(self, cam: Camera, dx_px: float, dy_px: float,
            viewport_height: int = 512) -> Camera:
        """Screen-space pan: move eye and target together."""
        eye, at, _, _, right, true_up = _cam_basis(cam)
        dist = np.linalg.norm(at - eye)
        fov = np.deg2rad(float(cam.fovy_deg))
        world_per_px = 2.0 * dist * np.tan(fov / 2) / viewport_height
        delta = (-dx_px * right + dy_px * true_up) * world_per_px \
            * self.pan_speed
        return _replace(cam, eye=eye + delta, at=at + delta)

    def zoom(self, cam: Camera, steps: float) -> Camera:
        """Dolly toward/away from the target (exponential)."""
        eye, at, *_ = _cam_basis(cam)
        offset = eye - at
        scale = float(np.exp(-steps * self.zoom_speed))
        offset = offset * scale
        if np.linalg.norm(offset) < 1e-4:
            offset = offset / max(np.linalg.norm(offset), 1e-12) * 1e-4
        out = _replace(cam, eye=at + offset)
        if cam.projection != PERSPECTIVE:
            out = out.replace(ortho_scale=np.float32(
                float(cam.ortho_scale) * scale))
        return out


class FlightControls:
    """First-person movement + mouse look (FlightControls.cxx)."""

    def __init__(self, move_speed: float = 1.0, look_speed: float = 0.003):
        self.move_speed = move_speed
        self.look_speed = look_speed

    def move(self, cam: Camera, forward: float = 0.0, strafe: float = 0.0,
             lift: float = 0.0, dt: float = 1.0 / 60.0) -> Camera:
        """WASD + up/down velocity movement (:223-263)."""
        eye, at, _, fwd, right, true_up = _cam_basis(cam)
        delta = (fwd * forward + right * strafe + true_up * lift) \
            * self.move_speed * dt
        return _replace(cam, eye=eye + delta, at=at + delta)

    def look(self, cam: Camera, dx_px: float, dy_px: float) -> Camera:
        """Mouse-look: rotate the view direction about the eye (:362-414)."""
        eye, at, up, fwd, right, _ = _cam_basis(cam)
        dist = np.linalg.norm(at - eye)
        yaw = -dx_px * self.look_speed
        pitch = -dy_px * self.look_speed
        d = _rotate_about(fwd, up / np.linalg.norm(up), yaw)
        nd = _rotate_about(d, right, pitch)
        if abs(np.dot(nd, up / np.linalg.norm(up))) < 0.995:
            d = nd
        d /= np.linalg.norm(d)
        cam = _replace(cam, at=eye + d * dist)
        # flight mode forces perspective (FlightControls.cxx contract)
        if cam.projection != PERSPECTIVE:
            cam = cam.replace(projection=PERSPECTIVE)
        return cam


def _rotate_about(v: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation."""
    c, s = np.cos(angle), np.sin(angle)
    return (v * c + np.cross(axis, v) * s
            + axis * np.dot(axis, v) * (1.0 - c))

"""Camera controllers: orbit / flight invariants."""
import numpy as np

from cadrays_tpu.cli.controls import FlightControls, OrbitControls
from cadrays_tpu.core.camera import ORTHOGRAPHIC, PERSPECTIVE, Camera


def _cam():
    return Camera.look_at(eye=(0, -5, 2), at=(0, 0, 0), up=(0, 0, 1))


class TestOrbit:
    def test_rotate_preserves_distance_and_target(self):
        oc = OrbitControls()
        cam = _cam()
        d0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.at))
        for _ in range(10):
            cam = oc.rotate(cam, 40.0, 25.0)
        np.testing.assert_allclose(np.asarray(cam.at), 0.0, atol=1e-6)
        d1 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.at))
        np.testing.assert_allclose(d1, d0, rtol=1e-6)

    def test_pitch_clamped_at_pole(self):
        oc = OrbitControls()
        cam = _cam()
        for _ in range(200):
            cam = oc.rotate(cam, 0.0, 50.0)  # pitch up relentlessly
        up = np.asarray(cam.up) / np.linalg.norm(np.asarray(cam.up))
        off = np.asarray(cam.eye) - np.asarray(cam.at)
        cosang = np.dot(off / np.linalg.norm(off), up)
        assert abs(cosang) <= 0.9951  # never flips over

    def test_pan_moves_eye_and_target_together(self):
        oc = OrbitControls()
        cam = _cam()
        cam2 = oc.pan(cam, 100.0, -50.0)
        d_eye = np.asarray(cam2.eye) - np.asarray(cam.eye)
        d_at = np.asarray(cam2.at) - np.asarray(cam.at)
        np.testing.assert_allclose(d_eye, d_at, atol=1e-6)
        assert np.linalg.norm(d_eye) > 0

    def test_zoom_dolly(self):
        oc = OrbitControls()
        cam = _cam()
        near = oc.zoom(cam, 3.0)
        d0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.at))
        d1 = np.linalg.norm(np.asarray(near.eye) - np.asarray(near.at))
        assert d1 < d0

    def test_zoom_ortho_scales(self):
        cam = Camera.look_at(eye=(0, -5, 0), at=(0, 0, 0), up=(0, 0, 1),
                             projection=ORTHOGRAPHIC, ortho_scale=2.0)
        oc = OrbitControls()
        out = oc.zoom(cam, 2.0)
        assert float(out.ortho_scale) < 2.0


class TestFlight:
    def test_move_forward(self):
        fc = FlightControls(move_speed=60.0)
        cam = _cam()
        out = fc.move(cam, forward=1.0, dt=1.0 / 60.0)
        fwd = np.asarray(cam.at) - np.asarray(cam.eye)
        fwd /= np.linalg.norm(fwd)
        delta = np.asarray(out.eye) - np.asarray(cam.eye)
        np.testing.assert_allclose(delta / np.linalg.norm(delta), fwd,
                                   atol=1e-6)

    def test_look_keeps_eye(self):
        fc = FlightControls()
        cam = _cam()
        out = fc.look(cam, 30.0, 10.0)
        np.testing.assert_allclose(np.asarray(out.eye), np.asarray(cam.eye),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out.at), np.asarray(cam.at))

    def test_look_forces_perspective(self):
        fc = FlightControls()
        cam = Camera.look_at(eye=(0, -5, 0), at=(0, 0, 0), up=(0, 0, 1),
                             projection=ORTHOGRAPHIC)
        out = fc.look(cam, 5.0, 0.0)
        assert out.projection == PERSPECTIVE

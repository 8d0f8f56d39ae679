"""Fly-camera controller semantics vs the reference input code
(reference: src/ray-tracer.cpp:24-134)."""

import math

import numpy as np
import pytest

from tpu_ray_tracer.utils.flycam import FlyCamera


def test_initial_state_matches_reference():
    cam = FlyCamera()
    np.testing.assert_allclose(cam.position, 0.0)
    assert cam.yaw_deg == 90.0 and cam.pitch_deg == 0.0
    # initial view direction is +z; movement_front likewise
    np.testing.assert_allclose(cam.direction, [0, 0, 1], atol=1e-15)
    np.testing.assert_allclose(cam.movement_front, [0, 0, 1], atol=1e-15)
    np.testing.assert_allclose(cam.camera_right, [1, 0, 0], atol=1e-15)


def test_mouse_look_decreases_and_clamps():
    cam = FlyCamera()
    cam.mouse_move(10.0, 5.0)  # positive offsets decrease yaw/pitch
    assert cam.yaw_deg == pytest.approx(89.0)
    assert cam.pitch_deg == pytest.approx(-0.5)
    cam.mouse_move(0.0, -10000.0)
    assert cam.pitch_deg == 89.0  # clamp (+)
    cam.mouse_move(0.0, 10000.0)
    assert cam.pitch_deg == -89.0  # clamp (-)


def test_movement_is_horizontal_for_ws():
    """movement_front = cross(camera_right, up) has no vertical component
    even when pitched (reference :51)."""
    cam = FlyCamera()
    cam.mouse_move(0.0, -300.0)  # pitch up 30 degrees
    assert cam.pitch_deg == pytest.approx(30.0)
    assert abs(cam.movement_front[1]) < 1e-12
    cam.move("w", dt=0.1)
    assert cam.position[1] == pytest.approx(0.0)
    assert np.linalg.norm(cam.position) == pytest.approx(1.0)  # 10 * 1 * 0.1


def test_vertical_keys():
    cam = FlyCamera()
    cam.move("q", dt=0.25)
    np.testing.assert_allclose(cam.position, [0, 2.5, 0])
    cam.move("z", dt=0.25)
    np.testing.assert_allclose(cam.position, [0, 0, 0], atol=1e-12)


def test_scroll_multiplier():
    cam = FlyCamera()
    cam.scroll(2.0)
    assert cam.speed_multiplier == pytest.approx(1.1**2)
    cam.move("w", dt=0.1)
    assert np.linalg.norm(cam.position) == pytest.approx(10 * 1.1**2 * 0.1)
    cam.scroll(-2.0)
    assert cam.speed_multiplier == pytest.approx(1.0)


def test_strafe_direction():
    cam = FlyCamera()  # looking +z, right = +x
    cam.move("d", dt=0.1)
    np.testing.assert_allclose(cam.position, [1.0, 0, 0], atol=1e-12)
    cam.move("a", dt=0.2)
    np.testing.assert_allclose(cam.position, [-1.0, 0, 0], atol=1e-12)


def test_to_camera_roundtrip():
    cam = FlyCamera()
    cam.mouse_move(100.0, -50.0)
    cam.move("wd", dt=0.05)
    c = cam.to_camera("float64")
    np.testing.assert_allclose(np.asarray(c.position), cam.position)
    assert float(np.asarray(c.yaw_deg)) == pytest.approx(cam.yaw_deg)
    assert float(np.asarray(c.pitch_deg)) == pytest.approx(cam.pitch_deg)

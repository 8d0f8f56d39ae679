"""Terminal viewer building blocks (pure functions; the interactive loop
needs a TTY and is exercised manually)."""

import numpy as np

from tpu_ray_tracer.utils.film import flip_vertical, to_uint8
from tpu_ray_tracer.utils.term_view import frame_to_ansi


def test_to_uint8_rounds_like_reference():
    # iround semantics (reference update-cuda.cu:149): round-half-up
    img = np.array([[[0.0, 0.5 / 255.0, 1.0]]], dtype=np.float32)
    out = to_uint8(img)
    assert out.tolist() == [[[0, 1, 255]]]
    # clamping
    img = np.array([[[-0.5, 2.0, 0.25]]], dtype=np.float32)
    assert to_uint8(img).tolist() == [[[0, 255, 64]]]


def test_flip_vertical():
    img = np.arange(12).reshape(2, 2, 3)
    np.testing.assert_array_equal(flip_vertical(img)[0], img[1])


def test_frame_to_ansi_shape_and_colors():
    # 4x2 image, distinct colors; expect 2 text rows x 2 columns of cells
    img = np.zeros((4, 2, 3), dtype=np.float32)
    img[3, 0] = [1, 0, 0]  # top-left after flip
    ansi = frame_to_ansi(img)
    lines = ansi.split("\n")
    assert len(lines) == 2
    assert "▀" in lines[0]
    assert "38;2;255;0;0" in lines[0]  # red reaches the top-left foreground


def test_frame_to_ansi_odd_height_dropped():
    img = np.zeros((5, 3, 3), dtype=np.float32)
    ansi = frame_to_ansi(img)
    assert len(ansi.split("\n")) == 2

"""App-shell tests: the CLI surface end to end (render both backends, error
paths with the reference's message/exit-code surface, animate, fit)."""

import os

import numpy as np
import pytest

from tpu_ray_tracer.cli import main

from conftest import scene_path


def test_render_numpy_backend(tmp_path, capsys):
    out = str(tmp_path / "img.png")
    rc = main(["render", scene_path("quadratic"), "--backend", "numpy",
               "--size", "32", "24", "-o", out])
    assert rc == 0
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert "Wrote" in capsys.readouterr().out


def test_render_jax_backend_npy(tmp_path):
    out = str(tmp_path / "img.npy")
    rc = main(["render", scene_path("quadratic"), "--size", "32", "24",
               "-o", out])
    assert rc == 0
    img = np.load(out)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()


def test_render_missing_scene(capsys):
    rc = main(["render", "/nonexistent/scene.yml"])
    assert rc == 1
    err = capsys.readouterr().err
    # reference error surface (src/ray-tracer.cpp:151-158)
    assert "Error during scene loading" in err
    assert "Cannot read the file" in err


def test_render_invalid_scene(tmp_path, capsys):
    path = tmp_path / "bad.yml"
    path.write_text("width: 5\nheight: 5\nobjects: []\nlight_sources: []\n")
    rc = main(["render", str(path)])
    assert rc == 1
    assert "Value 'fov' undefined" in capsys.readouterr().err


def test_animate_writes_frames(tmp_path):
    prefix = str(tmp_path / "fr_")
    rc = main(["animate", scene_path("quadratic"), "--backend", "numpy",
               "--size", "24", "16", "--frames", "2", "--prefix", prefix])
    assert rc == 0
    assert os.path.exists(prefix + "0000.png")
    assert os.path.exists(prefix + "0001.png")


def test_fit_self_recovery(tmp_path, capsys):
    rc = main(["fit", scene_path("cayley"), "--size", "24", "16",
               "--steps", "8", "--lr", "0.05"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loss:" in out

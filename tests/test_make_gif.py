"""scripts/make_gif.py: .uni sweep -> animated GIF preview."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def sweep_dir(tmp_path):
    from mpgan_tpu.io import uni
    rng = np.random.default_rng(0)
    for f in range(3):
        vol = rng.random((6, 8, 10, 1)).astype(np.float32)
        uni.write_density(str(tmp_path / f"source_1000_{f:04d}.uni"),
                          vol[..., 0])
    return tmp_path


def test_gif_from_sweep(sweep_dir):
    out = str(sweep_dir / "anim.gif")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_gif.py"),
         "dir", str(sweep_dir), "out", out, "axis", "y", "fps", "10"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    from PIL import Image
    with Image.open(out) as im:
        assert im.n_frames == 3
        assert (im.width, im.height) == (10, 6)  # y-slice of (Z,Y,X)=(6,8,10)


def test_typo_flag_aborts(sweep_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_gif.py"),
         "dir", str(sweep_dir), "fpss", "10"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode != 0
    assert "fpss" in (r.stdout + r.stderr)


def test_empty_dir_clear_error(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_gif.py"),
         "dir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode != 0
    assert "no volumes" in (r.stdout + r.stderr)

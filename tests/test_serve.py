"""Serving daemon tests: protocol round-trip, determinism, error paths,
orderly shutdown (scripts/serve.py + mpgan_tpu.serve; subprocess, CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + args.split(),
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900)
    assert r.returncode == 0, \
        f"{script} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Tiny dataset + tiny trained G1, served by a live serve.py process."""
    d = str(tmp_path_factory.mktemp("serve"))
    _run("datagen.py",
         f"basePath {d}/data/ fromSim 1000 toSim 1000 resHigh 32 upRes 4 "
         "frames 3 warmup 2 randSeed 1", d)
    _run("multipass_gan.py",
         f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 3 "
         "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 batchSize 2 "
         "saveInterval 2 outputInterval 2 useTempoD 0 firstNN 1 genFilters 8 "
         f"discFilters 8 genBlocks 1 dtype float32 testPath {d}/runs/ "
         "randSeed 3", d)
    sock = os.path.join(d, "mpgan.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py")] +
        f"basePath {d}/data/ upRes 4 tileSizeLow 6 useVelocities 1 "
        f"load_model_test 0 genFilters 8 genBlocks 1 "
        f"dtype float32 testPath {d}/runs/ sock {sock} "
        f"warmShape 8,8,8".split(),
        cwd=d, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    # wait for the ready line (includes the warm compile)
    seen = []
    for line in proc.stdout:  # EOF = process died before becoming ready
        seen.append(line)
        if line.startswith("serving"):
            break
    else:
        proc.wait()
        raise RuntimeError("server never came up:\n" + "".join(seen))
    yield d, sock, proc
    if proc.poll() is None:
        proc.kill()
    proc.wait()


def _lr_frame(d, frame=1):
    from mpgan_tpu.io import uni
    sim = os.path.join(d, "data", "sim_1000")
    _, dens = uni.readUni(os.path.join(sim, f"density_low_{frame:04d}.uni"))
    _, vel = uni.readUni(os.path.join(sim, f"velocity_low_{frame:04d}.uni"))
    return np.concatenate([dens, vel], axis=-1).astype(np.float32)


def test_upscale_roundtrip_and_determinism(served):
    from mpgan_tpu.serve import Client
    d, sock, _ = served
    lr = _lr_frame(d)
    with Client(sock) as c:
        hr1 = c.upscale(lr)
        hr2 = c.upscale(lr)  # same connection, second request
    assert hr1.shape == (32, 32, 32, 1)
    assert np.isfinite(hr1).all()
    assert hr1.std() > 0  # not a constant field
    np.testing.assert_array_equal(hr1, hr2)


def test_matches_batch_inference(served):
    """The served result equals the batch CLI path (same checkpoint)."""
    from mpgan_tpu.io import uni
    from mpgan_tpu.serve import Client
    d, sock, _ = served
    _run("multipass_gan.py",
         f"out 1 basePath {d}/data/ fromSim 1000 toSim 1000 upRes 4 "
         "tileSizeLow 6 useVelocities 1 load_model_test 0 "
         "outFrameMin 1 outFrameMax 2 genFilters 8 genBlocks 1 dtype float32 "
         f"testPath {d}/runs/", d)
    _, batch = uni.readUni(os.path.join(
        d, "runs", "test_0001", "source_1000_0001.uni"))
    with Client(sock) as c:
        hr = c.upscale(_lr_frame(d))
    np.testing.assert_allclose(hr[..., 0], batch[..., 0], atol=1e-5)


def test_channel_mismatch_is_reported(served):
    from mpgan_tpu.serve import Client
    d, sock, _ = served
    with Client(sock) as c:
        with pytest.raises(RuntimeError, match="channels"):
            c.upscale(np.zeros((8, 8, 8, 1), np.float32))
        # the server drains the rejected payload, so the SAME connection
        # stays protocol-synced for a corrected request
        hr = c.upscale(_lr_frame(d))
        assert hr.shape == (32, 32, 32, 1)


def test_bad_magic_is_reported(served):
    import socket as pysocket
    import struct
    from mpgan_tpu import serve as sv
    _, sock, _ = served
    s = pysocket.socket(pysocket.AF_UNIX, pysocket.SOCK_STREAM)
    s.settimeout(60)
    s.connect(sock)
    s.sendall(b"XXXX" + b"\0" * 20)
    assert sv._recv_exact(s, 4) == sv.MAGIC_ERR
    (ln,) = struct.unpack("<I", sv._recv_exact(s, 4))
    assert b"magic" in sv._recv_exact(s, ln)
    s.close()


def test_shutdown_is_orderly_with_idle_connection(served):
    """Shutdown must not block on an idle keep-alive connection (a viewer
    parked between frames): idle handlers poll the shutdown flag and exit
    within ~1 s, so the process ends promptly, not after the 600 s recv
    timeout. (This test runs LAST in file order — it stops the server.)"""
    from mpgan_tpu.serve import Client
    _, sock, proc = served
    idle = Client(sock)  # connected, sends nothing
    try:
        with Client(sock) as c:
            c.shutdown_server()
        assert proc.wait(timeout=60) == 0
        assert not os.path.exists(sock)  # socket cleaned up
    finally:
        idle.close()

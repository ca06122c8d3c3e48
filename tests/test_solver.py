"""Solver correctness tests (SURVEY.md §4(6)): projection, buoyancy, datagen."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mpgan_tpu.io import uni
from mpgan_tpu.solver import datagen, noise, smoke


def test_projection_kills_divergence():
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((16, 16, 16, 3)).astype(np.float32))
    solid = jnp.zeros((16, 16, 16, 1))
    div_before = np.abs(np.asarray(smoke.divergence(
        smoke.enforce_boundaries(vel, solid)))).mean()
    out = smoke.project(vel, solid, iters=200)
    div_after = np.abs(np.asarray(smoke.divergence(out))).mean()
    assert div_after < 0.05 * div_before, (div_before, div_after)


def test_projection_is_idempotent_on_divfree_field():
    rng = np.random.default_rng(1)
    vel = jnp.asarray(rng.standard_normal((12, 12, 12, 3)).astype(np.float32))
    solid = jnp.zeros((12, 12, 12, 1))
    v1 = smoke.project(vel, solid, iters=300)
    v2 = smoke.project(v1, solid, iters=300)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-2)


def test_buoyancy_makes_plume_rise():
    res = 24
    state = smoke.init_state(res, res, res)
    inflow = smoke.sphere_mask(res, res, res, (0.5, 0.15, 0.5), 0.15)
    params = smoke.SmokeParams(jacobi_iters=30)
    key = jax.random.PRNGKey(0)
    com0 = None
    for t in range(12):
        src = noise.time_varying_inflow(key, inflow, t)
        state = smoke.step(state, params, src, inflow)
        if t == 3:
            d = np.asarray(state.density[..., 0])
            com0 = (d * np.arange(res)[None, :, None]).sum() / max(d.sum(), 1e-6)
    d = np.asarray(state.density[..., 0])
    com1 = (d * np.arange(res)[None, :, None]).sum() / max(d.sum(), 1e-6)
    assert np.isfinite(d).all()
    assert d.min() >= -1e-4  # advection limiter keeps density non-negative
    assert com1 > com0 + 0.3, (com0, com1)  # center of mass moved up (+y)


def test_solid_obstacle_stays_empty():
    res = 20
    solid = smoke.sphere_mask(res, res, res, (0.5, 0.5, 0.5), 0.2)
    state = smoke.init_state(res, res, res, solid)
    inflow = smoke.sphere_mask(res, res, res, (0.5, 0.12, 0.5), 0.15)
    params = smoke.SmokeParams(jacobi_iters=30)
    key = jax.random.PRNGKey(1)
    for t in range(10):
        src = noise.time_varying_inflow(key, inflow, t)
        state = smoke.step(state, params, src, inflow)
    d = np.asarray(state.density[..., 0])
    s = np.asarray(solid[..., 0])
    assert (d * s).max() < 1e-5
    v = np.asarray(state.velocity)
    assert np.abs(v * np.asarray(solid)).max() < 1e-5


def test_generate_sim_writes_pairs(tmp_path):
    sim_dir = str(tmp_path / "sim_1000")
    datagen.generate_sim(sim_dir, seed=0, res_hi=32, up_res=4, frames=3,
                         warmup=2)
    for f in range(3):
        hd, dh = uni.readUni(os.path.join(sim_dir, f"density_high_{f:04d}.uni"))
        hl, dl = uni.readUni(os.path.join(sim_dir, f"density_low_{f:04d}.uni"))
        _, vl = uni.readUni(os.path.join(sim_dir, f"velocity_low_{f:04d}.uni"))
        assert dh.shape == (32, 32, 32, 1)
        assert dl.shape == (8, 8, 8, 1)
        assert vl.shape == (8, 8, 8, 3)
        assert np.isfinite(dh).all() and np.isfinite(dl).all()
    # the plume actually contains smoke
    assert dh.max() > 0.1


def test_noise_in_range():
    n = np.asarray(noise.value_noise_3d(jax.random.PRNGKey(0), (16, 16, 16)))
    assert n.shape == (16, 16, 16)
    assert 0.0 <= n.min() and n.max() <= 1.0
    # smooth: neighbor diffs well below range
    assert np.abs(np.diff(n, axis=0)).mean() < 0.2

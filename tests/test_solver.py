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


def test_2d_solver_plume_rises():
    from mpgan_tpu.solver import smoke2d
    res = 32
    state = smoke2d.init_state(res, res)
    inflow = smoke2d.disc_mask(res, res, (0.15, 0.5), 0.15)
    params = smoke.SmokeParams(jacobi_iters=30)
    key = jax.random.PRNGKey(0)
    for t in range(12):
        n = noise.value_noise_3d(jax.random.fold_in(key, t), (1, res, res))[0]
        src = (0.5 + 0.5 * n)[..., None] * inflow
        state = smoke2d.step(state, params, src, inflow)
    d = np.asarray(state.density[..., 0])
    assert np.isfinite(d).all() and d.max() > 0.3
    com = (d * np.arange(res)[:, None]).sum() / d.sum()
    assert com > 0.2 * res  # smoke moved up


def test_2d_projection_kills_divergence():
    from mpgan_tpu.solver import smoke2d
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((24, 24, 2)).astype(np.float32))
    solid = jnp.zeros((24, 24, 1))
    before = np.abs(np.asarray(smoke2d.divergence(
        smoke2d.enforce_boundaries(vel, solid)))).mean()
    out = smoke2d.project(vel, solid, 200)
    after = np.abs(np.asarray(smoke2d.divergence(out))).mean()
    assert after < 0.05 * before


def test_2d_datagen_writes_z1_volumes(tmp_path):
    sim_dir = str(tmp_path / "sim_1000")
    datagen.generate_sim_2d(sim_dir, seed=0, res_hi=32, up_res=4, frames=2,
                            warmup=2)
    from mpgan_tpu.data.loader import FluidDataLoader
    base = str(tmp_path)
    ds = FluidDataLoader(base, 1000, 1000, frame_max=2).get()
    assert ds.lr.shape == (2, 1, 8, 8, 4)
    assert ds.hr.shape == (2, 1, 32, 32, 1)
    assert ds.up_res == 4


def test_cg_projection_beats_jacobi_at_equal_iters():
    """CG (mantaflow's solver; SURVEY §2.13 N1) at equal iteration count —
    i.e. roughly equal stencil cost — must beat Jacobi's divergence residual
    by a wide margin (measured ~200x on this fixture: 4e-5 vs 8e-3)."""
    rng = np.random.default_rng(2)
    vel = jnp.asarray(rng.standard_normal((16, 16, 16, 3)).astype(np.float32))
    solid = smoke.sphere_mask(16, 16, 16, (0.5, 0.5, 0.5), 0.2)
    vel = vel * (1.0 - solid)
    after_j = np.abs(np.asarray(smoke.divergence(
        smoke.project(vel, solid, iters=60)))
        * (1.0 - np.asarray(solid))).mean()
    after_cg = np.abs(np.asarray(smoke.divergence(
        smoke.project(vel, solid, iters=60, solver="cg")))
        * (1.0 - np.asarray(solid))).mean()
    assert after_cg < 0.05 * after_j, (after_j, after_cg)


def test_cg_iterating_past_convergence_is_safe():
    """Guarded CG updates: once converged, extra iterations are no-ops
    (no NaN from 0/0 step sizes)."""
    rng = np.random.default_rng(3)
    vel = jnp.asarray(rng.standard_normal((12, 12, 12, 3)).astype(np.float32))
    solid = jnp.zeros((12, 12, 12, 1))
    out = smoke.project(vel, solid, iters=2000, solver="cg")
    assert np.isfinite(np.asarray(out)).all()
    after = np.abs(np.asarray(smoke.divergence(out))).mean()
    assert after < 1e-4


def test_cg_step_matches_jacobi_step_physics():
    """A solver step with pressure_solver='cg' produces the same qualitative
    plume as Jacobi (finite, non-negative, divergence-free) — and the two
    velocity fields agree closely since both solve the same Poisson system."""
    res = 20
    key = jax.random.PRNGKey(4)
    inflow = smoke.sphere_mask(res, res, res, (0.5, 0.15, 0.5), 0.15)
    s_j = s_cg = smoke.init_state(res, res, res)
    p_j = smoke.SmokeParams(jacobi_iters=400)
    p_cg = smoke.SmokeParams(pressure_solver="cg", cg_iters=60)
    for t in range(6):
        src = noise.time_varying_inflow(key, inflow, t)
        s_j = smoke.step(s_j, p_j, src, inflow)
        s_cg = smoke.step(s_cg, p_cg, src, inflow)
    assert np.isfinite(np.asarray(s_cg.velocity)).all()
    np.testing.assert_allclose(np.asarray(s_cg.velocity),
                               np.asarray(s_j.velocity), atol=2e-2)
    np.testing.assert_allclose(np.asarray(s_cg.density),
                               np.asarray(s_j.density), atol=2e-2)


def test_2d_cg_projection():
    from mpgan_tpu.solver import smoke2d
    rng = np.random.default_rng(5)
    vel = jnp.asarray(rng.standard_normal((24, 24, 2)).astype(np.float32))
    solid = smoke2d.disc_mask(24, 24, (0.5, 0.5), 0.2)
    vel = vel * (1.0 - solid)
    out = smoke2d.project(vel, solid, 40, solver="cg")
    after = np.abs(np.asarray(smoke2d.divergence(out))
                   * (1.0 - np.asarray(solid))).mean()
    before = np.abs(np.asarray(smoke2d.divergence(
        smoke2d.enforce_boundaries(vel, solid)))).mean()
    assert after < 0.02 * before, (before, after)


def test_with_obstacle_is_range_stable():
    """Obstacle cadence keys on the SIM ID: a resumed sweep (different
    fromSim) must assign the identical scene to the same sim id."""
    full = {s: datagen.with_obstacle(s, 3) for s in range(1000, 1010)}
    resumed = {s: datagen.with_obstacle(s, 3) for s in range(1005, 1010)}
    for s, v in resumed.items():
        assert v == full[s]
    assert sum(full.values()) == 3  # every 3rd sim


def test_flags_file_uses_mantaflow_encoding(tmp_path):
    """flags_%04d.uni must encode TypeFluid=1 / TypeObstacle=2 (mantaflow
    FlagGrid), not raw 0/1 — external consumers decode by those values."""
    sim_dir = str(tmp_path / "sim_0000")
    datagen.generate_sim(sim_dir, seed=1, res_hi=16, up_res=2, frames=1,
                         warmup=0, with_obstacle=True, save_flags=True)
    head, flags = uni.readUni(os.path.join(sim_dir, "flags_0000.uni"))
    assert head["gridType"] == uni.TYPE_FLAGS
    vals = set(np.unique(flags).tolist())
    assert vals == {1, 2}, vals  # fluid=1, obstacle=2, nothing else


def test_varied_scene_randomizes_per_seed():
    """The varied family must actually vary: two seeds give different inflow
    geometry and physics parameters (VERDICT r2 missing #4)."""
    a = datagen.varied_plume_scene(jax.random.PRNGKey(1), 16)
    b = datagen.varied_plume_scene(jax.random.PRNGKey(2), 16)
    (_, inf_a, par_a, str_a, _), (_, inf_b, par_b, str_b, _) = a, b
    assert par_a.buoyancy != par_b.buoyancy
    assert par_a.vorticity_eps != par_b.vorticity_eps
    assert str_a != str_b
    assert not np.array_equal(np.asarray(inf_a), np.asarray(inf_b))
    # same seed → identical scene (restartable sweeps depend on this)
    a2 = datagen.varied_plume_scene(jax.random.PRNGKey(1), 16)
    assert a2[2].buoyancy == par_a.buoyancy
    np.testing.assert_array_equal(np.asarray(a2[1]), np.asarray(inf_a))


def test_dual_inflow_scene_has_more_source():
    """varied-dual adds a second inflow sphere — strictly more source cells
    than the same seed's single-inflow scene."""
    _, inf1, _, _, _ = datagen.varied_plume_scene(jax.random.PRNGKey(3), 24)
    _, inf2, _, _, _ = datagen.varied_plume_scene(jax.random.PRNGKey(3), 24,
                                                  scene="varied-dual")
    assert float(inf2.sum()) > float(inf1.sum())


def test_moving_scene_solid_orbits():
    """The moving family's solid mask is time-dependent and stays the same
    size (a translated sphere, not a deformed one)."""
    state, _, _, _, solid_at = datagen.varied_plume_scene(
        jax.random.PRNGKey(4), 24, scene="moving")
    assert solid_at is not None
    s0 = np.asarray(solid_at(jnp.float32(0.0)))
    s10 = np.asarray(solid_at(jnp.float32(10.0)))
    assert not np.array_equal(s0, s10)
    assert abs(s0.sum() - s10.sum()) / max(s0.sum(), 1.0) < 0.25
    np.testing.assert_array_equal(np.asarray(state.solid), s0)


def test_generate_sim_moving_scene_writes_frames(tmp_path):
    """End-to-end moving-obstacle sim: files exist, smoke is present, and the
    per-frame flags files track the orbiting obstacle."""
    sim_dir = str(tmp_path / "sim_3020")
    datagen.generate_sim(sim_dir, seed=7, res_hi=24, up_res=4, frames=3,
                         warmup=2, save_flags=True, scene="moving")
    _, d = uni.readUni(os.path.join(sim_dir, "density_high_0002.uni"))
    assert d.shape == (24, 24, 24, 1) and np.isfinite(d).all()
    assert d.max() > 0.05
    _, f0 = uni.readUni(os.path.join(sim_dir, "flags_0000.uni"))
    _, f2 = uni.readUni(os.path.join(sim_dir, "flags_0002.uni"))
    assert set(np.unique(f0)) <= {1, 2} and (f0 == 2).any()
    assert not np.array_equal(f0, f2)  # the obstacle moved

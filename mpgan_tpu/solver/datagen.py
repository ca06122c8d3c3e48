"""Training-data generation: buoyant smoke scenes → LR/HR .uni pairs.

Mirrors the reference's mantaflow datagen flow (SURVEY.md §2.12/§3.5): per
simulation, run an HR plume (optionally with a solid obstacle), and per frame
write ``density_high_%04d.uni`` / ``velocity_high_%04d.uni`` plus blurred+
downsampled ``density_low_%04d.uni`` / ``velocity_low_%04d.uni`` into
``<base>/sim_%04d/``. LR pairs come from downsampling HR, exactly as the
reference does — LR is never simulated separately.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mpgan_tpu.io import uni
from mpgan_tpu.ops.resample import downsample_3d
from mpgan_tpu.solver import noise, smoke


def plume_scene(key: jax.Array, res: int, with_obstacle: bool = False,
                pressure_solver: str = "jacobi"):
    """Build (state, inflow_mask, params) for a rising-plume scene."""
    solid = None
    if with_obstacle:
        k1, key = jax.random.split(key)
        cy = float(jax.random.uniform(k1, (), minval=0.45, maxval=0.65))
        solid = smoke.sphere_mask(res, res, res, (0.5, cy, 0.5), 0.12)
    state = smoke.init_state(res, res, res, solid)
    # inflow: sphere near the bottom (y is up)
    inflow = smoke.sphere_mask(res, res, res, (0.5, 0.12, 0.5), 0.14)
    if solid is not None:
        inflow = inflow * (1.0 - solid)
    params = smoke.SmokeParams(
        dt=0.5, buoyancy=2e-2, vorticity_eps=0.1,
        jacobi_iters=50, maccormack=True, pressure_solver=pressure_solver,
    )
    return state, inflow, params


SCENES = ("plume", "varied", "varied-dual", "moving")


def varied_plume_scene(key: jax.Array, res: int, scene: str = "varied",
                       pressure_solver: str = "jacobi"):
    """Randomized scene family (SURVEY.md §2.12 'noise-seeded inflow variety',
    '~10–20 sims'; VERDICT r2 missing #4): inflow position/radius/strength,
    buoyancy, vorticity-confinement strength, and obstacle count/size/position
    are all drawn per sim from ``key``, so a training sweep covers a scene
    DISTRIBUTION instead of one fixed template.

    Families:
      varied       — randomized plume + 0–2 random static sphere obstacles
                     (the training family)
      varied-dual  — TWO randomized inflow spheres merging mid-domain
                     (held-out generalization family)
      moving       — randomized plume + one obstacle ORBITING through the
                     plume (held-out family; time-dependent solid)

    Returns ``(state, inflow_mask, params, strength, solid_at)`` where
    ``solid_at`` is None for static scenes or a jittable ``t → (Z,Y,X,1)``
    mask for the moving family.
    """
    ks = jax.random.split(key, 16)
    u = lambda k, lo, hi: float(jax.random.uniform(k, (), minval=lo, maxval=hi))

    solid = jnp.zeros((res, res, res, 1), jnp.float32)
    solid_at = None
    if scene == "moving":
        ob_cy = u(ks[0], 0.40, 0.60)
        ob_r = u(ks[1], 0.07, 0.12)
        ob_cz = u(ks[2], 0.40, 0.60)
        amp = u(ks[3], 0.14, 0.22)
        phase = u(ks[4], 0.0, 6.28)
        period = u(ks[5], 30.0, 60.0)

        # obstacle geometry bound as defaults: the closure must not pick up
        # the inflow draws below that reuse these variable names
        def solid_at(t, cy=ob_cy, r=ob_r, cz=ob_cz):
            # sphere_mask is jit-safe with a traced center component
            cx = 0.5 + amp * jnp.sin(2.0 * jnp.pi * t / period + phase)
            return smoke.sphere_mask(res, res, res, (cz, cy, cx), r)

        solid = solid_at(jnp.float32(0.0))
    else:
        n_obs = int(jax.random.randint(ks[0], (), 0, 3))
        for i in range(n_obs):
            ko = jax.random.split(ks[1 + i], 4)
            c = (u(ko[0], 0.25, 0.75), u(ko[1], 0.35, 0.70),
                 u(ko[2], 0.25, 0.75))
            solid = jnp.maximum(
                solid, smoke.sphere_mask(res, res, res, c,
                                         u(ko[3], 0.06, 0.13)))

    cx = u(ks[6], 0.35, 0.65)
    cz = u(ks[7], 0.35, 0.65)
    rad = u(ks[8], 0.10, 0.17)
    inflow = smoke.sphere_mask(res, res, res, (cz, 0.12, cx), rad)
    if scene == "varied-dual":
        cx2 = u(ks[9], 0.25, 0.75)
        cz2 = u(ks[10], 0.25, 0.75)
        inflow = jnp.maximum(
            inflow, smoke.sphere_mask(res, res, res, (cz2, 0.12, cx2),
                                      u(ks[11], 0.08, 0.14)))
    inflow = inflow * (1.0 - solid)

    params = smoke.SmokeParams(
        dt=0.5,
        buoyancy=u(ks[12], 0.012, 0.030),
        vorticity_eps=u(ks[13], 0.05, 0.20),
        jacobi_iters=50, maccormack=True, pressure_solver=pressure_solver,
    )
    strength = u(ks[14], 0.7, 1.3)
    return smoke.init_state(res, res, res, solid), inflow, params, strength, \
        solid_at


def _frame_progress(f: int) -> None:
    """Per-frame liveness + fault injection for the retryOnError supervisor
    (scripts/datagen.py): heartbeat every written frame; MPGAN_FAIL_ONCE
    kills the process after the first frame unless its sentinel exists
    (same protocol as train/loop.py's injector, for recovery tests)."""
    from mpgan_tpu.utils.liveness import touch_heartbeat
    touch_heartbeat()
    fail_once = os.environ.get("MPGAN_FAIL_ONCE")
    if fail_once and not os.path.exists(fail_once):
        with open(fail_once, "w"):
            pass
        print(f"MPGAN_FAIL_ONCE: injected fault after frame {f}", flush=True)
        os._exit(17)


def generate_sim(sim_dir: str, seed: int, res_hi: int, up_res: int,
                 frames: int, warmup: int = 8, with_obstacle: bool = False,
                 save_flags: bool = False,
                 pressure_solver: str = "jacobi",
                 scene: str = "plume", write_high_vel: bool = True) -> None:
    """Run one simulation and write LR/HR .uni pairs per frame."""
    os.makedirs(sim_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    strength, solid_at = 1.0, None
    if scene == "plume":
        state, inflow_mask, params = plume_scene(
            key, res_hi, with_obstacle, pressure_solver=pressure_solver)
    else:
        state, inflow_mask, params, strength, solid_at = varied_plume_scene(
            key, res_hi, scene, pressure_solver=pressure_solver)

    # One jitted function per frame: inflow noise + solver step (+ LR
    # downsample). Running these eagerly costs an op-by-op round trip per
    # primitive on the remote-compile TPU backend (~12 s/frame); fused they
    # run in milliseconds. The inflow mask is an explicit arg — closing over
    # a res_hi^3 array would bake it into the remote-compile payload
    # (HTTP 413 at dataset resolutions; CLAUDE.md).
    @jax.jit
    def frame_step(state, inflow, t):
        src = noise.time_varying_inflow(key, inflow, t, strength=strength)
        return smoke.step(state, params, src, inflow)

    @jax.jit
    def frame_outputs(state):
        # velocity magnitudes live in HR cell units; rescale so LR velocities
        # are in LR cell units (the reference trains on LR-grid velocities)
        return (downsample_3d(state.density, up_res),
                downsample_3d(state.velocity, up_res) / up_res)

    # moving-obstacle family: the solid mask is a traced arg of the solver
    # step (part of SmokeState), so swapping it per frame costs no recompile
    solid_fn = jax.jit(solid_at) if solid_at is not None else None

    inflow_mask = jnp.asarray(inflow_mask)
    t = 0
    for _ in range(warmup):
        if solid_fn is not None:
            state = state._replace(solid=solid_fn(jnp.float32(t)))
        state = frame_step(state, inflow_mask, t)
        t += 1

    for f in range(frames):
        if solid_fn is not None:
            state = state._replace(solid=solid_fn(jnp.float32(t)))
        state = frame_step(state, inflow_mask, t)
        t += 1

        dens_lo_j, vel_lo_j = frame_outputs(state)
        dens_hi = np.asarray(state.density)
        dens_lo = np.asarray(dens_lo_j)
        vel_lo = np.asarray(vel_lo_j)

        uni.write_density(os.path.join(sim_dir, f"density_high_{f:04d}.uni"), dens_hi[..., 0])
        if write_high_vel:
            # nothing in training/eval reads HR velocity (loader reads LR
            # velocity; eval resizes it) — but the reference's datagen writes
            # it, so it stays the default. writeHighVel 0 skips the dominant
            # device→host fetch (~3/4 of per-frame bytes on the axon tunnel).
            uni.write_velocity(
                os.path.join(sim_dir, f"velocity_high_{f:04d}.uni"),
                np.asarray(state.velocity))
        uni.write_density(os.path.join(sim_dir, f"density_low_{f:04d}.uni"), dens_lo[..., 0])
        uni.write_velocity(os.path.join(sim_dir, f"velocity_low_{f:04d}.uni"), vel_lo)
        if save_flags and state.solid is not None:
            # mantaflow FlagGrid encoding: TypeFluid=1, TypeObstacle=2 —
            # writing raw 0/1 would decode as no-type/TypeFluid downstream
            flags = np.asarray(1 + state.solid.astype(np.int32))
            uni.writeUni(os.path.join(sim_dir, f"flags_{f:04d}.uni"),
                         uni.make_header(flags, grid_type=uni.TYPE_FLAGS),
                         flags)
        _frame_progress(f)


def generate_sim_2d(sim_dir: str, seed: int, res_hi: int, up_res: int,
                    frames: int, warmup: int = 8,
                    with_obstacle: bool = False,
                    pressure_solver: str = "jacobi") -> None:
    """2D scene (reference ``dataDim 2``): writes (1, Y, X) .uni pairs."""
    from mpgan_tpu.ops.resample import downsample_2d
    from mpgan_tpu.solver import smoke2d

    os.makedirs(sim_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    solid = None
    if with_obstacle:
        solid = smoke2d.disc_mask(res_hi, res_hi, (0.55, 0.5), 0.1)
    state = smoke2d.init_state(res_hi, res_hi, solid)
    inflow = smoke2d.disc_mask(res_hi, res_hi, (0.12, 0.5), 0.12)
    if solid is not None:
        inflow = inflow * (1.0 - solid)
    params = smoke.SmokeParams(dt=0.5, buoyancy=2e-2, vorticity_eps=0.1,
                               jacobi_iters=50, maccormack=True,
                               pressure_solver=pressure_solver)

    @jax.jit
    def frame_step(state, inflow_m, t):
        # inflow as an explicit arg (no big closure constants; CLAUDE.md)
        n = noise.value_noise_3d(jax.random.fold_in(key, t),
                                 (1, res_hi, res_hi))[0]
        src = (0.5 + 0.5 * n)[..., None] * inflow_m
        return smoke2d.step(state, params, src, inflow_m)

    @jax.jit
    def frame_outputs(state):
        return (downsample_2d(state.density, up_res),
                downsample_2d(state.velocity, up_res) / up_res)

    inflow = jnp.asarray(inflow)
    t = 0
    for _ in range(warmup):
        state = frame_step(state, inflow, t)
        t += 1
    for f in range(frames):
        state = frame_step(state, inflow, t)
        t += 1
        d_lo, v_lo = frame_outputs(state)
        d_hi = np.asarray(state.density)[None]          # (1, Y, X, 1)
        v_hi = np.concatenate([np.asarray(state.velocity),
                               np.zeros_like(np.asarray(state.density))],
                              axis=-1)[None]            # vz = 0
        d_lo = np.asarray(d_lo)[None]
        v_lo = np.concatenate([np.asarray(v_lo),
                               np.zeros_like(np.asarray(d_lo[0]))], axis=-1)[None]
        uni.write_density(os.path.join(sim_dir, f"density_high_{f:04d}.uni"), d_hi[..., 0])
        uni.write_velocity(os.path.join(sim_dir, f"velocity_high_{f:04d}.uni"), v_hi)
        uni.write_density(os.path.join(sim_dir, f"density_low_{f:04d}.uni"), d_lo[..., 0])
        uni.write_velocity(os.path.join(sim_dir, f"velocity_low_{f:04d}.uni"), v_lo)
        _frame_progress(f)


def with_obstacle(sim: int, obstacles_every: int) -> bool:
    """Range-stable obstacle cadence, shared by every sweep loop: keyed on
    the SIM ID (not the enumeration index) so a resumed sweep with a
    different fromSim assigns the identical scene to each sim id — the
    skip-existing check depends on that stability."""
    return obstacles_every > 0 and sim % obstacles_every == obstacles_every - 1


def sim_scene_policy(scene: str, sim: int,
                     obstacles_every: int) -> tuple[bool, bool]:
    """(with_obstacle, save_flags) for one sim — THE per-sim scene policy,
    shared by generate_dataset and scripts/datagen.py so the CLI's
    skip-existing check and the library sweep can never disagree on which
    files a sim directory must contain. Randomized (non-plume) families
    always write flags (their obstacle layout is per-sim random)."""
    with_obs = scene == "plume" and with_obstacle(sim, obstacles_every)
    return with_obs, with_obs or scene != "plume"


def generate_dataset(base_path: str, from_sim: int, to_sim: int, res_hi: int,
                     up_res: int, frames: int, seed: int = 0,
                     obstacles_every: int = 0, scene: str = "plume",
                     write_high_vel: bool = True) -> None:
    """Generate sims ``sim_%04d`` for indices [from_sim, to_sim] inclusive.

    ``scene != "plume"`` selects a randomized family (varied_plume_scene);
    each sim draws its own scene parameters from ``seed + sim``, and flags
    files are always written (the obstacle layout is per-sim random)."""
    for sim in range(from_sim, to_sim + 1):
        with_obs, save_flags = sim_scene_policy(scene, sim, obstacles_every)
        sim_dir = os.path.join(base_path, f"sim_{sim:04d}")
        generate_sim(sim_dir, seed + sim, res_hi, up_res, frames,
                     with_obstacle=with_obs,
                     save_flags=save_flags, scene=scene,
                     write_high_vel=write_high_vel)

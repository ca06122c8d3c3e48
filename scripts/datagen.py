#!/usr/bin/env python
"""Data generation entry point — TPU-native stand-in for the reference's
mantaflow scene scripts (SURVEY.md §2.12):

    python scripts/datagen.py basePath data/ fromSim 1000 toSim 1009 \
        resHigh 128 upRes 4 frames 120 obstacles 0 randSeed 0
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()  # JAX_PLATFORMS must win over sitecustomize's pin

from mpgan_tpu.utils import params as ph


def _sim_complete(sim_dir: str, frames: int, with_obstacle: bool,
                  high_vel: bool = True) -> bool:
    """A sim dir is complete iff its LAST frame's files all exist — frames
    are written in order and .uni writes are atomic (tmp + rename)."""
    f = frames - 1
    names = [f"density_high_{f:04d}.uni",
             f"density_low_{f:04d}.uni", f"velocity_low_{f:04d}.uni"]
    if high_vel:
        names.append(f"velocity_high_{f:04d}.uni")
    if with_obstacle:
        names.append(f"flags_{f:04d}.uni")
    return all(os.path.exists(os.path.join(sim_dir, n)) for n in names)


def main(argv=None):
    eff_argv = list(sys.argv[1:]) if argv is None else list(argv)
    if argv is not None:
        ph.setParams(argv)
    cc = ph.getParam("compileCache", "")
    setup_compilation_cache(cc if cc else None)
    # elastic recovery, datagen flavor (SURVEY.md §5): a jax-free parent
    # restarts a dead/hung child (tunnel flaps hang backend init — observed
    # 2026-08-21); restarts are idempotent because retries force
    # skipExisting 1 and .uni writes are atomic. Heartbeat = one written
    # frame (solver.datagen touches it in the frame loops).
    retry_budget = int(ph.getParam("retryOnError", 0))
    hang_timeout = float(ph.getParam("hangTimeout", 0))
    if ((retry_budget > 0 or hang_timeout > 0)
            and not os.environ.get("MPGAN_DATAGEN_CHILD")):
        from mpgan_tpu.utils.supervise import supervise_restartable
        sys.exit(supervise_restartable(
            os.path.abspath(__file__), eff_argv, max(retry_budget, 0),
            hang_timeout, "MPGAN_DATAGEN_CHILD",
            heartbeat_dir=ph.getParam("basePath", "data/"),
            retry_flags=("skipExisting", "1")))
    base = ph.getParam("basePath", "data/")
    from_sim = int(ph.getParam("fromSim", 1000))
    to_sim = int(ph.getParam("toSim", from_sim))
    res_hi = int(ph.getParam("resHigh", 128))
    up_res = int(ph.getParam("upRes", 4))
    frames = int(ph.getParam("frames", 120))
    obstacles = int(ph.getParam("obstacles", 0))  # every Nth sim; 0 = never
    seed = int(ph.getParam("randSeed", 0))
    warmup = int(ph.getParam("warmup", 8))
    data_dim = int(ph.getParam("dataDim", 3))     # 2 → (1, Y, X) scenes
    psolver = ph.getParam("pressureSolver", "jacobi")  # jacobi | cg
    # scene family: plume (fixed template) | varied (randomized training
    # family) | varied-dual / moving (held-out generalization families) —
    # see solver/datagen.varied_plume_scene
    scene = ph.getParam("scene", "plume")
    # restartable sweeps: skip sims whose output is already complete (.uni
    # writes are atomic, so an existing final frame implies a finished sim)
    skip_existing = int(ph.getParam("skipExisting", 0))
    # writeHighVel 0 skips velocity_high_%04d.uni (unread by training/eval;
    # ~3/4 of per-frame device→host fetch bytes on the axon tunnel)
    high_vel = int(ph.getParam("writeHighVel", 1))
    ph.checkUnusedParams()
    if psolver not in ("jacobi", "cg"):
        sys.exit(f"pressureSolver must be jacobi or cg, got {psolver!r}")

    from mpgan_tpu.solver import datagen
    if scene not in datagen.SCENES:
        sys.exit(f"scene must be one of {datagen.SCENES}, got {scene!r}")
    if scene != "plume" and data_dim == 2:
        sys.exit("randomized scene families are 3D only (dataDim 3)")
    import time
    for sim in range(from_sim, to_sim + 1):
        # keyed on sim id (shared policy) so resumed sweeps are range-stable
        with_obs, save_flags = datagen.sim_scene_policy(scene, sim, obstacles)
        sim_dir = os.path.join(base, f"sim_{sim:04d}")
        # 2D scenes never write flags files, even with obstacles
        if skip_existing and _sim_complete(sim_dir, frames,
                                           save_flags and data_dim != 2,
                                           high_vel=bool(high_vel)):
            print(f"sim_{sim:04d}: complete ({frames} frames) — skipped")
            continue
        t0 = time.time()
        if data_dim == 2:
            datagen.generate_sim_2d(sim_dir, seed + sim, res_hi, up_res,
                                    frames, warmup=warmup,
                                    with_obstacle=with_obs,
                                    pressure_solver=psolver)
        else:
            datagen.generate_sim(sim_dir, seed + sim, res_hi, up_res, frames,
                                 warmup=warmup, with_obstacle=with_obs,
                                 save_flags=save_flags,
                                 pressure_solver=psolver, scene=scene,
                                 write_high_vel=bool(high_vel))
        print(f"sim_{sim:04d}: {frames} frames @{res_hi}^{data_dim} "
              f"(scene={scene}, obstacle={with_obs}) "
              f"in {time.time()-t0:.1f}s -> {sim_dir}")


if __name__ == "__main__":
    main()

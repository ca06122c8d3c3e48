#!/usr/bin/env python
"""Main entry point — reference-compatible CLI (SURVEY.md §2.1/§3).

Training (first or second pass):
    python scripts/multipass_gan.py out 0 basePath data/ fromSim 1000 toSim 1009 \
        upRes 4 tileSizeLow 16 useVelocities 1 trainingIters 10000 batchSize 16 \
        lrgan 0.0002 firstNN 1 useTempoD 1 randSeed 42

Inference (checkpoint → full 3D volumes):
    python scripts/multipass_gan.py out 1 basePath data/ fromSim 1000 toSim 1000 \
        load_model_test 0 load_model_no 4 load_model_test2 1 load_model_no2 4 \
        outFrameMin 0 outFrameMax 20

Flag names follow the tempoGAN/Multi-pass-GAN conventions; unknown flags abort
(checkUnusedParams). ``out 1`` + only ``load_model_test`` runs pass-1-only SR
with nearest z-upsampling; add ``load_model_test2``/``load_model_no2`` for the
full two-pass path.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()  # JAX_PLATFORMS must win over sitecustomize's pin

import numpy as np

from mpgan_tpu import config as cfgmod
from mpgan_tpu.utils import params as ph
from mpgan_tpu.utils.liveness import touch_heartbeat


def main(argv=None):
    argv = list(sys.argv[1:]) if argv is None else argv
    ph.setParams(argv)
    # persistent compile cache: repeat invocations with the same shapes skip
    # the 2-10 min cold remote compile (config-only; no backend init, so the
    # jax-free supervisor parent is unaffected)
    cc = ph.getParam("compileCache", "")
    setup_compilation_cache(cc if cc else None)
    # Elastic recovery (SURVEY.md §5 failure detection/recovery): with
    # retryOnError N, a parent process supervises the actual training run
    # and restarts it with resumeLatest 1 when it dies — covering Python
    # exceptions, the axon tunnel dropping mid-dispatch (observed to kill
    # the process silently), and external kills alike.
    retry_budget = int(ph.getParam("retryOnError", 0))
    # hang detection (0 = off): read here so the child's checkUnusedParams
    # sees the flag as consumed too. hangTimeout alone (retryOnError 0)
    # still arms the watchdog — a hang becomes a visible failure instead of
    # a silent wedge — it just doesn't restart.
    hang_timeout = float(ph.getParam("hangTimeout", 0))
    if ((retry_budget > 0 or hang_timeout > 0)
            and not os.environ.get("MPGAN_TRAIN_CHILD")):
        if ph.getParam("coordinator", "") or int(ph.getParam("numProcesses", 0)):
            sys.exit(
                "retryOnError/hangTimeout do not support multi-host "
                "(coordinator/numProcesses) jobs: per-host supervisors would "
                "race run-dir allocation and restart one host's process into "
                "a distributed job whose peers are blocked in the old run's "
                "collectives. Supervise and relaunch the whole job "
                "externally instead.")
        # bool(out), matching config's output_only truth (out 2 must not be
        # supervised as training while the child runs inference);
        # outputOnly is the upstream-tempoGAN spelling
        sys.exit(_supervise(
            argv, max(retry_budget, 0), hang_timeout,
            infer=bool(int(ph.getParam("out", ph.getParam("outputOnly", 0))))))
    # extra flags, read before from_cli's checkUnusedParams
    # multi-host (SURVEY.md §2.15): join a jax.distributed job before any
    # backend use so the mesh below spans all hosts' devices
    coordinator = ph.getParam("coordinator", "")
    num_processes = int(ph.getParam("numProcesses", 0))
    process_id = int(ph.getParam("processId", -1))
    if coordinator or num_processes:
        from mpgan_tpu.parallel import mesh as pmesh
        pmesh.init_distributed(coordinator or None, num_processes or None,
                               process_id if process_id >= 0 else None)
    load_test2 = int(ph.getParam("load_model_test2", -1))
    load_no2 = int(ph.getParam("load_model_no2", -1))
    load_test3 = int(ph.getParam("load_model_test3", -1))
    load_no3 = int(ph.getParam("load_model_no3", -1))
    pass2_source = ph.getParam("pass2Source", "gt")  # gt | g1
    # trainPass 3 trains the optional yz refiner; pass3Source model uses the
    # frozen two-pass outputs (load_model_test/no = G1, *_2 = G2) as inputs
    train_pass = int(ph.getParam("trainPass", 0))    # 0 = use firstNN
    pass3_source = ph.getParam("pass3Source", "gt")  # gt | model
    # training resume (pass-2 training uses load_model_test/no for the G1
    # source, so resume has its own flags there; for pass-1 training
    # load_model_test/no resume directly, as in the reference)
    resume_test = int(ph.getParam("resumeTest", -1))
    resume_no = int(ph.getParam("resumeNo", -1))
    # auto-resume: pick the newest same-pass checkpoint under testPath
    # (crash recovery without hand-picking run/model numbers)
    resume_latest = int(ph.getParam("resumeLatest", 0))
    # pinned-index resume (recipes): "this training OWNS run dir test_k —
    # resume it (completing its original budget), revive it if it died
    # before its first save, or create it". Unlike resumeLatest, never
    # touches any other run dir, so multi-config recipes can keep several
    # same-pass runs under one testPath with stable indices. Takes
    # precedence over resumeLatest.
    resume_index = int(ph.getParam("resumeIndex", -1))
    # generator-only warm start (e.g. GAN fine-tune from an L1 pretrain;
    # BASELINE config 1 "pretrained first-pass generator")
    warm_test = int(ph.getParam("warmStartTest", -1))
    warm_no = int(ph.getParam("warmStartNo", -1))
    cfg = cfgmod.from_cli(None)  # parses the already-installed argv

    if cfg.infer.output_only:
        run_inference(cfg, load_test2, load_no2, load_test3, load_no3)
    else:
        resume_total = False
        # supervisor restarts are scoped to run dirs created by THIS launch
        # (MPGAN_RESUME_MIN): an unrelated older run under the same testPath
        # must never hijack crash recovery
        resume_min = int(os.environ.get("MPGAN_RESUME_MIN", "-1"))
        run_override = None
        if resume_index >= 0:
            from mpgan_tpu.train import checkpoint as ckpt
            pno = train_pass if train_pass else (
                1 if cfg.train.first_gen_run else 2)
            rdir = ckpt.run_dir(cfg.train.test_path, resume_index)
            found = ckpt.latest_resumable(cfg.train.test_path, pass_no=pno,
                                          min_index=resume_index,
                                          max_index=resume_index)
            if found is not None:
                resume_test, resume_no = found
                resume_total = True  # complete the run's ORIGINAL budget
                run_override = rdir
                # idempotent-rerun fast path: a complete run exits here,
                # before the dataset load / G1 precompute sweep / compile
                meta_path = ckpt.model_dir(rdir, found[1]) + ".json"
                try:
                    with open(meta_path) as f:
                        meta = json.load(f)
                except (OSError, json.JSONDecodeError):
                    meta = {}
                total = int(meta.get("total_iters")
                            or cfg.train.training_iters)
                if int(meta.get("it", -1)) >= total:
                    print(f"resumeIndex {resume_index}: budget complete "
                          f"(model_{found[1]:04d} at iter {meta['it']}) — "
                          "nothing to do")
                    return
                print(f"resumeIndex {resume_index}: resuming "
                      f"model_{found[1]:04d}")
            elif ckpt.latest_model_no(rdir) is not None:
                # run dir holds checkpoints of a DIFFERENT pass: the recipe
                # pinned the wrong index — refusing beats silently training
                # a second run the recipe's later stages won't find
                sys.exit(f"resumeIndex {resume_index}: {rdir} holds "
                         f"checkpoints of another pass (expected pass "
                         f"{pno}) — wrong testPath/index")
            else:
                os.makedirs(rdir, exist_ok=True)
                run_override = rdir  # fresh (or died-before-first-save) dir
                print(f"resumeIndex {resume_index}: fresh start in "
                      f"{os.path.basename(rdir)}")
        elif resume_latest and (resume_test < 0 or resume_min >= 0):
            from mpgan_tpu.train import checkpoint as ckpt
            pno = train_pass if train_pass else (
                1 if cfg.train.first_gen_run else 2)
            found = ckpt.latest_resumable(cfg.train.test_path, pass_no=pno,
                                          min_index=resume_min)
            if found is not None:
                resume_test, resume_no = found
                resume_total = True  # recovery completes the original budget
                # recovery continues IN the found run dir (checkpoints and
                # metrics keep accumulating there): restarts must not shift
                # run indices a recipe's later stages/evals have pinned
                run_override = ckpt.run_dir(cfg.train.test_path, resume_test)
                print(f"resumeLatest: test_{resume_test:04d}/"
                      f"model_{resume_no:04d}")
            elif resume_test >= 0:
                print(f"resumeLatest: no in-scope checkpoint — honoring "
                      f"explicit resumeTest {resume_test}")
            else:
                # crash BEFORE the first save: restart from scratch INTO the
                # dead run dir (same pass, zero checkpoints) when one exists
                run_override = ckpt.recover_run_dir(
                    cfg.train.test_path, pno, min_index=resume_min)
                if run_override is not None:
                    print("resumeLatest: no prior checkpoint — fresh start "
                          f"reusing {os.path.basename(run_override)} "
                          "(died before its first save)")
                else:
                    print("resumeLatest: no prior checkpoint — fresh start")
        run_training(cfg, argv, pass2_source, resume_test, resume_no,
                     warm_test, warm_no, train_pass, pass3_source,
                     load_test2, load_no2, resume_total=resume_total,
                     run_override=run_override)


def _strip_flag(argv, name):
    """Remove ``name <value>`` pairs from a reference-style flag list
    (case-insensitive, matching paramhelpers.getParam semantics)."""
    out, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        if tok.lower() == name.lower():
            skip = True
            continue
        out.append(tok)
    return out


def _has_flag(argv, name):
    """True if the flag appears in argv (case-insensitive, like getParam)."""
    return any(tok.lower() == name.lower() for tok in argv)


def _next_run_index(test_path: str, create: bool = False) -> int:
    """Next free ``test_%04d`` index under ``test_path`` (pure-os mirror of
    checkpoint._next_run_dir_local — the supervising parent must not import
    jax/orbax). ``create`` reserves the dir (inference pinning); training
    leaves creation to the child."""
    import re
    os.makedirs(test_path, exist_ok=True)
    existing = [int(m.group(1)) for d in os.listdir(test_path)
                if (m := re.fullmatch(r"test_(\d{4})", d))]
    idx = max(existing, default=-1) + 1
    if create:
        os.makedirs(os.path.join(test_path, f"test_{idx:04d}"))
    return idx


def _run_child_watched(cmd, env, hang_timeout: float, heartbeat: str) -> int:
    """Shared implementation: mpgan_tpu.utils.supervise.run_child_watched
    (also used by the datagen CLI — the generic hang-watchdog lives there so
    the liveness contract can't drift between entry points)."""
    from mpgan_tpu.utils.supervise import run_child_watched
    return run_child_watched(cmd, env, hang_timeout, heartbeat)


def _supervise(argv, retries: int, hang_timeout: float = 0.0,
               infer: bool = False) -> int:
    """Restart a dead or hung child up to ``retries`` times; return the
    final exit code (0 on clean finish). Training children restart with
    ``resumeLatest 1``; inference children get a pre-allocated ``writeTest``
    run dir so restarts skip already-written frames. ``hang_timeout`` > 0
    additionally kills a child whose heartbeat goes stale that long — set
    it well above a cold remote compile (2-10 min on this tunnel)."""
    import time

    env = dict(os.environ, MPGAN_TRAIN_CHILD="1")
    script = os.path.abspath(__file__)
    delay = float(os.environ.get("MPGAN_RETRY_DELAY_S", "30"))
    base_argv = list(argv)
    test_path = ph.getParam("testPath", "test_out/")
    if infer and not _has_flag(base_argv, "writeTest"):
        idx = _next_run_index(test_path, create=True)
        base_argv += ["writeTest", str(idx)]
        print(f"retryOnError: inference outputs pinned to test_{idx:04d} "
              f"(writeTest {idx})", flush=True)
    # recovery scope: restarts may only resume checkpoints in run dirs this
    # launch creates (indices >= the next free one), so an unrelated older
    # run under the same testPath can never hijack recovery
    resume_min = None if infer else _next_run_index(test_path)
    # ... EXCEPT when the first attempt itself resumed an older run in place
    # (run-dir-stable recovery / an explicit resumeIndex): the child reports
    # the run dir it owns through this file, and retries pin to exactly that
    # index — a >=-next-free scope would miss it and retrain from scratch
    # into a fresh dir (observed 2026-08-20, duplicate 12k-iter trainings)
    run_file = None
    if not infer:
        os.makedirs(test_path, exist_ok=True)
        run_file = os.path.join(test_path, f".rundir_{os.getpid()}")
        env["MPGAN_RUN_FILE"] = run_file
    heartbeat = None
    if hang_timeout > 0:
        os.makedirs(test_path, exist_ok=True)
        heartbeat = os.path.join(test_path, f".heartbeat_{os.getpid()}")
        env["MPGAN_HEARTBEAT"] = heartbeat
    failures = 0
    try:
        while True:
            args = list(base_argv)
            attempt_env = dict(env)
            if failures and not infer:
                import re as _re
                owned = None
                try:
                    if run_file and os.path.exists(run_file):
                        base = os.path.basename(
                            open(run_file).read().strip())
                        m = _re.fullmatch(r"test_(\d{4})", base)
                        owned = int(m.group(1)) if m else None
                except OSError:
                    owned = None
                if owned is not None:
                    # retry exactly the dir the dead attempt was training
                    args = (_strip_flag(_strip_flag(args, "resumeLatest"),
                                        "resumeIndex")
                            + ["resumeIndex", str(owned)])
                else:  # died before allocating a run dir
                    args = (_strip_flag(args, "resumeLatest")
                            + ["resumeLatest", "1"])
                    attempt_env["MPGAN_RESUME_MIN"] = str(resume_min)
            cmd = [sys.executable, script] + args
            if heartbeat:
                rc = _run_child_watched(cmd, attempt_env, hang_timeout,
                                        heartbeat)
            else:
                from mpgan_tpu.utils.supervise import run_child
                rc = run_child(cmd, attempt_env)
            if rc == 0:
                return 0
            failures += 1
            if failures > retries:
                print(f"retryOnError: giving up after {failures} failures "
                      f"(last rc={rc})", flush=True)
                return rc
            kind = "inference" if infer else "training"
            how = ("skipping done frames" if infer else "with resumeLatest 1")
            print(f"retryOnError: {kind} child died (rc={rc}); restarting "
                  f"{how} in {delay:g}s [{failures}/{retries}]", flush=True)
            time.sleep(delay)
    finally:
        if heartbeat and os.path.exists(heartbeat):
            os.remove(heartbeat)
        if run_file and os.path.exists(run_file):
            os.remove(run_file)


def run_training(cfg, argv, pass2_source: str = "gt",
                 resume_test: int = -1, resume_no: int = -1,
                 warm_test: int = -1, warm_no: int = -1,
                 train_pass: int = 0, pass3_source: str = "gt",
                 load_test2: int = -1, load_no2: int = -1,
                 resume_total: bool = False,
                 run_override: str | None = None):
    import jax
    import jax.numpy as jnp
    from mpgan_tpu.data.loader import FluidDataLoader
    from mpgan_tpu.data.pipeline import TileCreator
    from mpgan_tpu.parallel import mesh as pmesh
    from mpgan_tpu.train import checkpoint as ckpt
    from mpgan_tpu.train.loop import Trainer
    from mpgan_tpu.utils import preview

    ds = FluidDataLoader(cfg.data.base_path, cfg.data.from_sim, cfg.data.to_sim,
                         cfg.data.frame_min, cfg.data.frame_max,
                         cfg.data.use_velocities, cfg.data.data_fraction,
                         use_vorticities=cfg.data.use_vorticities,
                         mac_recenter=cfg.data.mac_recenter).get()

    pass_no = train_pass if train_pass else (
        1 if cfg.train.first_gen_run else 2)

    final = None
    if pass_no == 3 and pass3_source == "model":
        from mpgan_tpu.infer import assemble
        gen1, params1 = _load_gen(cfg, 1, cfg.train.load_model_test,
                                  cfg.train.load_model_no)
        gen2, params2 = _load_gen(cfg, 2, load_test2, load_no2)
        final = assemble.precompute_finals(gen1, params1, gen2, params2,
                                           jnp.asarray(ds.lr), cfg.data.up_res)
        print(f"precomputed {final.shape[0]} two-pass output volumes")

    interm = None
    if pass_no == 2 and pass2_source == "g1":
        # train G2 on frozen-G1 outputs (SURVEY.md §3.2): one inference sweep
        # over the dataset produces the pass-2 input volumes
        from mpgan_tpu.infer import assemble
        gen1, params1 = _load_gen(cfg, 1, cfg.train.load_model_test,
                                  cfg.train.load_model_no)
        interm = assemble.precompute_intermediates(gen1, params1,
                                                   jnp.asarray(ds.lr))
        print(f"precomputed {interm.shape[0]} G1 intermediate volumes")

    tc = TileCreator(ds, cfg.data.tile_size_low, cfg.data.density_threshold,
                     cfg.data.augment, cfg.data.rot_mode,
                     cfg.data.scale_min, cfg.data.scale_max, interm=interm,
                     final=final)
    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    # multi-process: next_run_dir agrees on one path (process 0 creates it);
    # all file output below is lead-gated so hosts sharing a filesystem
    # don't clobber each other's metrics/checkpoints
    lead = jax.process_index() == 0
    # run_override: crash recovery (resumeLatest) continues in the dead
    # run's own dir instead of allocating the next index — see main()
    run = run_override or ckpt.next_run_dir(cfg.train.test_path)
    run_file = os.environ.get("MPGAN_RUN_FILE")
    if run_file and lead:
        # tell the retryOnError supervisor which run dir this attempt OWNS:
        # run-dir-stable recovery can resume a dir BELOW the supervisor's
        # next-free-index scope, and a retry scoped only by MPGAN_RESUME_MIN
        # would then miss it and retrain from scratch into a fresh dir
        # (observed 2026-08-20: test_0002/test_0003 duplicate trainings)
        with open(run_file, "w") as f:
            f.write(run)
    if lead:
        ckpt.save_param_log(run, cfg, argv, pass_no=pass_no)
    print(f"run dir: {run}; devices: {len(jax.devices())} "
          f"({jax.default_backend()}); pass {pass_no}")

    # the absolute iteration target is known only after the resume logic
    # below; the sidecar records it so crash recovery (resumeLatest) can
    # finish the ORIGINAL budget even when this run itself was an explicit
    # resumeTest/No continuation
    budget = {"total_iters": cfg.train.training_iters}

    def on_checkpoint(trainer, it):
        no = it // cfg.train.save_interval
        meta = dict(it=it, stage=trainer.rt.stage,
                    pass_no=trainer.pass_no, up_res=tc.up_res,
                    total_iters=budget["total_iters"])
        ckpt.save(run, no, trainer.rt.state, meta)
        ckpt.save_gen(run, no, trainer.rt.state.params_g)
        if cfg.train.ema_decay > 0:
            ckpt.save_gen(run, no, trainer.rt.ema, prefix="gen_ema")
        if lead:
            print(f"  saved model_{no:04d} at iter {it}")

    writer = preview.MetricsWriter(run) if lead else None
    preview_key = jax.random.PRNGKey(12345)
    preview_fns = {}  # (id(gen), stage) -> jitted forward (eager apply would
    # pay ~33 ms/primitive through the remote-dispatch tunnel)

    def on_log(trainer, metrics):
        print("  " + " ".join(f"{k}={v:.4g}" if isinstance(v, float) else
                              f"{k}={v}" for k, v in sorted(metrics.items())))
        writer.write(metrics)
        # [input | generated | target] patch grid, reference-style PNG dump
        rt = trainer.rt
        if trainer.pass_no == 1:
            b = tc.sample_pass1(preview_key, 4)
            x_in = b["lr"]
        elif trainer.pass_no == 2:
            b = tc.sample_pass2(preview_key, 4)
            x_in = jnp.concatenate([b["interm"]] +
                                   ([b["lr_vel"]] if "lr_vel" in b else []),
                                   axis=-1)
        else:
            b = tc.sample_pass3(preview_key, 4)
            x_in = jnp.concatenate([b["final"]] +
                                   ([b["lr_vel"]] if "lr_vel" in b else []),
                                   axis=-1)
        key_fn = (id(rt.gen), rt.stage)
        if key_fn not in preview_fns:
            gen, stage = rt.gen, rt.stage
            preview_fns[key_fn] = jax.jit(
                lambda p, x, g=gen, st=stage: g.apply(p, x, stage=st))
        fake = preview_fns[key_fn](rt.state.params_g, x_in)
        it = metrics["it"]
        preview.save_patch_grid(
            os.path.join(run, f"preview_{it + 1:06d}.png"),
            [jax.device_get(x_in[..., 0:1]), jax.device_get(fake),
             jax.device_get(b["hr"])])

    tr = Trainer(cfg, tc, mesh=mesh, pass_no=pass_no)
    start_it = 0
    if warm_test >= 0:
        # fresh optimizers + discriminators, generator weights from a saved
        # gen checkpoint (works across configs, unlike a full-state resume)
        prev_run = ckpt.run_dir(cfg.train.test_path, warm_test)
        no = warm_no if warm_no >= 0 else ckpt.latest_model_no(prev_run)
        if no is None:
            sys.exit(f"warmStartTest {warm_test}: no saved checkpoints in "
                     f"{prev_run}")
        key = jax.random.PRNGKey(cfg.train.rand_seed)
        tr.rt = tr._init_stage(tr.n_stages, key, None)
        params_g = ckpt.restore_gen(prev_run, no, tr.rt.state.params_g)
        import dataclasses
        ema = tr.rt.ema
        if cfg.train.ema_decay > 0:  # restart the average at the warm start
            from mpgan_tpu.train.loop import copy_tree
            ema = copy_tree(params_g)
        tr.rt = dataclasses.replace(
            tr.rt, state=tr.rt.state._replace(params_g=params_g), ema=ema)
        print(f"warm-started generator from {prev_run}/gen_{no:04d}")
    if pass_no == 1 and warm_test < 0 and resume_test < 0 \
            and cfg.train.load_model_test >= 0:
        # pass-1 semantics: load_model_* resumes training (reference behavior);
        # for pass 2/3 those flags name the frozen upstream generators
        # instead. resume_test < 0 guard: an explicit crash-recovery target
        # (resumeLatest) must NOT be clobbered back to the original
        # load_model_* run — that would discard the crashed run's progress.
        resume_test, resume_no = cfg.train.load_model_test, cfg.train.load_model_no
    total_iters = cfg.train.training_iters
    if resume_test >= 0:
        prev_run = ckpt.run_dir(cfg.train.test_path, resume_test)
        no = resume_no if resume_no >= 0 else ckpt.latest_model_no(prev_run)
        if no is None:
            sys.exit(f"resume from test_{resume_test:04d}: no saved "
                     f"checkpoints in {prev_run}")
        start_it = tr.restore(prev_run, no)
        if resume_total:
            # crash recovery (resumeLatest): finish the ORIGINAL budget —
            # restarting must be idempotent, not extend the run. The dead
            # run's sidecar records its absolute target (covers recovery of
            # an explicit resumeTest/No continuation, whose budget is NOT
            # cfg.train.training_iters).
            meta_path = ckpt.model_dir(prev_run, no) + ".json"
            recorded = -1
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    recorded = int(json.load(f).get("total_iters", -1))
            total_iters = (recorded if recorded > 0
                           else max(cfg.train.training_iters, start_it))
        else:
            total_iters = start_it + cfg.train.training_iters  # additional
        print(f"resumed from {prev_run}/model_{no:04d} at iter {start_it}; "
              f"training to {total_iters}")
    budget["total_iters"] = total_iters
    # on_checkpoint runs on every process (orbax saves are collective);
    # on_log (metrics csv/tb + preview PNGs) is lead-only
    last = tr.fit(iters=total_iters, on_checkpoint=on_checkpoint,
                  on_log=on_log if lead else None, start_it=start_it)
    # final checkpoint: next free number after any periodic saves; lead
    # decides (per-host listings could disagree on non-shared filesystems,
    # and orbax's collective save needs all processes on one path)
    latest = ckpt.latest_model_no(run)
    if not last and latest is not None:
        # zero iterations ran (the budget was already complete when we
        # resumed) and the dir already holds this exact state — saving again
        # would only write a duplicate checkpoint
        print(f"budget already complete (model_{latest:04d}); no new "
              "checkpoint")
        print(f"done: {last}")
        return run
    no = latest + 1 if latest is not None else 0  # NOT `or`: 0 is a real no
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        no = int(multihost_utils.broadcast_one_to_all(jnp.int32(no)))
    # total_iters included: resumeIndex's budget-complete fast path and
    # resumeLatest's original-budget recovery both read it — the final save
    # used to omit it, making a completed run's budget unknowable
    ckpt.save(run, no, tr.rt.state,
              dict(it=total_iters, stage=tr.rt.stage,
                   pass_no=tr.pass_no, up_res=tc.up_res,
                   total_iters=budget["total_iters"]))
    ckpt.save_gen(run, no, tr.rt.state.params_g)
    if cfg.train.ema_decay > 0:
        ckpt.save_gen(run, no, tr.rt.ema, prefix="gen_ema")
    print(f"done: {last}")
    return run


def _load_gen(cfg, pass_no, run_idx, model_no):
    """Rebuild the generator of a saved run and restore its params
    (shared library implementation: mpgan_tpu.infer.load)."""
    from mpgan_tpu.infer.load import load_generator
    return load_generator(cfg, pass_no, run_idx, model_no)


def run_inference(cfg, load_test2: int, load_no2: int,
                  load_test3: int = -1, load_no3: int = -1):
    """Checkpoint → full-volume SR sweep (SURVEY.md §3.3).

    Host I/O is overlapped with device compute (SURVEY.md §7 step 10):
    frame f+1's gzip decode runs in a reader thread while the device
    upscales frame f, and .uni/PNG writes drain through a writer thread."""
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp
    from mpgan_tpu.infer.load import load_pass_chain, make_default_upscaler
    from mpgan_tpu.io import uni
    from mpgan_tpu.train import checkpoint as ckpt

    chain = load_pass_chain(cfg, load_test2, load_no2, load_test3, load_no3)
    gen1, params1, gen2, params2, gen3, params3 = chain

    if cfg.infer.write_test >= 0:
        # idempotent sweep (SURVEY.md §5 failure recovery): reuse an
        # existing run dir and skip frames whose output is already there
        out_dir = ckpt.run_dir(cfg.train.test_path, cfg.infer.write_test)
        os.makedirs(out_dir, exist_ok=True)
    else:
        out_dir = ckpt.next_run_dir(cfg.train.test_path)
    pp = upscale = None
    if (cfg.infer.pipeline_split and gen2 is not None
            and len(jax.devices()) > 1):
        from mpgan_tpu.infer import pipeline
        spec = cfg.infer.pipeline_split
        split = (None if spec == "auto"
                 else [int(x) for x in spec.split(",")])
        pp = pipeline.InferencePipeline(
            gen1, params1, gen2, params2, cfg.data.up_res, split=split,
            chunk=cfg.infer.slice_chunk, gen3=gen3, params3=params3)
        print(f"pipeline-parallel inference: {pp.n_stages} stages, "
              f"split {pp.split}")
    else:
        upscale = make_default_upscaler(cfg, chain)

    def read_frame(sim, f):
        # shared reader (infer.load.read_lr_frame) = training-parity
        # channels: macRecenter'd velocity, derived vorticity
        from mpgan_tpu.infer.load import read_lr_frame
        sim_dir = os.path.join(cfg.data.base_path, f"sim_{sim:04d}")
        return read_lr_frame(cfg, sim_dir, f)

    def write_frame(out, hr):
        if cfg.infer.write_uni:
            uni.write_density(out, hr[..., 0])
        if cfg.infer.write_png:
            from PIL import Image

            from mpgan_tpu.utils.preview import norm_u8
            mid = hr[hr.shape[0] // 2, :, :, 0]
            png = out[:-4] + ".png"
            # atomic for the same reason as writeUni: frame_done keys on
            # this file when writeUni 0
            Image.fromarray(norm_u8(mid[::-1])).save(png + ".tmp", "PNG")
            os.replace(png + ".tmp", png)

    def frame_done(sim, f):
        # ALL requested artifacts must exist: a crash between the .uni and
        # .png writes must not make the restart skip the half-done frame
        base = os.path.join(out_dir, f"source_{sim:04d}_{f:04d}")
        want = ([base + ".uni"] if cfg.infer.write_uni else []) + \
               ([base + ".png"] if cfg.infer.write_png else [])
        return bool(want) and all(os.path.exists(w) for w in want)

    frames = [(sim, f)
              for sim in range(cfg.data.from_sim, cfg.data.to_sim + 1)
              for f in range(cfg.infer.frame_min, cfg.infer.frame_max)]
    if cfg.infer.write_test >= 0:
        todo = [sf for sf in frames if not frame_done(*sf)]
        if len(todo) < len(frames):
            print(f"writeTest {cfg.infer.write_test}: skipping "
                  f"{len(frames) - len(todo)} already-written frames")
        frames = todo
    with ThreadPoolExecutor(1) as reader, ThreadPoolExecutor(1) as writer:
        pending = []

        def flush(sim, f, hr, lr_shape):
            # fetch in the device dtype (bf16 models: half the tunnel bytes),
            # then widen on host — .uni files and PNG previews are f32 paths
            hr = np.asarray(hr).astype(np.float32, copy=False)
            out = os.path.join(out_dir, f"source_{sim:04d}_{f:04d}.uni")
            # Bound in-flight writes: each future retains a full HR volume
            # (~0.5 GB at 512^3), so if the gzip/PNG writer falls behind
            # device compute, host memory would grow without bound.
            while len(pending) >= 3:
                pending.pop(0).result()
            pending.append(writer.submit(write_frame, out, hr))
            touch_heartbeat()
            print(f"sim {sim} frame {f}: {lr_shape} -> {hr.shape[:3]} "
                  f"-> {out}")
            # Fault injection for elastic-recovery tests (mirrors the train
            # loop's hook): crash after the first frame is durably written.
            fail_once = os.environ.get("MPGAN_FAIL_ONCE")
            if fail_once and not os.path.exists(fail_once):
                pending[-1].result()
                with open(fail_once, "w") as fh:
                    fh.write(f"injected at sim {sim} frame {f}\n")
                raise RuntimeError(
                    f"MPGAN_FAIL_ONCE: injected fault after writing "
                    f"sim {sim} frame {f}")

        inflight = []  # pipeline mode: (sim, f, async volume, lr shape)
        nxt = reader.submit(read_frame, *frames[0]) if frames else None
        for i, (sim, f) in enumerate(frames):
            lr_np = nxt.result()
            if i + 1 < len(frames):
                nxt = reader.submit(read_frame, *frames[i + 1])
            if lr_np is None:
                continue
            if pp is not None:
                inflight.append((sim, f, pp.submit(lr_np), lr_np.shape[:3]))
                if len(inflight) > pp.n_stages:
                    flush(*inflight.pop(0))
            else:
                flush(sim, f, upscale(jnp.asarray(lr_np)), lr_np.shape[:3])
        for item in inflight:
            flush(*item)
        for p in pending:
            p.result()
    print(f"inference outputs in {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()

"""Script-level end-to-end CLI tests (subprocess, CPU backend): the
reference's documented entry points datagen → train → infer → eval
(SURVEY.md §2.1/§3.3, BASELINE configs)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # sitecustomize pre-imports jax, but JAX_PLATFORMS in the child env is
    # read at that import → CPU sticks for subprocesses
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + args.split(),
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    _run("datagen.py",
         f"basePath {d}/data/ fromSim 1000 toSim 1000 resHigh 32 upRes 4 "
         "frames 5 warmup 2 randSeed 1", str(d))
    return d


def test_datagen_cli(workdir):
    files = os.listdir(os.path.join(str(workdir), "data", "sim_1000"))
    assert len(files) == 20  # 5 frames × 4 files


def test_datagen_skip_existing(workdir):
    """skipExisting 1: a re-run over a complete sim skips it (restartable
    sweeps; atomic .uni writes make file-exists mean complete)."""
    d = str(workdir)
    sim_dir = os.path.join(d, "data", "sim_1000")
    before = {f: os.path.getmtime(os.path.join(sim_dir, f))
              for f in os.listdir(sim_dir)}
    out = _run("datagen.py",
               f"basePath {d}/data/ fromSim 1000 toSim 1000 resHigh 32 "
               "upRes 4 frames 5 warmup 2 randSeed 1 skipExisting 1", d)
    assert "sim_1000: complete (5 frames) — skipped" in out
    after = {f: os.path.getmtime(os.path.join(sim_dir, f))
             for f in os.listdir(sim_dir)}
    assert before == after  # nothing rewritten


@pytest.fixture(scope="module")
def trained_run(workdir):
    """Pass-1 training into workdir/runs/test_0000 (gen_0002 checkpoint);
    shared by the inference and eval CLI tests so each can run standalone."""
    d = str(workdir)
    out = _run("multipass_gan.py",
               f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
               "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 4 "
               "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 "
               f"firstNN 1 genFilters 8 discFilters 8 genBlocks 1 "
               f"dtype float32 testPath {d}/runs/ randSeed 3", d)
    return out


def test_train_and_infer_cli(workdir, trained_run):
    d = str(workdir)
    assert "done:" in trained_run
    run0 = os.path.join(d, "runs", "test_0000")
    assert os.path.exists(os.path.join(run0, "metrics.csv"))
    assert any(f.startswith("gen_") for f in os.listdir(run0))

    out = _run("multipass_gan.py",
               f"out 1 basePath {d}/data/ fromSim 1000 toSim 1000 upRes 4 "
               "tileSizeLow 6 useVelocities 1 load_model_test 0 "
               "load_model_no 2 outFrameMin 3 outFrameMax 5 genFilters 8 "
               f"genBlocks 1 dtype float32 testPath {d}/runs/", d)
    assert "inference outputs" in out
    out_dir = os.path.join(d, "runs", "test_0001")
    unis = [f for f in os.listdir(out_dir) if f.endswith(".uni")]
    assert len(unis) == 2
    from mpgan_tpu.io import uni
    _, vol = uni.readUni(os.path.join(out_dir, unis[0]))
    assert vol.shape == (32, 32, 32, 1)
    assert np.isfinite(vol).all()

    # useEma 1 against a run trained without emaDecay: _load_gen falls back
    # to the raw gen_ weights instead of failing on the missing gen_ema_
    out = _run("multipass_gan.py",
               f"out 1 basePath {d}/data/ fromSim 1000 toSim 1000 upRes 4 "
               "tileSizeLow 6 useVelocities 1 load_model_test 0 "
               "load_model_no 2 outFrameMin 3 outFrameMax 4 genFilters 8 "
               f"genBlocks 1 dtype float32 useEma 1 testPath {d}/runs/", d)
    assert "inference outputs" in out


def test_eval_cli(workdir, trained_run):
    d = str(workdir)
    out = _run("eval.py",
               f"basePath {d}/data/ fromSim 1000 toSim 1000 upRes 4 "
               "tileSizeLow 6 useVelocities 1 load_model_test 0 "
               "load_model_no 2 outFrameMin 3 outFrameMax 5 genFilters 8 "
               f"genBlocks 1 dtype float32 testPath {d}/runs/", d)
    res = json.loads(out.strip().splitlines()[-1])
    assert res["frames"] == 2
    assert 0 < res["psnr_mean"] < 100
    assert "trilinear_psnr_mean" in res
    assert 0 < res["ssim_mean"] <= 1.0
    assert 0 < res["trilinear_ssim_mean"] <= 1.0


def test_2d_pipeline_cli(tmp_path):
    """dataDim 2 end-to-end: 2D datagen → pass-1 training → inference keeps
    Z=1 and upsamples in-plane only (reference 2D mode)."""
    d = str(tmp_path)
    _run("datagen.py",
         f"basePath {d}/data/ fromSim 1000 toSim 1000 resHigh 32 upRes 4 "
         "frames 5 warmup 2 randSeed 1 dataDim 2", d)
    files = os.listdir(os.path.join(d, "data", "sim_1000"))
    assert len(files) == 20
    _run("multipass_gan.py",
         f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
         "dataDim 2 upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 "
         "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 firstNN 1 "
         f"genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
         f"testPath {d}/runs/ randSeed 3", d)
    out = _run("multipass_gan.py",
               f"out 1 basePath {d}/data/ fromSim 1000 toSim 1000 dataDim 2 "
               "upRes 4 tileSizeLow 6 useVelocities 1 load_model_test 0 "
               "load_model_no 0 outFrameMin 3 outFrameMax 5 genFilters 8 "
               f"genBlocks 1 dtype float32 testPath {d}/runs/", d)
    assert "inference outputs" in out
    out_dir = os.path.join(d, "runs", "test_0001")
    unis = sorted(f for f in os.listdir(out_dir) if f.endswith(".uni"))
    from mpgan_tpu.io import uni
    _, vol = uni.readUni(os.path.join(out_dir, unis[0]))
    assert vol.shape == (1, 32, 32, 1)  # Z stays 1; 8x8 → 32x32 in-plane
    assert np.isfinite(vol).all()


def test_retry_on_error_elastic_recovery(workdir, tmp_path):
    """retryOnError N (SURVEY.md §5 failure recovery): the supervising parent
    restarts a dead training child with resumeLatest 1. MPGAN_FAIL_ONCE
    injects a crash right after the first checkpoint, so the run dies at
    it=2 and must resume from test_0000/model_0001 to finish all 4 iters."""
    d = str(workdir)
    sentinel = str(tmp_path / "fail_once")
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_FAIL_ONCE=sentinel,
               MPGAN_RETRY_DELAY_S="0")
    # decoy: an unrelated OLD same-pass run under the same testPath —
    # recovery is scoped to this launch's run dirs and must never pick it
    # (an unscoped restart would try to restore this junk dir and crash)
    decoy = os.path.join(str(tmp_path), "runs", "test_0000", "model_0003")
    os.makedirs(decoy)
    with open(decoy + ".json", "w") as f:
        f.write('{"pass_no": 1, "it": 300, "total_iters": 301}')
    args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
            "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 4 "
            "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 "
            "firstNN 1 genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
            f"testPath {tmp_path}/runs/ randSeed 5 retryOnError 1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + args.split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert os.path.exists(sentinel)  # the fault really fired
    assert "injected fault" in r.stderr
    assert "retryOnError: training child died" in r.stdout
    # resumed its OWN run (test_0001; test_0000 is the out-of-scope decoy):
    # the child reported its run dir (MPGAN_RUN_FILE), so the retry pins it
    assert "resumeIndex 1: resuming model_0001" in r.stdout
    assert "done:" in r.stdout  # restarted child ran to completion
    # recovery finishes the ORIGINAL trainingIters budget (4 → last it=3),
    # unlike explicit resumeTest/No which trains trainingIters more
    assert "'it': 3" in r.stdout.split("done:")[-1]


def test_retry_on_error_hang_recovery(workdir, tmp_path):
    """hangTimeout S: the supervisor kills a child whose heartbeat file goes
    stale (the axon tunnel's observed failure mode is a hang, not a crash)
    and restarts it with resumeLatest 1. MPGAN_HANG_ONCE makes the child
    sleep forever right after its first checkpoint (it=2)."""
    d = str(workdir)
    sentinel = str(tmp_path / "hang_once")
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_HANG_ONCE=sentinel,
               MPGAN_RETRY_DELAY_S="0", MPGAN_STARTUP_GRACE_S="300")
    args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
            "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 4 "
            "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 "
            "firstNN 1 genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
            f"testPath {tmp_path}/runs/ randSeed 5 retryOnError 1 "
            "hangTimeout 5")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + args.split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert os.path.exists(sentinel)  # the hang really fired
    assert "MPGAN_HANG_ONCE: hanging" in r.stdout
    assert "; killing it" in r.stdout  # watchdog saw the stale heartbeat
    assert "retryOnError: training child died (rc=-9)" in r.stdout
    assert "resumeIndex 0: resuming model_0001" in r.stdout
    assert "'it': 3" in r.stdout.split("done:")[-1]
    # the heartbeat file is cleaned up on a clean finish
    assert not any(f.startswith(".heartbeat")
                   for f in os.listdir(str(tmp_path / "runs")))


def test_retry_on_error_inference_recovery(workdir, tmp_path):
    """retryOnError with out 1: the parent pins outputs to a writeTest run
    dir; a child killed after its first frame restarts and skips the
    already-written frame instead of recomputing the sweep."""
    d = str(workdir)
    _run("multipass_gan.py",
         f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
         "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 "
         "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 firstNN 1 "
         "genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
         f"testPath {tmp_path}/runs/ randSeed 7", d)
    sentinel = str(tmp_path / "fail_once")
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_FAIL_ONCE=sentinel,
               MPGAN_RETRY_DELAY_S="0")
    args = (f"out 1 basePath {d}/data/ fromSim 1000 toSim 1000 upRes 4 "
            "tileSizeLow 6 useVelocities 1 load_model_test 0 load_model_no 0 "
            "outFrameMin 0 outFrameMax 5 genFilters 8 genBlocks 1 "
            f"dtype float32 testPath {tmp_path}/runs/ retryOnError 1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + args.split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert os.path.exists(sentinel)  # the fault really fired
    assert "inference outputs pinned to test_0001" in r.stdout
    assert "retryOnError: inference child died" in r.stdout
    assert "skipping 1 already-written frames" in r.stdout
    out_dir = os.path.join(str(tmp_path), "runs", "test_0001")
    unis = sorted(f for f in os.listdir(out_dir) if f.endswith(".uni"))
    assert len(unis) == 5  # frame 0 from the dead child + 4 from recovery
    assert not any(f.endswith(".tmp") for f in os.listdir(out_dir))
    from mpgan_tpu.io import uni
    _, vol = uni.readUni(os.path.join(out_dir, unis[0]))
    assert vol.shape == (32, 32, 32, 1)
    assert np.isfinite(vol).all()


def test_resume_latest_fresh_start_reuses_dead_run_dir(workdir, tmp_path):
    """A crash BEFORE the first checkpoint must not shift run indices: a
    resumeLatest rerun that finds no checkpoint restarts from scratch INTO
    the newest same-pass run dir when it holds none (the dead run), instead
    of allocating the next index — multi-stage recipes pin 'pass 1 = test 0,
    pass 2 = test 1' for their eval steps."""
    d = str(workdir)
    tp = tmp_path / "runs"
    dead = tp / "test_0000"
    dead.mkdir(parents=True)
    (dead / "params.json").write_text(
        '{"argv": [], "config": {}, "pass_no": 1}')
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
            "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 "
            "batchSize 2 saveInterval 0 outputInterval 2 useTempoD 0 "
            "firstNN 1 genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
            f"testPath {tp}/ randSeed 5 resumeLatest 1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + args.split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "fresh start reusing test_0000" in r.stdout
    assert not (tp / "test_0001").exists()  # no new index allocated
    assert (dead / "model_0000").is_dir()  # trained into the dead dir
    # params.json was rewritten by the real run (records the pass)
    import json
    assert json.loads((dead / "params.json").read_text())["pass_no"] == 1


def test_resume_latest_completed_run_is_idempotent(workdir, tmp_path):
    """Re-running a COMPLETED stage with resumeLatest is a no-op: it resumes
    in the run's own dir, trains zero iterations, writes no duplicate
    checkpoint, and allocates no new run dir (recipe stages are rerunnable)."""
    d = str(workdir)
    tp = tmp_path / "runs"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
            "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 "
            "batchSize 2 saveInterval 0 outputInterval 2 useTempoD 0 "
            "firstNN 1 genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
            f"testPath {tp}/ randSeed 5 resumeLatest 1")
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "multipass_gan.py")] + args.split()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=d, env=env,
                       timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    before = sorted(os.listdir(tp / "test_0000"))
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=d, env=env,
                       timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "resumeLatest: test_0000/model_0000" in r.stdout
    assert "budget already complete (model_0000)" in r.stdout
    assert sorted(os.listdir(tp / "test_0000")) == before  # no new files
    assert not (tp / "test_0001").exists()


def test_resume_from_empty_run_clear_error(workdir, tmp_path):
    """resumeTest into a run dir with no checkpoints must exit with a clear
    message, not a NoneType format crash deep in orbax paths."""
    tp = tmp_path / "runs"
    (tp / "test_0005").mkdir(parents=True)  # run that died pre-first-save
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + (f"out 0 trainingIters 1 batchSize 4 basePath {workdir}/data/ "
           f"testPath {tp}/ fromSim 1000 toSim 1000 upRes 4 tileSizeLow 8 "
           "saveInterval 0 kAdv 0 kt 0 resumeTest 5").split(),
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert r.returncode != 0
    assert "no saved checkpoints" in (r.stdout + r.stderr)
    assert "NoneType" not in r.stderr


def test_retry_on_error_with_load_model_test(workdir, tmp_path):
    """Crash recovery of a pass-1 run STARTED FROM a checkpoint
    (load_model_test): the restart must resume the crashed continuation
    run's own progress, not be clobbered back to the original
    load_model_test target (which would discard everything since launch)."""
    d = str(workdir)
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_RETRY_DELAY_S="0")
    base_args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 "
                 "frameMax 5 upRes 4 tileSizeLow 6 useVelocities 1 "
                 "batchSize 2 saveInterval 2 outputInterval 2 useTempoD 0 "
                 "firstNN 1 genFilters 8 discFilters 8 genBlocks 1 "
                 f"dtype float32 testPath {tmp_path}/runs/ randSeed 6 ")
    # base run: test_0000, 2 iters
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + (base_args + "trainingIters 2").split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    # continuation from test_0000 with fault injection after its first
    # checkpoint; the supervisor must resume test_0001 (the continuation),
    # not restart from test_0000 again
    sentinel = str(tmp_path / "fail_once")
    env["MPGAN_FAIL_ONCE"] = sentinel
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + (base_args + "trainingIters 4 load_model_test 0 "
           "retryOnError 1").split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert os.path.exists(sentinel)
    assert "retryOnError: training child died" in r.stdout
    # the RESTARTED child resumed the continuation run, not the base run
    last_resume = r.stdout.rstrip().split("resumed from ")[-1]
    assert "test_0001/" in last_resume, r.stdout[-3000:]
    # and finished the continuation budget: start_it 2 + 4 iters -> last it 5
    assert "'it': 5" in r.stdout.split("done:")[-1], r.stdout[-2000:]


def test_retry_scopes_to_in_place_resumed_run(workdir, tmp_path):
    """Regression (observed 2026-08-20, duplicate 12k-iter trainings): when
    attempt 0 resumes an OLDER run dir in place (run-dir-stable recovery),
    a retry scoped only by next-free-index misses that dir and retrains
    from scratch into a fresh one. The child now reports its run dir
    (MPGAN_RUN_FILE) and retries pin to exactly that index."""
    d = str(workdir)
    tp = tmp_path / "runs"
    base_args = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 "
                 "frameMax 5 upRes 4 tileSizeLow 6 useVelocities 1 "
                 "trainingIters 8 batchSize 2 saveInterval 2 "
                 "outputInterval 2 useTempoD 0 firstNN 1 genFilters 8 "
                 "discFilters 8 genBlocks 1 dtype float32 "
                 f"testPath {tp}/ randSeed 5 ")
    # phase A: unsupervised run dies after model_0001 (it=2 of 8) → partial
    # test_0000
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_RETRY_DELAY_S="0",
               MPGAN_FAIL_ONCE=str(tmp_path / "s1"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + base_args.split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode != 0
    # phase B: supervised rerun; attempt 0 resumes test_0000 IN PLACE
    # (below the supervisor's next-free-index scope of 1), dies again at
    # the it=4 checkpoint; the retry must come back to test_0000
    env["MPGAN_FAIL_ONCE"] = str(tmp_path / "s2")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multipass_gan.py")]
        + (base_args + "resumeLatest 1 retryOnError 1").split(),
        capture_output=True, text=True, cwd=d, env=env, timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "resumeLatest: test_0000/model_0001" in r.stdout  # attempt 0
    assert "retryOnError: training child died" in r.stdout
    assert "resumeIndex 0: resuming model_0002" in r.stdout  # pinned retry
    assert not (tp / "test_0001").exists()  # no from-scratch duplicate
    assert "'it': 7" in r.stdout.split("done:")[-1]  # original budget done


def test_resume_index_pins_run_dir_in_multi_config_recipes(workdir, tmp_path):
    """resumeIndex k owns exactly test_k: two same-pass configs can share a
    testPath with stable indices (resumeLatest would resume the newest
    same-pass run — the wrong one), and reruns of a complete stage are
    cheap no-ops that exit before the dataset even loads."""
    d = str(workdir)
    tp = tmp_path / "runs"
    base = (f"out 0 basePath {d}/data/ fromSim 1000 toSim 1000 frameMax 5 "
            "upRes 4 tileSizeLow 6 useVelocities 1 trainingIters 2 "
            "batchSize 2 saveInterval 0 outputInterval 2 useTempoD 0 "
            "genFilters 8 discFilters 8 genBlocks 1 dtype float32 "
            f"testPath {tp}/ ")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(extra, ok=True):
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "multipass_gan.py")]
            + (base + extra).split(),
            capture_output=True, text=True, cwd=d, env=env, timeout=900)
        if ok:
            assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
        return r

    out = run("firstNN 1 randSeed 5 resumeIndex 0").stdout
    assert "fresh start in test_0000" in out
    # a SECOND pass-1 config pinned to index 1 must not touch test_0000
    out = run("firstNN 1 randSeed 6 resumeIndex 1").stdout
    assert "fresh start in test_0001" in out
    before0 = sorted(os.listdir(tp / "test_0000"))
    # rerunning the complete stage 0 no-ops — even though test_0001 is a
    # NEWER same-pass run (resumeLatest would have picked it)
    out = run("firstNN 1 randSeed 5 resumeIndex 0").stdout
    assert "resumeIndex 0: budget complete" in out
    assert "nothing to do" in out
    assert sorted(os.listdir(tp / "test_0000")) == before0
    assert not (tp / "test_0002").exists()
    # pinning the wrong pass at an index is a hard error, not a silent
    # new run dir
    r = run("firstNN 0 randSeed 5 resumeIndex 0 pass2Source g1 "
            "load_model_test 0 load_model_no -1", ok=False)
    assert r.returncode != 0
    assert "holds checkpoints of another pass" in (r.stdout + r.stderr)


def test_datagen_retry_on_error_recovery(tmp_path):
    """datagen retryOnError (r4): the jax-free supervising parent restarts a
    dead datagen child; retries force skipExisting 1 so completed sims are
    skipped and the interrupted one is regenerated (atomic .uni writes).
    MPGAN_FAIL_ONCE kills the child after its first written frame."""
    sentinel = str(tmp_path / "fail_once")
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPGAN_FAIL_ONCE=sentinel,
               MPGAN_RETRY_DELAY_S="0")
    args = (f"basePath {tmp_path}/data/ fromSim 1000 toSim 1001 resHigh 32 "
            "upRes 4 frames 3 warmup 1 randSeed 1 retryOnError 2")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "datagen.py")]
        + args.split(),
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=900)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert os.path.exists(sentinel)  # the fault really fired
    assert "injected fault" in r.stdout
    assert "retryOnError: child died" in r.stdout
    assert "skipped" not in r.stdout.split("injected fault")[0]
    for sim in (1000, 1001):
        files = os.listdir(os.path.join(str(tmp_path), "data", f"sim_{sim:04d}"))
        assert len(files) == 12, (sim, sorted(files))  # 3 frames x 4 files

"""Train-loop tests: losses decrease L1, steps run for both passes, temporal
path, progressive growing transitions, multi-device DP (SURVEY.md §4(4)/(5))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpgan_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from mpgan_tpu.data.loader import FluidDataset
from mpgan_tpu.data.pipeline import TileCreator
from mpgan_tpu.parallel import mesh as pmesh
from mpgan_tpu.train import losses
from mpgan_tpu.train.loop import Trainer


def _dataset(s=2, seed=0):
    rng = np.random.default_rng(seed)
    n_sims, n_frames, z, y, x = 1, 4, 12, 20, 20
    lr = rng.random((n_sims * n_frames, z, y, x, 4), dtype=np.float32)
    hr = rng.random((n_sims * n_frames, z * s, y * s, x * s, 1), dtype=np.float32)
    return FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames, up_res=s)


def _config(stages=1, temporal=False, growing=False, batch=4, tile=8):
    return Config(
        data=DataConfig(tile_size_low=tile, up_res=2 ** stages),
        model=ModelConfig(n_base_filters=8, n_res_blocks=1,
                          disc_base_filters=8, stages=stages, dtype="float32"),
        loss=LossConfig(),
        train=TrainConfig(batch_size=batch, use_temporal_disc=temporal,
                          use_growing=growing, alpha_iters=2, stable_iters=2,
                          training_iters=4, output_interval=2,
                          save_interval=0),
    )


# ----------------------------------------------------------------- losses

@pytest.mark.quick
def test_bce_logits_matches_reference_values():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    got = float(losses.bce_logits(logits, 1.0))
    want = float(np.mean(np.log(1 + np.exp(-np.asarray([0.0, 2.0, -2.0])))))
    assert abs(got - want) < 1e-5


@pytest.mark.quick
def test_align_triplet_static_scene_is_constant():
    """Zero velocity: aligned triplet = raw stack."""
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    vel = jnp.zeros((2, 16, 16, 2))
    out = losses.align_triplet(f, f, f, vel)
    assert out.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(f[..., 0]),
                               atol=1e-6)


@pytest.mark.quick
def test_align_triplet_compensates_translation():
    """A scene translating with uniform velocity must align to ~identical
    channels after warping (interior pixels)."""
    rng = np.random.default_rng(1)
    base = rng.random((24, 24), dtype=np.float32)
    # frame t-1 is base shifted by -v, t is base, t+1 is base shifted by +v
    v = (3.0, 1.0)  # (vx=w, vy=h) pixels/frame
    prev = np.roll(base, (-1, -3), axis=(0, 1))
    nxt = np.roll(base, (1, 3), axis=(0, 1))
    vel = np.zeros((1, 24, 24, 2), np.float32)
    vel[..., 0], vel[..., 1] = v[0], v[1]
    out = np.asarray(losses.align_triplet(
        jnp.asarray(prev[None, :, :, None]), jnp.asarray(base[None, :, :, None]),
        jnp.asarray(nxt[None, :, :, None]), jnp.asarray(vel)))
    inner = np.s_[0, 6:-6, 6:-6]
    np.testing.assert_allclose(out[inner + (0,)], out[inner + (1,)], atol=1e-3)
    np.testing.assert_allclose(out[inner + (2,)], out[inner + (1,)], atol=1e-3)


# -------------------------------------------------------------- train steps

def test_pass1_training_decreases_l1():
    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=30, log_every=1)
    first = tr.metrics_log[0]
    assert np.isfinite(out["g_loss"]) and np.isfinite(out["d_loss"])
    assert out["l1"] < first["l1"], (first["l1"], out["l1"])


def test_pass2_training_runs():
    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc, pass_no=2)
    out = tr.fit(iters=3, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_temporal_training_runs():
    ds = _dataset()
    cfg = _config(stages=1, temporal=True)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=3, log_every=1)
    assert np.isfinite(out["dt_loss"]) and out["dt_loss"] > 0
    assert np.isfinite(out["g_t"])


def test_progressive_growing_transitions():
    ds = _dataset(s=4)
    cfg = _config(stages=2, growing=True)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=8, log_every=1)
    stages_seen = {m["stage"] for m in tr.metrics_log}
    assert stages_seen == {1, 2}, stages_seen
    alphas = [m["alpha"] for m in tr.metrics_log if m["stage"] == 2]
    assert min(alphas) < 1.0 and max(alphas) == 1.0
    assert np.isfinite(out["g_loss"])


def test_make_mesh_raises_on_too_few_devices():
    """Requesting more devices than exist must fail loudly, not silently
    truncate to a smaller mesh (VERDICT r1 weak #2)."""
    with pytest.raises(RuntimeError, match="requested 16 devices but only"):
        pmesh.make_mesh(16)


def test_dp_training_on_8_device_mesh():
    ds = _dataset()
    cfg = _config(stages=1, batch=8)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    tr = Trainer(cfg, tc, mesh=mesh)
    out = tr.fit(iters=3, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_dp_matches_single_device():
    """Same seed: 8-device DP and single-device training agree (determinism
    of the sharded program up to reduction order)."""
    ds = _dataset()
    cfg = _config(stages=1, batch=8)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr1 = Trainer(cfg, tc)
    o1 = tr1.fit(iters=3, log_every=1)
    tr8 = Trainer(cfg, tc, mesh=pmesh.make_mesh())
    o8 = tr8.fit(iters=3, log_every=1)
    assert abs(o1["l1"] - o8["l1"]) < 1e-3, (o1["l1"], o8["l1"])


def _dataset_8sims(n_frames=3, zyx=(8, 12, 12), s=2, constant_density=False):
    rng = np.random.default_rng(7)
    n_sims = 8
    z, y, x = zyx
    lr = rng.random((n_sims * n_frames, z, y, x, 4), dtype=np.float32)
    if constant_density:
        for i in range(n_sims):  # density identifies the source sim
            lr[i * n_frames:(i + 1) * n_frames, ..., 0] = (i + 1) / 10.0
    hr = rng.random((n_sims * n_frames, z * s, y * s, x * s, 1),
                    dtype=np.float32)
    return FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames,
                        up_res=s)


def test_sharded_residency_and_sampling_locality():
    """shard_over must place 1/8 of the volumes per device, and the sharded
    sampler must draw each device's batch share ONLY from its local sims
    (VERDICT r1 #5). Constant per-sim density makes provenance checkable."""
    from mpgan_tpu.train.loop import make_sampler
    ds = _dataset_8sims(constant_density=True)
    tc = TileCreator(ds, tile_lr=6, density_threshold=0.0, augment=False)
    mesh = pmesh.make_mesh()
    assert tc.shard_over(mesh) and tc.n_shards == 8
    for arr in (tc.lr, tc.hrz, tc.hr):
        sizes = {sh.data.shape[0] for sh in arr.addressable_shards}
        assert sizes == {arr.shape[0] // 8}, sizes
    assert tc.st_local.n_vols == 3

    sample = make_sampler(tc, pass_no=1, batch_size=16, temporal=False,
                          mesh=mesh, data_sharded=True)
    data = dict(lr=tc.lr, hrz=tc.hrz, didx=tc._idx(False))
    b = sample(data, jax.random.PRNGKey(0))
    vals = np.asarray(b["lr"][..., 0]).reshape(8, 2, -1)  # (dev, local, px)
    for d in range(8):
        np.testing.assert_allclose(vals[d], (d + 1) / 10.0, atol=1e-6,
                                   err_msg=f"device {d} sampled foreign sims")
    # determinism: same key → same batch
    b2 = sample(data, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(b["lr"]), np.asarray(b2["lr"]))


def test_indivisible_batch_falls_back_to_replicated():
    """batchSize not divisible by the device count must fall back to
    replicated residency and train (not abort in make_sampler)."""
    cfg = _config(stages=1, batch=12)  # 12 % 8 != 0
    tc = TileCreator(_dataset_8sims(zyx=(12, 16, 16)), tile_lr=8,
                     density_threshold=0.0)
    tr = Trainer(cfg, tc, mesh=pmesh.make_mesh())
    assert not tr.data_sharded
    out = tr.fit(iters=2, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_sharded_vs_replicated_training():
    """Sharded-residency training must behave like replicated-residency
    training on the same data (same config/seed; batches differ only in
    which RNG stream picked them, so losses agree to batch noise)."""
    import dataclasses
    cfg = _config(stages=1, batch=8)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_temporal_disc=True))
    mesh = pmesh.make_mesh()

    mk = lambda: TileCreator(_dataset_8sims(zyx=(12, 16, 16)), tile_lr=8,
                             density_threshold=0.0)
    tr_s = Trainer(cfg, mk(), mesh=mesh)
    assert tr_s.data_sharded
    o_s = tr_s.fit(iters=3, log_every=1)

    tr_r = Trainer(cfg, mk(), mesh=mesh, shard_data=False)
    assert not tr_r.data_sharded
    o_r = tr_r.fit(iters=3, log_every=1)

    assert np.isfinite(o_s["g_loss"]) and np.isfinite(o_r["g_loss"])
    assert 0.5 < o_s["l1"] / o_r["l1"] < 2.0, (o_s["l1"], o_r["l1"])


def test_growing_on_mesh_matches_single_device():
    """Progressive growing across a stage boundary under the 8-device mesh
    (VERDICT r2 missing #2): param migration + re-replication + EMA migration
    on sharded state and the fade→stable program flip must produce the same
    training trajectory as the single-device run (1-sim dataset → replicated
    residency → identical batches for the same seed)."""
    import dataclasses
    ds = _dataset(s=4)
    cfg = _config(stages=2, growing=True, batch=8)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
    mk = lambda: TileCreator(ds, tile_lr=8, density_threshold=0.0,
                             augment=False)
    tr1 = Trainer(cfg, mk())
    o1 = tr1.fit(iters=8, log_every=1)
    tr8 = Trainer(cfg, mk(), mesh=pmesh.make_mesh())
    o8 = tr8.fit(iters=8, log_every=1)
    # both runs crossed the boundary (alpha_iters=2 + stable_iters=2 → stage
    # 2 from it=4) and saw fade (α<1) and stable (α=1) programs at stage 2
    for tr in (tr1, tr8):
        assert {m["stage"] for m in tr.metrics_log} == {1, 2}
        alphas = [m["alpha"] for m in tr.metrics_log if m["stage"] == 2]
        assert min(alphas) < 1.0 and max(alphas) == 1.0
    assert abs(o1["l1"] - o8["l1"]) < 1e-3, (o1["l1"], o8["l1"])
    # EMA migrated across the boundary identically on both runs
    e1 = np.asarray(tr1.rt.ema["params"]["stem"]["kernel"])
    e8 = np.asarray(tr8.rt.ema["params"]["stem"]["kernel"])
    np.testing.assert_allclose(e1, e8, atol=1e-5)


def test_growing_with_sharded_residency_and_temporal():
    """The flagship config shape (growing + temporal D + EMA + sharded
    dataset residency) must cross a stage boundary on the 8-device mesh with
    finite losses and residency still sharded afterwards."""
    import dataclasses
    ds = _dataset_8sims(zyx=(8, 12, 12), s=4)
    cfg = _config(stages=2, growing=True, batch=8)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       use_temporal_disc=True))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc, mesh=pmesh.make_mesh())
    assert tr.data_sharded
    out = tr.fit(iters=6, log_every=1)
    assert {m["stage"] for m in tr.metrics_log} == {1, 2}
    assert np.isfinite(out["g_loss"]) and np.isfinite(out["dt_loss"])
    # stage-2 state is still mesh-wide after the boundary rebuild
    dev_sets = {frozenset(d.id for d in leaf.sharding.device_set)
                for leaf in jax.tree.leaves(tr.rt.state.params_g)}
    assert dev_sets == {frozenset(range(8))}, dev_sets


def test_resume_from_checkpoint(tmp_path):
    """Save mid-training, restore into a fresh Trainer, continue: the resumed
    state carries params + step exactly (SURVEY.md §5 checkpoint/resume)."""
    from mpgan_tpu.train import checkpoint as ckpt

    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    tr.fit(iters=4, log_every=1)
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save(run, 0, tr.rt.state, dict(it=4, stage=1, pass_no=1))

    tr2 = Trainer(cfg, tc)
    start = tr2.restore(run, 0)
    assert start == 4
    assert int(tr2.rt.state.step) == int(tr.rt.state.step)
    w1 = np.asarray(tr.rt.state.params_g["params"]["stem"]["kernel"])
    w2 = np.asarray(tr2.rt.state.params_g["params"]["stem"]["kernel"])
    np.testing.assert_array_equal(w1, w2)
    out = tr2.fit(iters=6, start_it=start, log_every=1)
    assert np.isfinite(out["g_loss"])
    assert int(tr2.rt.state.step) == 6


def test_latest_resumable_picks_newest_same_pass(tmp_path):
    """resumeLatest semantics: newest run with a checkpoint of the requested
    pass wins; runs of another pass or without checkpoints are skipped."""
    import json
    import os
    from mpgan_tpu.train import checkpoint as ckpt

    assert ckpt.latest_resumable(str(tmp_path)) is None
    for idx, (nos, pass_no) in enumerate([([0, 2], 1), ([1], 2), ([], 1)]):
        run = ckpt.next_run_dir(str(tmp_path))
        for no in nos:
            os.makedirs(ckpt.model_dir(run, no))
            with open(ckpt.model_dir(run, no) + ".json", "w") as f:
                json.dump({"pass_no": pass_no, "it": no * 100}, f)
    # newest run (2) is empty; run 1 is pass-2; run 0 has pass-1 model 2
    assert ckpt.latest_resumable(str(tmp_path), pass_no=1) == (0, 2)
    assert ckpt.latest_resumable(str(tmp_path), pass_no=2) == (1, 1)
    # without a pass filter the newest checkpointed run wins
    assert ckpt.latest_resumable(str(tmp_path)) == (1, 1)


def test_latest_resumable_min_index_scopes_recovery(tmp_path):
    """min_index (set by the retryOnError supervisor as MPGAN_RESUME_MIN)
    restricts the scan to run dirs this launch created: an unrelated older
    run under the same testPath must never hijack crash recovery."""
    import json
    import os
    from mpgan_tpu.train import checkpoint as ckpt

    for nos in ([0, 5], [1]):  # test_0000 (old run), test_0001 (this launch)
        run = ckpt.next_run_dir(str(tmp_path))
        for no in nos:
            os.makedirs(ckpt.model_dir(run, no))
            with open(ckpt.model_dir(run, no) + ".json", "w") as f:
                json.dump({"pass_no": 1, "it": no * 100}, f)
    assert ckpt.latest_resumable(str(tmp_path), pass_no=1) == (1, 1)
    assert ckpt.latest_resumable(str(tmp_path), pass_no=1,
                                 min_index=1) == (1, 1)
    # only the old run has checkpoints in scope → recovery finds nothing
    # (fresh start) rather than resuming the unrelated run
    assert ckpt.latest_resumable(str(tmp_path), pass_no=1,
                                 min_index=2) is None


def test_latest_resumable_skips_sidecarless_when_pass_requested(tmp_path):
    """A checkpoint without a .json sidecar has an unknown pass: with a
    pass filter it must be skipped (older models in the run are scanned),
    never guessed — a wrong-pass restore crashes on param shapes."""
    import json
    import os
    from mpgan_tpu.train import checkpoint as ckpt

    run = ckpt.next_run_dir(str(tmp_path))
    os.makedirs(ckpt.model_dir(run, 0))
    with open(ckpt.model_dir(run, 0) + ".json", "w") as f:
        json.dump({"pass_no": 1, "it": 100}, f)
    os.makedirs(ckpt.model_dir(run, 1))  # newest, but sidecar-less
    assert ckpt.latest_resumable(str(tmp_path), pass_no=1) == (0, 0)
    assert ckpt.latest_resumable(str(tmp_path), pass_no=2) is None
    # without a filter the newest checkpoint is still fine
    assert ckpt.latest_resumable(str(tmp_path)) == (0, 1)


def test_recover_run_dir_reuses_only_newest_dead_same_pass(tmp_path):
    """Crash-recovery FRESH starts (resumeLatest found nothing) reuse the
    newest run dir iff it is the same-pass dead run (params.json pass_no,
    zero checkpoints) — keeping recipe-pinned run indices stable — and
    never resurrect older or mismatched dirs."""
    import json
    import os
    from mpgan_tpu.train import checkpoint as ckpt

    assert ckpt.recover_run_dir(str(tmp_path), 1) is None  # no base dir
    run0 = ckpt.next_run_dir(str(tmp_path))  # dead pass-1 run
    with open(os.path.join(run0, "params.json"), "w") as f:
        json.dump({"argv": [], "config": {}, "pass_no": 1}, f)
    assert ckpt.recover_run_dir(str(tmp_path), 1) == run0
    assert ckpt.recover_run_dir(str(tmp_path), 2) is None  # pass mismatch
    # min_index scoping (the retryOnError supervisor's contract)
    assert ckpt.recover_run_dir(str(tmp_path), 1, min_index=1) is None
    # a newer non-matching dir shadows it: only the NEWEST is considered
    run1 = ckpt.next_run_dir(str(tmp_path))
    with open(os.path.join(run1, "params.json"), "w") as f:
        json.dump({"argv": [], "config": {}, "pass_no": 2}, f)
    assert ckpt.recover_run_dir(str(tmp_path), 1) is None
    assert ckpt.recover_run_dir(str(tmp_path), 2) == run1
    # any checkpoint in the dir disqualifies it (not a pre-first-save death)
    os.makedirs(ckpt.model_dir(run1, 0))
    assert ckpt.recover_run_dir(str(tmp_path), 2) is None
    # gen-only dirs (e.g. a TF1 import) must not be hijacked either
    run2 = ckpt.next_run_dir(str(tmp_path))
    with open(os.path.join(run2, "params.json"), "w") as f:
        json.dump({"argv": [], "config": {}, "pass_no": 1}, f)
    os.makedirs(os.path.join(run2, "gen_0000"))
    assert ckpt.recover_run_dir(str(tmp_path), 1) is None
    # pre-pass_no params.json (older runs): unknown pass, never reused
    run3 = ckpt.next_run_dir(str(tmp_path))
    with open(os.path.join(run3, "params.json"), "w") as f:
        json.dump({"argv": [], "config": {}}, f)
    assert ckpt.recover_run_dir(str(tmp_path), 1) is None


def test_checkpoint_save_overwrites_existing_dir(tmp_path):
    """In-place recovery can re-save a model/gen number whose dir was left
    by a kill after the orbax write but before the sidecar (latest_resumable
    skipped it) — save must overwrite, not raise on the existing path."""
    from mpgan_tpu.train import checkpoint as ckpt

    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    tr.fit(iters=1, log_every=1)
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save(run, 0, tr.rt.state, dict(it=1, stage=1, pass_no=1))
    ckpt.save_gen(run, 0, tr.rt.state.params_g)
    tr.fit(iters=3, start_it=1, log_every=1)
    ckpt.save(run, 0, tr.rt.state, dict(it=3, stage=1, pass_no=1))  # no raise
    ckpt.save_gen(run, 0, tr.rt.state.params_g)
    tr2 = Trainer(cfg, tc)
    assert tr2.restore(run, 0) == 3  # the NEWER state won
    w1 = np.asarray(tr.rt.state.params_g["params"]["stem"]["kernel"])
    w2 = np.asarray(tr2.rt.state.params_g["params"]["stem"]["kernel"])
    np.testing.assert_array_equal(w1, w2)


@pytest.mark.quick
def test_label_smooth_rejected_outside_sce_lsgan():
    r, f = jnp.asarray([1.0]), jnp.asarray([-1.0])
    for mode in ("hinge", "wgan"):
        with pytest.raises(ValueError, match="labelSmooth"):
            losses.d_loss(r, f, 0.1, mode=mode)


@pytest.mark.quick
def test_pick_dispatch_k():
    from mpgan_tpu.train.loop import pick_dispatch_k
    # in-process backend (tiny RPC): stay at 1 for determinism
    assert pick_dispatch_k(t_total_s=5e-3, t_pair_s=1e-4) == 1
    # remote tunnel (axon-like 66 ms no-op pair), light step: take the cap —
    # the real step's dispatch overhead is several-fold the no-op pair
    # (measured K=8 → 18.5 steps/s vs K=64 → 34 steps/s, same config)
    assert pick_dispatch_k(t_total_s=0.094, t_pair_s=0.066) == 64
    assert pick_dispatch_k(t_total_s=0.067, t_pair_s=0.066, cap=8) == 8
    # mid-latency step (2 s compute vs 0.528 s pessimistic dispatch): the
    # measurements are USED — smallest K whose overhead fraction meets the
    # 10% target: v(1-f)/(f·t_step) = 0.528·0.9/(0.1·2.0) → K=3, where
    # K=2 would be 0.528/4.528 = 11.7% > 10% and K=3 is 8.1%
    assert pick_dispatch_k(t_total_s=2.066, t_pair_s=0.066) == 3
    # a single step slow enough to amortize even a pessimistic dispatch
    # cost on its own → keep K=1 (finer log/checkpoint granularity)
    assert pick_dispatch_k(t_total_s=10.0, t_pair_s=0.066) == 1
    # monotone: slower steps never get a LARGER chunk
    ks = [pick_dispatch_k(t_total_s=0.066 + t, t_pair_s=0.066)
          for t in (0.01, 0.1, 0.5, 1.0, 2.0, 5.0, 10.0)]
    assert ks == sorted(ks, reverse=True), ks


def test_auto_dispatch_runs_and_reports_k():
    """stepsPerDispatch 0 (the default) calibrates at startup; on the CPU
    test backend the round trip is in-process so it must settle at K=1."""
    ds = _dataset()
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    out = Trainer(_config(stages=1), tc).fit(iters=6, log_every=3)
    assert out["steps_per_dispatch"] == 1
    assert np.isfinite(out["g_loss"])


def test_steps_per_dispatch_equivalence():
    """K-per-dispatch scan training must behave like single-step (same seed,
    same chunk boundaries at log points)."""
    ds = _dataset()
    import dataclasses
    cfg1 = _config(stages=1)
    cfg8 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, steps_per_dispatch=8))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    o1 = Trainer(cfg1, tc).fit(iters=8, log_every=8)
    o8 = Trainer(cfg8, tc).fit(iters=8, log_every=8)
    assert np.isfinite(o8["g_loss"])
    # same final iteration count
    assert o1["it"] == o8["it"] == 7


def test_preview_and_metrics_writer(tmp_path):
    from mpgan_tpu.utils import preview
    import os
    cols = [np.random.rand(4, 8, 8, 1).astype(np.float32),
            np.random.rand(4, 16, 16, 1).astype(np.float32)]
    p = str(tmp_path / "grid.png")
    preview.save_patch_grid(p, cols)
    assert os.path.exists(p)
    w = preview.MetricsWriter(str(tmp_path))
    w.write({"it": 0, "g_loss": 1.5})
    w.write({"it": 1, "g_loss": 1.2})
    lines = open(str(tmp_path / "metrics.csv")).read().strip().split("\n")
    assert len(lines) == 3 and "g_loss" in lines[0]


def test_metrics_writer_tensorboard_events(tmp_path):
    """Scalars are mirrored to readable TensorBoard event files (reference
    tf.summary parity); 'it' becomes the TB step and is not its own tag."""
    pytest.importorskip("tensorboard")
    from mpgan_tpu.utils import preview
    w = preview.MetricsWriter(str(tmp_path))
    if w._tb is None:
        pytest.skip("tensorboard writer unavailable")
    w.write({"it": 5, "g_loss": 1.5, "stage": 2})
    w.write({"it": 10, "g_loss": 1.0, "stage": 2})
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(str(tmp_path / "tb"))
    ea.Reload()
    assert set(ea.Tags()["scalars"]) == {"g_loss", "stage"}
    assert [(s.step, s.value) for s in ea.Scalars("g_loss")] == \
        [(5, 1.5), (10, 1.0)]


def test_2d_data_training_runs():
    """dataDim 2 path: Z=1 volumes train pass-1 end-to-end."""
    rng = np.random.default_rng(3)
    s = 2
    lr = rng.random((4, 1, 24, 24, 4), dtype=np.float32)
    hr = rng.random((4, 1, 48, 48, 1), dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=1, n_frames=4, up_res=s)
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    assert tc.up_res == 2
    out = Trainer(cfg, tc).fit(iters=3, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_vorticity_conditioned_training_runs():
    """useVorticities: 7-channel inputs train end-to-end."""
    from mpgan_tpu.data.loader import vorticity
    rng = np.random.default_rng(5)
    s = 2
    vel = rng.standard_normal((4, 12, 20, 20, 3)).astype(np.float32)
    dens = rng.random((4, 12, 20, 20, 1), dtype=np.float32)
    vort = np.stack([vorticity(vel[i]) for i in range(4)])
    lr = np.concatenate([dens, vel, vort], axis=-1)
    hr = rng.random((4, 12 * s, 40, 40, 1), dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=1, n_frames=4, up_res=s)
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0)
    out = Trainer(cfg, tc).fit(iters=2, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_8x_growing_full_schedule():
    """BASELINE config 5 skeleton: 8x (3 stages) progressive training walks
    stage 1->2->3 with fades and stays finite."""
    ds = _dataset(s=8)
    cfg = _config(stages=3, growing=True, batch=2, tile=6)
    tc = TileCreator(ds, tile_lr=6, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=12, log_every=1)
    stages_seen = {m["stage"] for m in tr.metrics_log}
    assert stages_seen == {1, 2, 3}, stages_seen
    assert np.isfinite(out["g_loss"])


def test_pass3_training_runs():
    """Optional third pass (yz refinement, SURVEY 2.7): constant-res patches
    train end-to-end; also with temporal triplets."""
    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    out = Trainer(cfg, tc, pass_no=3).fit(iters=3, log_every=1)
    assert np.isfinite(out["g_loss"])


def test_pass3_temporal_training_runs():
    ds = _dataset()
    cfg = _config(stages=1, temporal=True)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    out = Trainer(cfg, tc, pass_no=3).fit(iters=2, log_every=1)
    assert np.isfinite(out["dt_loss"])


def test_label_smoothing_changes_d_loss():
    logits_r = jnp.asarray([3.0, 2.0])
    logits_f = jnp.asarray([-3.0, -2.0])
    plain = float(losses.d_loss(logits_r, logits_f))
    smooth = float(losses.d_loss(logits_r, logits_f, 0.1))
    assert smooth > plain  # confident D is penalized under smoothing


def test_temporal_without_velocities_rejected():
    rng = np.random.default_rng(9)
    lr = rng.random((4, 12, 20, 20, 1), dtype=np.float32)  # density only
    hr = rng.random((4, 24, 40, 40, 1), dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=1, n_frames=4, up_res=2)
    cfg = _config(stages=1, temporal=True)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0)
    with pytest.raises(ValueError, match="useTempoD"):
        Trainer(cfg, tc).fit(iters=1)


def test_disc_and_gen_runs_ratio():
    """discRuns/genRuns control the update alternation (reference §2.11)."""
    import dataclasses
    ds = _dataset()
    cfg = _config(stages=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, disc_runs=2, gen_runs=2))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    out = Trainer(cfg, tc).fit(iters=2, log_every=1)
    assert np.isfinite(out["g_loss"])


# ------------------------------------------------- GAN loss modes (§2.8 note)

@pytest.mark.quick
def test_gan_loss_mode_values():
    """lsgan/hinge/wgan against hand-computed values on fixed logits."""
    r = jnp.asarray([2.0, 0.0])
    f = jnp.asarray([-1.0, 1.0])
    # LSGAN: 0.5*(mean((r-1)^2) + mean(f^2)) = 0.5*((1+1)/2 + (1+1)/2) = 1.0
    assert abs(float(losses.d_loss(r, f, mode="lsgan")) - 1.0) < 1e-6
    # LSGAN G: 0.5*mean((f-1)^2) = 0.5*(4+0)/2 = 1.0
    assert abs(float(losses.g_adv_loss(f, mode="lsgan")) - 1.0) < 1e-6
    # hinge: mean(relu(1-r)) + mean(relu(1+f)) = (0+1)/2 + (0+2)/2 = 1.5
    assert abs(float(losses.d_loss(r, f, mode="hinge")) - 1.5) < 1e-6
    # wgan: mean(f) - mean(r) = 0 - 1 = -1
    assert abs(float(losses.d_loss(r, f, mode="wgan")) + 1.0) < 1e-6
    assert abs(float(losses.g_adv_loss(f, mode="wgan")) - 0.0) < 1e-6
    with pytest.raises(ValueError, match="ganLoss"):
        losses.d_loss(r, f, mode="nope")


@pytest.mark.quick
def test_r1_penalty_linear_disc_analytic():
    """For D(x) = <c, x>, grad_x D = c so the penalty is sum(c^2) exactly."""
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.normal(size=(6, 6, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 2)).astype(np.float32))
    got = float(losses.r1_penalty(
        lambda xi: jnp.sum(xi * c, axis=(1, 2, 3)), x))
    assert abs(got - float(jnp.sum(c ** 2))) < 1e-4


@pytest.mark.quick
def test_gradient_penalty_unit_gradient_is_zero():
    """A critic with unit input-gradient norm incurs zero WGAN-GP."""
    rng = np.random.default_rng(4)
    real = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    gp = float(losses.gradient_penalty(
        lambda xi: xi[:, 0, 0, 0], real, fake, jax.random.PRNGKey(0)))
    assert gp < 1e-8
    # and a zero critic has grad-norm 0 → penalty (0-1)^2 = 1
    gp0 = float(losses.gradient_penalty(
        lambda xi: jnp.zeros(xi.shape[0]), real, fake, jax.random.PRNGKey(0)))
    assert abs(gp0 - 1.0) < 1e-5  # sqrt(eps)=1e-6 shifts the norm slightly


@pytest.mark.parametrize("mode,r1,gp", [
    ("lsgan", 0.0, 0.0),
    ("hinge", 0.0, 0.0),
    ("wgan", 0.0, 10.0),
    ("sce", 10.0, 0.0),
])
def test_training_runs_all_gan_modes(mode, r1, gp):
    """Every ganLoss mode (incl. R1 / WGAN-GP regularized) trains finite,
    temporal disc on (both Ds and Dt paths exercise the penalty)."""
    import dataclasses
    ds = _dataset()
    cfg = _config(stages=1, temporal=True)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, gan_loss=mode,
                                      r1_gamma=r1, gp_weight=gp))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    out = Trainer(cfg, tc).fit(iters=2, log_every=1)
    for k in ("d_loss", "dt_loss", "g_loss", "l1"):
        assert np.isfinite(out[k]), (mode, k, out)


def test_ttur_lrdisc_sets_disc_lr():
    """lrdisc (TTUR) drives the D optimizer: Adam's first-step update
    magnitude equals the learning rate."""
    import dataclasses
    from mpgan_tpu.train.loop import _make_opt
    cfg = _config(stages=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=1e-4,
                                       lr_disc=4e-4))
    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,))}
    for disc, want in ((False, 1e-4), (True, 4e-4)):
        opt = _make_opt(cfg, disc=disc)
        upd, _ = opt.update(g, opt.init(p), p)
        got = float(jnp.abs(upd["w"][0]))
        assert abs(got - want) / want < 1e-3, (disc, got, want)


# ------------------------------------------------ EMA + lazy R1 (round 2)

def test_ema_tracks_generator_exactly():
    """emaDecay: after each G update, ema = d*ema + (1-d)*params, starting
    at the init params (ProGAN-family eval-weights practice)."""
    import dataclasses
    ds = _dataset()
    cfg = _config(stages=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.5))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    tr.rt = tr._init_stage(1, jax.random.PRNGKey(cfg.train.rand_seed), None)
    leaf = lambda t: np.asarray(t["params"]["stem"]["kernel"])
    p0 = leaf(tr.rt.state.params_g)
    np.testing.assert_array_equal(leaf(tr.rt.ema), p0)

    tr.fit(iters=1, log_every=1)
    p1, e1 = leaf(tr.rt.state.params_g), leaf(tr.rt.ema)
    np.testing.assert_allclose(e1, 0.5 * p0 + 0.5 * p1, rtol=1e-6)

    tr.fit(iters=2, start_it=1, log_every=1)
    p2, e2 = leaf(tr.rt.state.params_g), leaf(tr.rt.ema)
    np.testing.assert_allclose(e2, 0.5 * e1 + 0.5 * p2, rtol=1e-6)


def test_ema_migrates_across_growth():
    import dataclasses
    ds = _dataset(s=4)
    cfg = _config(stages=2, growing=True)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=8, log_every=1)
    assert np.isfinite(out["g_loss"])
    flat_p = jax.tree_util.tree_structure(tr.rt.state.params_g)
    flat_e = jax.tree_util.tree_structure(tr.rt.ema)
    assert flat_p == flat_e  # ema grew in lockstep with the generator
    for e in jax.tree_util.tree_leaves(tr.rt.ema):
        assert np.isfinite(np.asarray(e)).all()


def test_ema_checkpoint_roundtrip(tmp_path):
    """gen_ema checkpoints restore on resume; pre-EMA checkpoints fall back
    to restarting the average from the restored params."""
    import dataclasses
    from mpgan_tpu.train import checkpoint as ckpt
    ds = _dataset()
    cfg = _config(stages=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.5))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    tr.fit(iters=2, log_every=1)
    leaf = lambda t: np.asarray(t["params"]["stem"]["kernel"])

    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save(run, 0, tr.rt.state, dict(it=2, stage=1, pass_no=1))
    ckpt.save_gen(run, 0, tr.rt.ema, prefix="gen_ema")
    tr2 = Trainer(cfg, tc)
    assert tr2.restore(run, 0) == 2
    np.testing.assert_array_equal(leaf(tr2.rt.ema), leaf(tr.rt.ema))

    run2 = ckpt.next_run_dir(str(tmp_path))  # no gen_ema saved (pre-EMA)
    ckpt.save(run2, 0, tr.rt.state, dict(it=2, stage=1, pass_no=1))
    tr3 = Trainer(cfg, tc)
    tr3.restore(run2, 0)
    np.testing.assert_array_equal(leaf(tr3.rt.ema),
                                  leaf(tr3.rt.state.params_g))


def test_lazy_r1_scaled_gamma_matches_dense_at_apply_step():
    """StyleGAN2 lazy regularization: on an apply step, interval-k with γ
    equals interval-1 with γ·k exactly (same seed, same batches)."""
    import dataclasses
    ds = _dataset()
    base = _config(stages=1)
    mk = lambda g, k: dataclasses.replace(
        base, loss=dataclasses.replace(base.loss, gan_loss="hinge",
                                       r1_gamma=g, r1_interval=k))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    o_lazy = Trainer(mk(20.0, 2), tc).fit(iters=1, log_every=1)
    o_dense = Trainer(mk(40.0, 1), tc).fit(iters=1, log_every=1)
    assert abs(o_lazy["d_loss"] - o_dense["d_loss"]) < 1e-5, \
        (o_lazy["d_loss"], o_dense["d_loss"])


def test_lazy_r1_disc_runs_matches_dense_at_apply_step():
    """Defined lazy-R1 × discRuns semantics (VERDICT r2 #7): all discRuns
    D-updates of an apply step share state.step, so EVERY one pays the
    γ·k-scaled penalty — an apply step with (γ, interval k, discRuns n)
    must equal one with (γ·k, interval 1, discRuns n) exactly. The
    time-average is then 0.5·γ per D-update, independent of discRuns
    (see the _r1_term docstring in train/loop.py)."""
    import dataclasses
    ds = _dataset()
    base = _config(stages=1)

    def mk(g, k):
        cfg = dataclasses.replace(
            base, loss=dataclasses.replace(base.loss, gan_loss="hinge",
                                           r1_gamma=g, r1_interval=k))
        return dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, disc_runs=2))

    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    o_lazy = Trainer(mk(20.0, 2), tc).fit(iters=1, log_every=1)
    o_dense = Trainer(mk(40.0, 1), tc).fit(iters=1, log_every=1)
    assert abs(o_lazy["d_loss"] - o_dense["d_loss"]) < 1e-5, \
        (o_lazy["d_loss"], o_dense["d_loss"])


def test_lazy_r1_skips_off_steps():
    """The penalty is absent on non-apply steps: a 2-iter lazy run diverges
    from the every-step run (identical otherwise)."""
    import dataclasses
    ds = _dataset()
    base = _config(stages=1)
    mk = lambda k: dataclasses.replace(
        base, loss=dataclasses.replace(base.loss, gan_loss="hinge",
                                       r1_gamma=10.0, r1_interval=k))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr_l, tr_d = Trainer(mk(2), tc), Trainer(mk(1), tc)
    o_l = tr_l.fit(iters=2, log_every=1)
    o_d = tr_d.fit(iters=2, log_every=1)
    assert np.isfinite(o_l["d_loss"]) and np.isfinite(o_d["d_loss"])
    w_l = np.asarray(jax.tree_util.tree_leaves(tr_l.rt.state.params_ds)[0])
    w_d = np.asarray(jax.tree_util.tree_leaves(tr_d.rt.state.params_ds)[0])
    assert not np.allclose(w_l, w_d)


def test_pure_l1_skips_discriminator():
    """kAdv 0 kt 0 kf 0: no loss term touches a discriminator, so D params
    must stay at init (the step skips D updates entirely) while G trains."""
    import dataclasses
    ds = _dataset()
    base = _config(stages=1)
    cfg = dataclasses.replace(
        base, loss=dataclasses.replace(base.loss, lambda_adv=0.0,
                                       lambda_t=0.0, lambda_f=0.0))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    k = jax.random.PRNGKey(0)
    tr.rt = tr._init_stage(tr.n_stages, k, None)
    ds_before = jax.tree.map(np.asarray, tr.rt.state.params_ds)
    g_before = np.asarray(
        jax.tree_util.tree_leaves(tr.rt.state.params_g)[0]).copy()
    out = tr.fit(iters=3, log_every=1)
    assert out["d_loss"] == 0.0 and out["g_adv"] == 0.0
    assert np.isfinite(out["l1"])
    for a, b in zip(jax.tree_util.tree_leaves(ds_before),
                    jax.tree_util.tree_leaves(
                        jax.tree.map(np.asarray, tr.rt.state.params_ds))):
        np.testing.assert_array_equal(a, b)
    g_after = np.asarray(jax.tree_util.tree_leaves(tr.rt.state.params_g)[0])
    assert not np.allclose(g_before, g_after)  # G did train


def test_output_interval_zero_logs_only_at_end():
    """outputInterval 0 must not divide by zero; it means 'log at end'."""
    import dataclasses
    ds = _dataset()
    base = _config(stages=1)
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, output_interval=0))
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    out = tr.fit(iters=3)
    assert out["it"] == 2
    assert len(tr.metrics_log) == 1  # exactly the final log point


def test_restore_rejects_cross_pass_checkpoint(tmp_path):
    """Resuming pass-2 training from a pass-1 checkpoint must fail with a
    clear error, not an orbax shape mismatch."""
    from mpgan_tpu.train import checkpoint as ckpt
    ds = _dataset()
    cfg = _config(stages=1)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0, augment=False)
    tr = Trainer(cfg, tc)
    tr.fit(iters=1, log_every=1)
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save(run, 0, tr.rt.state, dict(it=1, stage=1, pass_no=1))
    tr2 = Trainer(cfg, tc, pass_no=2)
    with pytest.raises(ValueError, match="pass"):
        tr2.restore(run, 0)


def test_latest_resumable_skips_corrupt_sidecar(tmp_path):
    """A truncated .json sidecar (kill mid-write before atomic writes) is
    treated as unknown-pass and skipped, not crashed on."""
    import os
    from mpgan_tpu.train import checkpoint as ckpt
    base = str(tmp_path)
    for idx, no in [(0, 0), (1, 0)]:
        run = ckpt.run_dir(base, idx)
        os.makedirs(ckpt.model_dir(run, no))
        meta = ckpt.model_dir(run, no) + ".json"
        with open(meta, "w") as f:
            f.write('{"pass_no": 1, "it": 5}' if idx == 0
                    else '{"pass_no": 1, "it"')  # newest is truncated
    assert ckpt.latest_resumable(base, pass_no=1) == (0, 0)


def test_preview_norm_zero_peak_stays_dark():
    """An all-zero preview batch with an explicit shared peak of 0.0 must
    render black tiles, not per-image-amplified noise."""
    from mpgan_tpu.utils.preview import _norm
    zero = np.zeros((4, 4), np.float32)
    assert _norm(zero, peak=0.0).max() == 0  # shared scale honored
    half = np.full((4, 4), 0.5, np.float32)
    assert _norm(half, peak=None).max() == 255  # per-image fallback intact
    # explicit shared peak keeps cross-column comparability: a dim image
    # under a bright column's peak stays dim
    assert _norm(half, peak=255.0).max() == 0

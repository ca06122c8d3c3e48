"""Training driver (SURVEY.md §2.11/§3.1, rebuilt TPU-first).

One fused, jitted ``train_step`` does everything the reference's per-iteration
host loop did across multiple ``sess.run`` calls: sample + augment a batch
on-device (TileCreator), update Ds (and Dt), then update G — no host↔device
feed_dict boundary in the hot loop. The train state is donated, so parameters
and optimizer moments update in place in HBM.

Progressive growing (SURVEY.md §2.9): the host loop asks GrowthSchedule for
(stage, α) each iteration; at a stage boundary the models are re-jitted at the
new stage and parameters are merged forward (growing.migrate_params) — no
TF1-style graph surgery. α is a traced scalar, so fading costs no recompiles
(two programs per stage: fade and stable).

Parallelism: batch-leading-axis DP over the mesh's 'data' axis; XLA inserts
the gradient psum over ICI (SURVEY.md §2.14).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpgan_tpu.config import Config
from mpgan_tpu.data import pipeline
from mpgan_tpu.data.pipeline import TileCreator
from mpgan_tpu.models import discriminator as D
from mpgan_tpu.models import generator as G
from mpgan_tpu.models import growing
from mpgan_tpu.parallel import mesh as pmesh
from mpgan_tpu.train import losses
from mpgan_tpu.utils.liveness import touch_heartbeat as _touch_heartbeat


class TrainState(NamedTuple):
    params_g: Any
    opt_g: Any
    params_ds: Any
    opt_ds: Any
    params_dt: Any      # empty dict when temporal disc is off
    opt_dt: Any
    step: jnp.ndarray   # int32 scalar


@dataclass
class StageRuntime:
    """Models + jitted step for one growth stage."""
    stage: int
    gen: G.Generator
    ds: D.Discriminator
    dt: D.Discriminator | None
    step_fade: Callable
    step_stable: Callable
    state: TrainState
    ema: Any = None     # EMA generator params ({} when emaDecay == 0)


_PASS_INPUT_KEY = {1: "lr", 2: "interm", 3: "final"}


def copy_tree(tree):
    """Device-side deep copy in one dispatch. Needed wherever a tree (e.g.
    the EMA params) must not alias buffers that are also donated to the
    train step — donation would otherwise invalidate the shared storage."""
    return jax.jit(lambda t: jax.tree.map(lambda x: x * 1.0, t))(tree)


def _make_opt(cfg: Config, disc: bool = False) -> optax.GradientTransformation:
    """Single source of truth for the optimizer (init and updates must match).

    disc=True uses ``lrdisc`` when set (TTUR — Heusel et al. 2017: a faster
    discriminator clock stabilizes GAN training without genRuns/discRuns
    imbalance)."""
    lr = cfg.train.learning_rate
    if disc and cfg.train.lr_disc > 0:
        lr = cfg.train.lr_disc
    return optax.adam(lr, b1=cfg.train.beta1, eps=cfg.train.adam_eps)


def _g_input(batch: dict, pass_no: int) -> jnp.ndarray:
    if pass_no == 1:
        return batch["lr"]
    parts = [batch[_PASS_INPUT_KEY[pass_no]]]
    if "lr_vel" in batch:
        parts.append(batch["lr_vel"])
    return jnp.concatenate(parts, axis=-1)


def _g_input_shifted(batch: dict, pass_no: int, which: str) -> jnp.ndarray:
    if pass_no == 1:
        return batch[f"lr_{which}"]
    parts = [batch[f"{_PASS_INPUT_KEY[pass_no]}_{which}"]]
    if f"lr_vel_{which}" in batch:
        parts.append(batch[f"lr_vel_{which}"])
    return jnp.concatenate(parts, axis=-1)


def make_sampler(tc: TileCreator, pass_no: int, batch_size: int,
                 temporal: bool, mesh=None,
                 data_sharded: bool = False) -> Callable:
    """Batch-sampling closure: sample(data, key) → batch dict.

    With ``data_sharded`` (sharded volume residency, VERDICT r1 #5) each
    device draws its ``batch_size/n_shards`` share of the batch from ITS
    local volume shard inside a shard_map — the trilinear gathers stay
    device-local and no collective ever touches the dataset stacks. The
    per-device RNG stream is the dispatch key folded with the mesh axis
    index, so a fixed seed is reproducible for a fixed mesh size.
    """
    plane = {1: "xy", 2: "xz", 3: "yz"}[pass_no]
    if data_sharded and batch_size % tc.n_shards:
        raise ValueError(f"batchSize {batch_size} must divide over the "
                         f"{tc.n_shards}-device mesh for sharded residency")

    def _draw(data, key, bsz, st):
        if pass_no == 1:
            return pipeline._sample_pass1(data["lr"], data["hrz"],
                                          data["didx"], key, bsz, plane,
                                          temporal, st)
        if pass_no == 2:
            return pipeline._sample_pass2(data["lr"], data["interm"],
                                          data["hr"], data["didx"], key, bsz,
                                          plane, temporal, st)
        return pipeline._sample_pass3(data["lr"], data["final"], data["hr"],
                                      data["didx"], key, bsz, plane,
                                      temporal, st)

    if not data_sharded:
        return lambda data, key: _draw(data, key, batch_size, tc.st)

    from jax.sharding import PartitionSpec as P

    def local(data_l, key_):
        k = jax.random.fold_in(key_, jax.lax.axis_index(pmesh.DATA_AXIS))
        return _draw(data_l, k, batch_size // tc.n_shards, tc.st_local)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(pmesh.DATA_AXIS), P()),
                         out_specs=P(pmesh.DATA_AXIS))


def make_train_step(cfg: Config, tc: TileCreator, gen: G.Generator,
                    ds: D.Discriminator, dt: D.Discriminator | None,
                    stage: int, fade: bool, pass_no: int,
                    mesh=None, data_sharded: bool | None = None) -> Callable:
    """Build the fused jitted train step for one (stage, fade) program.

    Returns step(state, data, key, alphas) → (state, metrics). ``alphas`` is
    a traced (K,) vector (K steps per dispatch); ``data`` is the tile
    creator's device-array dict passed explicitly — closing over it would
    serialize the whole dataset into the compile payload (the axon remote
    compiler rejects >~hundreds of MB with HTTP 413).
    """
    lcfg = cfg.loss
    temporal = dt is not None
    if temporal and tc.st.n_vel == 0:
        raise ValueError(
            "useTempoD requires velocity channels (useVelocities 1): the "
            "temporal discriminator aligns frames by advection")
    batch_size = cfg.train.batch_size
    s_in = 2 ** stage                     # growth factor at this stage
    s_full = tc.up_res                    # dataset's full SR factor
    n_stages_full = len(gen.factors)
    # Ds conditioning upsample factors (per-axis) for this pass
    # (pass 3 is a constant-resolution refiner: everything already HR)
    cond_f = {1: (s_in, s_in), 2: (s_in, 1), 3: (1, 1)}[pass_no]
    # velocity: spatial resize of the (input-grid) field to the output grid,
    # and unit conversion LR cells → output-grid pixels per axis
    vel_resize = {1: (s_in, s_in), 2: (s_in, 1), 3: (1, 1)}[pass_no]
    unit_h = s_in if pass_no != 3 else s_full
    unit_w = s_in if pass_no == 1 else s_full

    def _stage_targets(b: dict) -> dict:
        """Downsample HR targets when training an intermediate growth stage."""
        if stage == n_stages_full or pass_no == 3:
            return b
        out = dict(b)
        for k in ("hr", "hr_prev", "hr_next"):
            if k in b:
                n, h, w, c = b[k].shape
                if pass_no == 1:
                    new = (n, h * s_in // s_full, w * s_in // s_full, c)
                else:  # z (h) axis only; w already matches
                    new = (n, h * s_in // s_full, w, c)
                out[k] = jax.image.resize(b[k], new, method="linear")
        return out

    opt_g = _make_opt(cfg)
    opt_d = _make_opt(cfg, disc=True)

    if data_sharded is None:
        data_sharded = mesh is not None and getattr(tc, "n_shards", 1) > 1
    sample_raw = make_sampler(tc, pass_no, batch_size, temporal, mesh,
                              data_sharded)

    def sample(data, key):
        return pmesh.constrain_batch(_stage_targets(sample_raw(data, key)),
                                     mesh)

    def gen_apply(p, x, alpha):
        return gen.apply(p, x, stage=stage, alpha=alpha, fade=fade)

    def ds_apply(p, x, alpha, feats=False):
        return ds.apply(p, x, stage=stage, alpha=alpha, fade=fade,
                        return_features=feats)

    def dt_apply(p, x, alpha):
        return dt.apply(p, x, stage=stage, alpha=alpha, fade=fade)

    use_pallas_warp = (lcfg.warp_backend == "pallas" or
                       (lcfg.warp_backend == "auto" and
                        jax.default_backend() == "tpu"))

    def aligned_fakes(p_g, batch, alpha):
        """G on (prev, cur, next) inputs, advected to center time."""
        f_prev = gen_apply(p_g, _g_input_shifted(batch, pass_no, "prev"), alpha)
        f_cur = gen_apply(p_g, _g_input(batch, pass_no), alpha)
        f_next = gen_apply(p_g, _g_input_shifted(batch, pass_no, "next"), alpha)
        vel = _vel_hr(batch)
        return losses.align_triplet(f_prev, f_cur, f_next, vel,
                                    use_pallas_warp, lcfg.warp_max_disp)

    def aligned_reals(batch):
        vel = _vel_hr(batch)
        return losses.align_triplet(batch["hr_prev"], batch["hr"],
                                    batch["hr_next"], vel,
                                    use_pallas_warp, lcfg.warp_max_disp)

    def _vel_hr(batch):
        if pass_no == 1:
            v = batch["lr"][..., 1:3]       # (v_w, v_h) in LR units
        else:
            v = batch["lr_vel"][..., 0:2]
        if vel_resize == (1, 1):
            return v * jnp.asarray([unit_w, unit_h], dtype=v.dtype)
        b, h, w, _ = v.shape
        fh, fw = vel_resize
        v = jax.image.resize(v, (b, h * fh, w * fw, 2), method="linear")
        return v * jnp.asarray([unit_w, unit_h], dtype=v.dtype)

    def _r1_term(apply_fn, x, step):
        """Lazy R1 (StyleGAN2): apply every ``r1Interval``-th D step with γ
        scaled ×interval so the effective regularization is unchanged; the
        extra backward through D is skipped on the other steps (lax.cond
        executes one branch).

        discRuns > 1: every D-run within an apply step shares ``state.step``
        (it increments once per train step), so ALL ``discRuns`` updates of
        an apply step pay the ×interval-scaled penalty. That is the defined
        semantics, and it preserves the time-average exactly: over k steps
        there are k·discRuns D-updates and discRuns penalty applications of
        0.5·γ·k each → 0.5·γ per D-update, identical to r1Interval=1 (where
        every one of the k·discRuns updates pays 0.5·γ). The penalty is
        burstier — concentrated on apply steps — but not stronger. Pinned by
        tests/test_train.py::test_lazy_r1_disc_runs_matches_dense_at_apply_step.
        """
        k = max(lcfg.r1_interval, 1)
        full = lambda: (0.5 * lcfg.r1_gamma * k *
                        losses.r1_penalty(apply_fn, x))
        if k == 1:
            return full()
        return jax.lax.cond(step % k == 0, full, lambda: jnp.float32(0.0))

    def d_losses(p_ds, p_dt, p_g, batch, alpha, key, step):
        x_in = _g_input(batch, pass_no)
        fake = jax.lax.stop_gradient(gen_apply(p_g, x_in, alpha))
        real_in = D.condition_ds_input(x_in, batch["hr"], *cond_f)
        fake_in = D.condition_ds_input(x_in, fake, *cond_f)
        loss_ds = losses.d_loss(ds_apply(p_ds, real_in, alpha),
                                ds_apply(p_ds, fake_in, alpha),
                                lcfg.label_smooth, lcfg.gan_loss)
        ks, kt = jax.random.split(key)
        if lcfg.r1_gamma > 0:
            loss_ds = loss_ds + _r1_term(
                lambda x: ds_apply(p_ds, x, alpha), real_in, step)
        if lcfg.gp_weight > 0:
            loss_ds = loss_ds + lcfg.gp_weight * losses.gradient_penalty(
                lambda x: ds_apply(p_ds, x, alpha), real_in, fake_in, ks)
        loss_dt = 0.0
        if temporal:
            trip_fake = jax.lax.stop_gradient(aligned_fakes(p_g, batch, alpha))
            trip_real = aligned_reals(batch)
            loss_dt = losses.d_loss(dt_apply(p_dt, trip_real, alpha),
                                    dt_apply(p_dt, trip_fake, alpha),
                                    lcfg.label_smooth, lcfg.gan_loss)
            if lcfg.r1_gamma > 0:
                loss_dt = loss_dt + _r1_term(
                    lambda x: dt_apply(p_dt, x, alpha), trip_real, step)
            if lcfg.gp_weight > 0:
                loss_dt = loss_dt + lcfg.gp_weight * losses.gradient_penalty(
                    lambda x: dt_apply(p_dt, x, alpha), trip_real, trip_fake,
                    kt)
        return loss_ds, loss_dt

    # pure-L1 training (kAdv 0 kt 0 kf 0): no loss term touches a
    # discriminator, so the D updates and the D forwards inside the G loss
    # are dead weight — skip them entirely (~2× step time for the L1
    # pretrain stage of the documented warm-start recipe)
    pure_l1 = (lcfg.lambda_adv == 0 and lcfg.lambda_t == 0
               and lcfg.lambda_f == 0)

    def g_loss(p_g, p_ds, p_dt, batch, alpha):
        x_in = _g_input(batch, pass_no)
        fake = gen_apply(p_g, x_in, alpha)
        if pure_l1:
            l_l1 = losses.l1_loss(fake, batch["hr"])
            aux = dict(g_adv=0.0, l1=l_l1, feat=0.0, g_t=0.0,
                       psnr=losses.psnr(fake, batch["hr"]))
            return lcfg.lambda_l1 * l_l1, aux
        fake_in = D.condition_ds_input(x_in, fake, *cond_f)
        real_in = D.condition_ds_input(x_in, batch["hr"], *cond_f)
        fake_logits, feats_fake = ds_apply(p_ds, fake_in, alpha, feats=True)
        _, feats_real = ds_apply(p_ds, real_in, alpha, feats=True)
        feats_real = jax.lax.stop_gradient(feats_real)

        l_adv = losses.g_adv_loss(fake_logits, lcfg.gan_loss)
        l_l1 = losses.l1_loss(fake, batch["hr"])
        l_f = losses.feature_loss(feats_real, feats_fake)
        l_t = 0.0
        if temporal:
            trip_fake = aligned_fakes(p_g, batch, alpha)
            l_t = losses.g_adv_loss(dt_apply(p_dt, trip_fake, alpha),
                                    lcfg.gan_loss)
        total = (lcfg.lambda_adv * l_adv + lcfg.lambda_l1 * l_l1
                 + lcfg.lambda_f * l_f + lcfg.lambda_t * l_t)
        aux = dict(g_adv=l_adv, l1=l_l1, feat=l_f, g_t=l_t,
                   psnr=losses.psnr(fake, batch["hr"]))
        return total, aux

    ema_decay = cfg.train.ema_decay

    def step_core(state: TrainState, ema, data, key, alpha):
        # discRuns D-updates then genRuns G-updates, a fresh batch each
        # (reference §2.11 alternation); loops unroll at trace time
        params_ds, opt_ds_state = state.params_ds, state.opt_ds
        params_dt, opt_dt_state = state.params_dt, state.opt_dt
        loss_ds, loss_dt = 0.0, 0.0
        for i in range(0 if pure_l1 else max(cfg.train.disc_runs, 1)):
            key, kd, kp = jax.random.split(key, 3)
            batch_d = sample(data, kd)

            def ds_obj(p_ds):
                l_ds, _ = d_losses(p_ds, params_dt, state.params_g,
                                   batch_d, alpha, kp, state.step)
                return l_ds
            loss_ds, grads_ds = jax.value_and_grad(ds_obj)(params_ds)
            upd, opt_ds_state = opt_d.update(grads_ds, opt_ds_state, params_ds)
            params_ds = optax.apply_updates(params_ds, upd)

            if temporal:
                def dt_obj(p_dt):
                    _, l_dt = d_losses(params_ds, p_dt, state.params_g,
                                       batch_d, alpha, kp, state.step)
                    return l_dt
                loss_dt, grads_dt = jax.value_and_grad(dt_obj)(params_dt)
                upd, opt_dt_state = opt_d.update(grads_dt, opt_dt_state,
                                                 params_dt)
                params_dt = optax.apply_updates(params_dt, upd)

        params_g, opt_g_state = state.params_g, state.opt_g
        loss_g, aux = 0.0, {}
        for i in range(max(cfg.train.gen_runs, 1)):
            key, kg = jax.random.split(key)
            batch_g = sample(data, kg)
            (loss_g, aux), grads_g = jax.value_and_grad(
                g_loss, has_aux=True)(params_g, params_ds, params_dt,
                                      batch_g, alpha)
            upd, opt_g_state = opt_g.update(grads_g, opt_g_state, params_g)
            params_g = optax.apply_updates(params_g, upd)

        if ema_decay > 0:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype)
                * (1.0 - ema_decay), ema, params_g)

        metrics = dict(d_loss=loss_ds, dt_loss=loss_dt, g_loss=loss_g, **aux)
        new_state = TrainState(params_g, opt_g_state, params_ds, opt_ds_state,
                               params_dt, opt_dt_state, state.step + 1)
        return new_state, ema, metrics

    # K steps per dispatch: a lax.scan over a vector of per-step alphas.
    # One device program per (stage, fade, K) amortizes host-dispatch latency
    # (~33 ms/RPC on the axon tunnel — SURVEY.md §3.1 rebuild consequence).
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(state: TrainState, ema, data, key, alphas):
        def body(carry, alpha):
            st, em, k = carry
            k, k_step = jax.random.split(k)
            st, em, metrics = step_core(st, em, data, k_step, alpha)
            return (st, em, k), metrics
        (state, ema, _), ms = jax.lax.scan(body, (state, ema, key), alphas)
        return state, ema, jax.tree.map(lambda x: x[-1], ms)

    return step


def measure_dispatch_pair_s(n: int = 3) -> float:
    """Wall time of one (dispatch RPC + scalar fetch) round trip on the
    current default device. On the axon tunnel this is ~66 ms; in-process
    CPU/TPU it is microseconds. Used to calibrate stepsPerDispatch."""
    f = jax.jit(lambda x: x * 1.0 + 1.0)
    y = f(jnp.float32(0.0))
    float(y)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)
        float(y)
    return (time.perf_counter() - t0) / n


def pick_dispatch_k(t_total_s: float, t_pair_s: float, cap: int = 64,
                    min_pair_s: float = 2e-3,
                    target_overhead: float = 0.1) -> int:
    """Latency-aware stepsPerDispatch (VERDICT r1 #6, made honest in r3).

    ``t_total_s`` is the measured wall time of one single-step dispatch
    including a scalar metric fetch; ``t_pair_s`` the no-op dispatch+fetch
    round trip. Below ``min_pair_s`` the dispatch path is in-process (CPU
    tests, local PJRT) and K=1 keeps runs deterministic and programs few.

    In the remote (tunnel) regime the per-dispatch overhead of the real
    fused step is program-size-dependent and measured several-fold larger
    than the no-op round trip (~230 ms vs ~70 ms on axon), so it is modeled
    pessimistically as ``v = 8·t_pair``. K is the smallest chunk whose
    dispatch-overhead fraction ``v / (v + K·t_step)`` is within
    ``target_overhead`` — light steps hit the cap (measured on axon:
    K=8 → 18.5 steps/s vs K=64 → 34 steps/s on an identical config), slow
    steps that amortize the RPC on their own keep K=1 for finer
    log/checkpoint granularity, and mid-latency steps land in between
    instead of jumping to the cap.
    """
    if t_pair_s < min_pair_s:
        return 1
    t_step = max(t_total_s - t_pair_s, t_pair_s / 16.0)
    v = 8.0 * t_pair_s
    k = math.ceil(v * (1.0 - target_overhead) / (target_overhead * t_step))
    return max(1, min(cap, k))


class Trainer:
    """Host-side driver: growth schedule, stage rebuilds, metrics, previews."""

    def __init__(self, cfg: Config, tc: TileCreator, mesh=None,
                 pass_no: int | None = None, shard_data: bool = True):
        self.cfg = cfg
        self.tc = tc
        self.mesh = mesh
        # shard dataset residency over the mesh when the sim count AND the
        # batch size divide evenly (whole sims per device; see
        # TileCreator.shard_over — each device draws batch/n_dev samples).
        # Otherwise residency stays replicated, which trains any batch size.
        # shard_data=False keeps residency replicated (A/B + fallback).
        if (shard_data and mesh is not None
                and cfg.train.batch_size % int(mesh.devices.size)):
            print(f"  batchSize {cfg.train.batch_size} does not divide over "
                  f"{int(mesh.devices.size)} devices; dataset residency "
                  "stays replicated")
            shard_data = False
        self.data_sharded = bool(
            shard_data and mesh is not None and hasattr(tc, "shard_over")
            and tc.shard_over(mesh))
        self.pass_no = pass_no if pass_no is not None else (
            1 if cfg.train.first_gen_run else 2)
        # pass 3 is a single-stage refiner; growing does not apply
        self.n_stages = 1 if self.pass_no == 3 else cfg.model.stages
        if cfg.train.use_growing:
            self.schedule = growing.GrowthSchedule(
                self.n_stages, cfg.train.alpha_iters, cfg.train.stable_iters)
        else:
            self.schedule = None
        self.rt: StageRuntime | None = None
        self.metrics_log: list[dict] = []
        self._data_cache: dict | None = None
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

    def _data(self) -> dict:
        """Tile-creator device arrays, passed explicitly into the jitted step
        (never closed over — see make_train_step)."""
        if self._data_cache is None:
            tc = self.tc
            if self.pass_no == 1:
                self._data_cache = dict(
                    lr=tc.lr, hrz=tc.hrz,
                    didx=tc._idx(self.cfg.train.use_temporal_disc))
            elif self.pass_no == 2:
                self._data_cache = dict(
                    lr=tc.lr, interm=tc.interm, hr=tc.hr,
                    didx=tc._idx(self.cfg.train.use_temporal_disc))
            else:
                self._data_cache = dict(
                    lr=tc.lr, final=tc.final, hr=tc.hr,
                    didx=tc._idx(self.cfg.train.use_temporal_disc))
        return self._data_cache

    # ---------------------------------------------------------------- build

    def _make_models(self, stage: int):
        mcfg = self.cfg.model
        dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
        if self.pass_no == 1:
            gen = G.make_pass1(self.n_stages, mcfg.n_base_filters,
                               mcfg.n_res_blocks, dtype=dtype,
                               remat=mcfg.remat)
            dfac = tuple((2, 2) for _ in range(self.n_stages))
        elif self.pass_no == 2:
            gen = G.make_pass2(self.n_stages, mcfg.n_base_filters,
                               mcfg.n_res_blocks, dtype=dtype,
                               remat=mcfg.remat)
            dfac = tuple((2, 1) for _ in range(self.n_stages))
        else:
            gen = G.make_pass3(mcfg.n_base_filters, mcfg.n_res_blocks,
                               dtype=dtype, remat=mcfg.remat)
            dfac = ((1, 1),)
        ds = D.make_spatial(self.n_stages, mcfg.disc_base_filters,
                            factors=dfac, dtype=dtype)
        dt = None
        if self.cfg.train.use_temporal_disc:
            dt = D.make_temporal(self.n_stages, mcfg.disc_base_filters,
                                 factors=dfac, dtype=dtype)
        return gen, ds, dt

    def _example_inputs(self, stage: int):
        t = self.cfg.data.tile_size_low
        s = 2 ** stage
        if self.pass_no == 1:
            c_in = 1 + self.tc.st.n_vel + self.tc.st.n_vort
            x = jnp.zeros((1, t, t, c_in))
            cond = jnp.zeros((1, t * s, t * s, c_in + 1))
        elif self.pass_no == 2:
            # pass-2 input: intermediate density + velocity (no vorticity)
            c_in = 1 + self.tc.st.n_vel
            x = jnp.zeros((1, t, t * self.tc.up_res, c_in))
            cond = jnp.zeros((1, t * s, t * self.tc.up_res, c_in + 1))
        else:
            # pass-3 input: full-res density + velocity, constant resolution
            c_in = 1 + self.tc.st.n_vel
            ts = t * self.tc.up_res
            x = jnp.zeros((1, ts, ts, c_in))
            cond = jnp.zeros((1, ts, ts, c_in + 1))
        trip = jnp.zeros(cond.shape[:3] + (3,))
        return x, cond, trip

    def _init_stage(self, stage: int, key, prev: StageRuntime | None):
        gen, ds, dt = self._make_models(stage)
        kg, ks, kt = jax.random.split(key, 3)
        x, cond, trip = self._example_inputs(stage)
        params_g = gen.init(kg, x, stage=stage)
        params_ds = ds.init(ks, cond, stage=stage)
        params_dt = dt.init(kt, trip, stage=stage) if dt is not None else {}

        if prev is not None:  # grow: carry learned weights forward
            params_g = growing.migrate_params(prev.state.params_g, params_g)
            old_ds = {"params": {k: v for k, v in
                                 prev.state.params_ds["params"].items()
                                 if k != "out"}}
            params_ds = growing.migrate_params(old_ds, params_ds)
            if dt is not None and prev.state.params_dt:
                old_dt = {"params": {k: v for k, v in
                                     prev.state.params_dt["params"].items()
                                     if k != "out"}}
                params_dt = growing.migrate_params(old_dt, params_dt)

        opt_g = _make_opt(self.cfg)
        opt_d = _make_opt(self.cfg, disc=True)
        state = TrainState(
            params_g=params_g, opt_g=opt_g.init(params_g),
            params_ds=params_ds, opt_ds=opt_d.init(params_ds),
            params_dt=params_dt,
            opt_dt=opt_d.init(params_dt) if dt is not None else {},
            step=prev.state.step if prev is not None else jnp.zeros((), jnp.int32),
        )
        ema: Any = {}
        if self.cfg.train.ema_decay > 0:
            # EMA starts at the (migrated) generator; at a growth boundary
            # the old stage's average carries forward and the fresh blocks
            # start at their params_g init values
            ema = params_g
            if prev is not None and prev.ema:
                ema = growing.migrate_params(prev.ema, params_g)
            # ema and params_g are both donated to the step: no aliasing
            ema = copy_tree(ema)
        if self.mesh is not None:
            state = pmesh.replicate(state, self.mesh)
            ema = pmesh.replicate(ema, self.mesh)

        step_fade = make_train_step(self.cfg, self.tc, gen, ds, dt, stage,
                                    True, self.pass_no, self.mesh,
                                    self.data_sharded)
        step_stable = make_train_step(self.cfg, self.tc, gen, ds, dt, stage,
                                      False, self.pass_no, self.mesh,
                                      self.data_sharded)
        return StageRuntime(stage, gen, ds, dt, step_fade, step_stable, state,
                            ema)

    # ------------------------------------------------------------------ fit

    def restore(self, run_dir: str, model_no: int) -> int:
        """Resume from an orbax checkpoint: rebuild the saved stage's runtime
        and load params + optimizer moments. Returns the iteration to resume
        from (SURVEY.md §5 'Checkpoint / resume')."""
        from mpgan_tpu.train import checkpoint as ckpt
        import json
        import os
        meta_path = os.path.abspath(ckpt.model_dir(run_dir, model_no)) + ".json"
        try:
            meta = json.load(open(meta_path))
        except json.JSONDecodeError as e:
            raise ValueError(
                f"checkpoint sidecar {meta_path} is corrupt ({e}); "
                "pick another model_no or delete the damaged checkpoint")
        meta_pass = meta.get("pass_no")
        if meta_pass is not None and int(meta_pass) != self.pass_no:
            raise ValueError(
                f"{meta_path} records training pass {meta_pass}, but this "
                f"run trains pass {self.pass_no} — resuming across passes "
                "would restore mismatched parameter trees")
        stage = int(meta.get("stage", self.n_stages))
        key = jax.random.PRNGKey(self.cfg.train.rand_seed)
        self.rt = self._init_stage(stage, key, None)
        state, _ = ckpt.restore(run_dir, model_no, self.rt.state)
        ema = self.rt.ema
        if self.cfg.train.ema_decay > 0:
            try:
                ema = ckpt.restore_gen(run_dir, model_no, state.params_g,
                                       prefix="gen_ema")
            except FileNotFoundError:
                # pre-EMA checkpoint: restart the average from the params
                ema = copy_tree(state.params_g)
        if self.mesh is not None:
            state = pmesh.replicate(state, self.mesh)
            ema = pmesh.replicate(ema, self.mesh)
        import dataclasses
        self.rt = dataclasses.replace(self.rt, state=state, ema=ema)
        return int(meta.get("it", 0))

    def fit(self, iters: int | None = None, log_every: int | None = None,
            on_checkpoint: Callable | None = None,
            on_log: Callable | None = None, start_it: int = 0) -> dict:
        cfg = self.cfg
        iters = iters if iters is not None else cfg.train.training_iters
        log_every = log_every or cfg.train.output_interval
        if log_every <= 0:  # outputInterval 0 = log only at the end
            log_every = max(iters, 1)
        key = jax.random.PRNGKey(cfg.train.rand_seed)
        key, k_init = jax.random.split(key)
        key = jax.random.fold_in(key, start_it)  # deterministic resume stream

        if self.rt is None:  # fresh start (restore() may have built it)
            cur_stage = (self.schedule.stage_at(start_it)[0] if self.schedule
                         else self.n_stages)
            self.rt = self._init_stage(cur_stage, k_init, None)
        cur_stage = self.rt.stage

        auto_disp = cfg.train.steps_per_dispatch <= 0
        k_disp = 1 if auto_disp else cfg.train.steps_per_dispatch
        n_disp = 0
        prev_prog = None  # (program id, chunk) of the last auto-cal dispatch
        if cfg.train.profile_dir:
            jax.profiler.start_trace(cfg.train.profile_dir)
        t_start = time.time()
        last = {}
        it = start_it
        while it < iters:
            if self.schedule:
                stage, alpha = self.schedule.stage_at(it)
                if stage != cur_stage:
                    key, k_new = jax.random.split(key)
                    self.rt = self._init_stage(stage, k_new, self.rt)
                    cur_stage = stage
            else:
                stage, alpha = self.n_stages, 1.0
            fade = alpha < 1.0 and stage > 1

            # chunk: up to k_disp steps sharing one (stage, fade) program;
            # stop at growth boundaries, fade→stable flips, and log points
            chunk = min(k_disp, iters - it)
            for j in range(1, chunk):
                if self.schedule:
                    s2, a2 = self.schedule.stage_at(it + j)
                    if s2 != stage or ((a2 < 1.0 and s2 > 1) != fade):
                        chunk = j
                        break
            nxt_log = ((it // log_every) + 1) * log_every
            chunk = min(chunk, max(nxt_log - it, 1))
            if cfg.train.save_interval and on_checkpoint:
                nxt_save = ((it // cfg.train.save_interval) + 1) * \
                    cfg.train.save_interval
                chunk = min(chunk, max(nxt_save - it, 1))

            if self.schedule:
                alphas = jnp.asarray(
                    [self.schedule.stage_at(it + j)[1] for j in range(chunk)],
                    jnp.float32)
            else:
                alphas = jnp.ones((chunk,), jnp.float32)

            key, k_step = jax.random.split(key)
            fn = self.rt.step_fade if fade else self.rt.step_stable
            t_disp = time.perf_counter()
            state, ema, metrics = fn(self.rt.state, self.rt.ema, self._data(),
                                     k_step, alphas)
            if auto_disp:
                # drain the pipeline so the next dispatch is timed honestly;
                # only a dispatch re-running the PREVIOUS dispatch's program
                # is a valid measurement — a fade→stable flip or growth
                # boundary right after resume would make dispatch 1 pay a
                # fresh multi-minute remote compile and lock k_disp=1 for
                # the whole run
                float(jax.device_get(next(iter(metrics.values()))))
                if (n_disp >= 1 and chunk == 1
                        and (id(fn), chunk) == prev_prog):
                    k_disp = pick_dispatch_k(
                        time.perf_counter() - t_disp, measure_dispatch_pair_s(),
                        cap=min(64, max(1, log_every)))
                    if jax.process_count() > 1:
                        # per-process wall timings can straddle a threshold
                        # and pick different K → different scan lengths →
                        # mismatched SPMD programs whose collectives hang;
                        # all processes must run process 0's choice
                        from jax.experimental import multihost_utils
                        k_disp = int(multihost_utils.broadcast_one_to_all(
                            jnp.int32(k_disp)))
                    auto_disp = False
                prev_prog = (id(fn), chunk)
            n_disp += 1
            self.rt = StageRuntime(self.rt.stage, self.rt.gen, self.rt.ds,
                                   self.rt.dt, self.rt.step_fade,
                                   self.rt.step_stable, state, ema)
            it += chunk
            _touch_heartbeat()

            if (it - chunk) // log_every != it // log_every or it >= iters:
                last = {k: float(v) for k, v in metrics.items()}
                # metrics are the chunk's LAST step — log that step's alpha,
                # not the chunk-start value (off by chunk-1 fade steps)
                alpha_last = (self.schedule.stage_at(it - 1)[1]
                              if self.schedule else 1.0)
                last.update(it=it - 1, stage=stage, alpha=float(alpha_last),
                            wall=time.time() - t_start)
                self.metrics_log.append(last)
                if on_log:
                    on_log(self, last)
            if on_checkpoint and cfg.train.save_interval and \
                    it % cfg.train.save_interval == 0 and it < iters:
                on_checkpoint(self, it)
                _touch_heartbeat()  # checkpoint saves are legitimately slow
                # Fault injection for elastic-recovery tests (SURVEY.md §5):
                # MPGAN_FAIL_ONCE=<path> kills the run right after its first
                # checkpoint; the sentinel file makes the restarted process
                # run through. No effect unless the env var is set.
                fail_once = os.environ.get("MPGAN_FAIL_ONCE")
                if fail_once and not os.path.exists(fail_once):
                    with open(fail_once, "w") as fh:
                        fh.write(f"injected at it={it}\n")
                    raise RuntimeError(
                        f"MPGAN_FAIL_ONCE: injected fault after the "
                        f"checkpoint at it={it}")
                # MPGAN_HANG_ONCE: same sentinel protocol, but hang instead
                # of crash — exercises the supervisor's hangTimeout watchdog
                # (the tunnel's observed failure mode is a hang, not a raise)
                hang_once = os.environ.get("MPGAN_HANG_ONCE")
                if hang_once and not os.path.exists(hang_once):
                    with open(hang_once, "w") as fh:
                        fh.write(f"hang injected at it={it}\n")
                    print(f"MPGAN_HANG_ONCE: hanging at it={it}", flush=True)
                    time.sleep(10 ** 9)
        if cfg.train.profile_dir:
            jax.profiler.stop_trace()
        if last:
            elapsed = max(last["wall"], 1e-9)
            last["steps_per_sec"] = round((it - start_it) / elapsed, 3)
            last["steps_per_dispatch"] = k_disp
        _touch_heartbeat()  # reset the watchdog clock for final-save/teardown
        return last

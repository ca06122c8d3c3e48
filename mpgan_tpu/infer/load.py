"""Checkpoint → generator loading, shared by the CLI scripts and the server.

The reference rebuilds its TF1 graph and ``Saver.restore``s inside the main
script (SURVEY.md §3.3; file:line citations unavailable — reference mount
empty at survey time). Here the equivalent lives in the library so every
consumer (batch inference, eval, the serving daemon, user code) loads models
the same way.
"""

from __future__ import annotations

import sys


def load_generator(cfg, pass_no: int, run_idx: int, model_no: int):
    """Rebuild the generator of a saved run and restore its params.

    ``pass_no`` selects the architecture (1 = xy SR, 2 = z refinement,
    3 = yz refiner); ``run_idx``/``model_no`` name the ``test_%04d`` run dir
    and checkpoint number (-1 = newest run / newest checkpoint). With
    ``cfg.infer.use_ema`` the EMA weights (``gen_ema_%04d``) are preferred,
    falling back to the raw weights for runs trained without ``emaDecay``.

    Mid-growth checkpoints (saved before the last progressive-growing stage)
    carry a smaller param tree; the ``model_%04d.json`` sidecar's recorded
    stage is used to rebuild a matching architecture, so any save point of a
    growing run is loadable. The effective upscale factor of such a
    generator is 2^stage, not the config's full ``upRes``.
    """
    import json
    import os

    import jax
    import jax.numpy as jnp

    from mpgan_tpu.models import generator as G
    from mpgan_tpu.train import checkpoint as ckpt

    if run_idx < 0:
        newest = ckpt.latest_run_idx(cfg.train.test_path)
        if newest is None:
            raise FileNotFoundError(
                f"load_model_test not given and no test_%04d runs under "
                f"{cfg.train.test_path!r} to default to")
        run_idx = newest
    run = ckpt.run_dir(cfg.train.test_path, run_idx)
    if model_no < 0:
        # gen-only runs exist (scripts/import_tf1.py writes just gen_0000),
        # so fall back to gen_%04d discovery before declaring the run empty
        latest = ckpt.latest_model_no(run)
        if latest is None:
            latest = ckpt.latest_gen_no(run)
        if latest is None:
            raise FileNotFoundError(
                f"no saved checkpoints in {run} (run exists but holds no "
                f"model_%04d/gen_%04d — still training, or died "
                f"pre-first-save?)")
        model_no = latest
    mcfg = cfg.model
    stages = mcfg.stages
    meta_path = ckpt.model_dir(run, model_no) + ".json"
    if os.path.exists(meta_path):
        try:
            saved_stage = int(json.load(open(meta_path)).get("stage"))
        except (json.JSONDecodeError, OSError, TypeError, ValueError):
            saved_stage = None  # corrupt/foreign sidecar: tolerate, use full
        if (pass_no != 3 and saved_stage is not None
                and 1 <= saved_stage < stages):
            print(f"  {run}/gen_{model_no:04d}: mid-growth checkpoint "
                  f"(stage {saved_stage}/{stages}); effective factor "
                  f"{2 ** saved_stage}x", file=sys.stderr)
            stages = int(saved_stage)
    dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
    t = cfg.data.tile_size_low
    # input channels must match training: pass 1 sees the full LR stack
    # (d +vel +vorticity → up to a 7-channel stem), while passes 2/3 train
    # on [interm/final density, velocity] only (train/loop._example_inputs)
    c_in = 1
    if cfg.data.use_velocities:
        c_in += 3
        if cfg.data.use_vorticities and pass_no == 1:
            c_in += 3
    # out_dtype=dtype: bf16 models return bf16 volumes (value-identical —
    # the values are bf16-rounded before any output cast — at half the HBM
    # traffic and half the device→host fetch bytes on the ~1.4 MB/s tunnel);
    # every host consumer casts to f32 at the fetch boundary
    if pass_no == 1:
        gen = G.make_pass1(stages, mcfg.n_base_filters,
                           mcfg.n_res_blocks, dtype=dtype, out_dtype=dtype)
        h, w = t, t
    elif pass_no == 2:
        gen = G.make_pass2(stages, mcfg.n_base_filters,
                           mcfg.n_res_blocks, dtype=dtype, out_dtype=dtype)
        h, w = t, t * cfg.data.up_res
    else:
        gen = G.make_pass3(mcfg.n_base_filters, mcfg.n_res_blocks, dtype=dtype,
                           out_dtype=dtype)
        h = w = t * cfg.data.up_res
    template = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c_in)))
    if cfg.infer.use_ema:
        try:
            return gen, ckpt.restore_gen(run, model_no, template,
                                         prefix="gen_ema")
        except FileNotFoundError:
            # pass trained without emaDecay: fall back to the raw weights so
            # useEma 1 composes with mixed EMA/non-EMA pass chains
            print(f"  useEma: no gen_ema_{model_no:04d} in {run}; "
                  "using gen_", file=sys.stderr)
    params = ckpt.restore_gen(run, model_no, template)
    return gen, params


def load_pass_chain(cfg, load_test2: int = -1, load_no2: int = -1,
                    load_test3: int = -1, load_no3: int = -1):
    """Load the generator chain named by the reference-style flags.

    Pass 1 comes from ``cfg.train.load_model_test/no``; passes 2/3 from the
    ``load_model_test2/no2`` / ``load_model_test3/no3`` values (-1 = pass
    absent). Returns ``(gen1, p1, gen2, p2, gen3, p3)`` with ``None`` for
    absent passes — the shape every entry point (batch inference, eval,
    serving) consumes.
    """
    gen1, p1 = load_generator(cfg, 1, cfg.train.load_model_test,
                              cfg.train.load_model_no)
    gen2 = p2 = gen3 = p3 = None
    if load_test2 >= 0:
        gen2, p2 = load_generator(cfg, 2, load_test2, load_no2)
    if load_test3 >= 0:
        gen3, p3 = load_generator(cfg, 3, load_test3, load_no3)
    return gen1, p1, gen2, p2, gen3, p3


def make_default_upscaler(cfg, chain):
    """Mesh-aware jitted volume upscaler over a loaded pass chain."""
    import jax

    from mpgan_tpu.infer import assemble
    from mpgan_tpu.parallel import mesh as pmesh

    gen1, p1, gen2, p2, gen3, p3 = chain
    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    return assemble.make_jitted_upscaler(
        gen1, p1, gen2, p2, cfg.data.up_res,
        chunk=cfg.infer.slice_chunk, mesh=mesh, gen3=gen3, params3=p3)


def read_lr_frame(cfg, sim_dir: str, f: int):
    """Assemble one LR input frame EXACTLY like the training loader:
    density (+ macRecenter'd velocity) (+ vorticity from that velocity).

    The one shared implementation for inference/eval input parity — a
    second hand-rolled copy is how train/infer channel skew happens.
    Returns the (Z, Y, X, C) float32 stack, or None when the density file
    is absent (callers treat that as 'frame does not exist')."""
    import os

    import numpy as np

    from mpgan_tpu.data import loader

    dpath = os.path.join(sim_dir, loader.LOW_DENSITY % f)
    if not os.path.exists(dpath):
        return None
    chans = [read_uni_volume(dpath).astype(np.float32)]
    if cfg.data.use_velocities:
        vel = read_uni_volume(
            os.path.join(sim_dir, loader.LOW_VELOCITY % f),
            mac_recenter=cfg.data.mac_recenter).astype(np.float32)
        chans.append(vel)
        if cfg.data.use_vorticities:
            chans.append(loader.vorticity(vel))
    return np.concatenate(chans, axis=-1)


def read_uni_volume(path, mac_recenter: bool = False):
    """Decode one .uni volume, preferring the native parallel codec.

    ``mac_recenter``: average staggered MAC velocity faces to cell centers
    (pass ``cfg.data.mac_recenter`` — a model trained with ``macRecenter 1``
    must see recentered velocities at inference too, or its inputs are
    silently skewed vs training). Grids without the MAC header bit (density,
    already-collocated Vec3) pass through untouched, so this is safe to set
    for every read.
    """
    from mpgan_tpu.io import native, uni
    use_native = native.available()
    arr = native.read(path) if use_native else uni.readUni(path)[1]
    if mac_recenter and arr.ndim == 4 and arr.shape[-1] == 3:
        gt = native.read_gridtype(path) if use_native \
            else uni.read_gridtype(path)
        if gt & uni.TYPE_MAC:
            arr = uni.recenter_mac(arr)
    return arr

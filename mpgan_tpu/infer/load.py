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
    and checkpoint number (-1 = newest). With ``cfg.infer.use_ema`` the EMA
    weights (``gen_ema_%04d``) are preferred, falling back to the raw
    weights for runs trained without ``emaDecay``.
    """
    import jax
    import jax.numpy as jnp

    from mpgan_tpu.models import generator as G
    from mpgan_tpu.train import checkpoint as ckpt

    run = ckpt.run_dir(cfg.train.test_path, run_idx)
    if model_no < 0:
        model_no = ckpt.latest_model_no(run) or 0
    mcfg = cfg.model
    dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
    t = cfg.data.tile_size_low
    c_in = 4 if cfg.data.use_velocities else 1
    if pass_no == 1:
        gen = G.make_pass1(mcfg.stages, mcfg.n_base_filters,
                           mcfg.n_res_blocks, dtype=dtype)
        h, w = t, t
    elif pass_no == 2:
        gen = G.make_pass2(mcfg.stages, mcfg.n_base_filters,
                           mcfg.n_res_blocks, dtype=dtype)
        h, w = t, t * cfg.data.up_res
    else:
        gen = G.make_pass3(mcfg.n_base_filters, mcfg.n_res_blocks, dtype=dtype)
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


def read_uni_volume(path):
    """Decode one .uni volume, preferring the native parallel codec."""
    from mpgan_tpu.io import native, uni
    if native.available():
        return native.read(path)
    return uni.readUni(path)[1]

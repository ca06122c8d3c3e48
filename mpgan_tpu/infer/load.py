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


def read_uni_volume(path):
    """Decode one .uni volume, preferring the native parallel codec."""
    from mpgan_tpu.io import native, uni
    if native.available():
        return native.read(path)
    return uni.readUni(path)[1]

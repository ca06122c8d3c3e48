#!/usr/bin/env python
"""Import a reference TF1 `tf.train.Saver` checkpoint as a generator run.

SURVEY.md §5 checkpoint row's "TF1-ckpt→JAX import tool": turns reference
weights (when available) into a `test_%04d/gen_%04d` run usable verbatim by
`scripts/multipass_gan.py out 1` / `scripts/eval.py`, enabling the
BASELINE.json "PSNR vs reference TF1 outputs" parity run.

    python scripts/import_tf1.py ckpt /path/to/model.ckpt genPass 1 \
        testPath runs/ upRes 4 tileSizeLow 16 useVelocities 1 \
        [nameMap map.json]   # flax "block_0_0/conv1/kernel" -> TF var name

Without ``nameMap`` variables are shape-greedy auto-matched (deterministic;
ambiguities printed for review — rerun with an explicit map to pin them).
The model-shape flags (stages/baseFilters/nResBlocks/upRes/…) must describe
the reference architecture being imported.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()

from mpgan_tpu.utils import params as ph


def main(argv=None):
    if argv is not None:
        ph.setParams(argv)
    cc = ph.getParam("compileCache", "")
    setup_compilation_cache(cc if cc else None)
    ckpt_path = str(ph.getParam("ckpt", ""))
    pass_no = int(ph.getParam("genPass", 1))
    name_map_path = str(ph.getParam("nameMap", ""))
    if not ckpt_path:
        sys.exit("usage: import_tf1.py ckpt <tf1-ckpt-prefix> genPass <1|2|3> "
                 "testPath <dir> [model/data flags] [nameMap map.json]")

    from mpgan_tpu import config as cfgmod
    cfg = cfgmod.from_cli(None)

    import jax
    import jax.numpy as jnp
    from mpgan_tpu.models import generator as G
    from mpgan_tpu.train import checkpoint as ckpt
    from mpgan_tpu.utils import tf1_import

    mcfg = cfg.model
    t = cfg.data.tile_size_low
    c_in = 4 if cfg.data.use_velocities else 1
    if pass_no == 1:
        gen = G.make_pass1(mcfg.stages, mcfg.n_base_filters, mcfg.n_res_blocks)
        h, w = t, t
    elif pass_no == 2:
        gen = G.make_pass2(mcfg.stages, mcfg.n_base_filters, mcfg.n_res_blocks)
        h, w = t, t * cfg.data.up_res
    else:
        gen = G.make_pass3(mcfg.n_base_filters, mcfg.n_res_blocks)
        h = w = t * cfg.data.up_res
    template = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c_in)))

    name_map = None
    if name_map_path:
        name_map = json.load(open(name_map_path))

    tf_vars = tf1_import.read_tf1_variables(ckpt_path)
    print(f"checkpoint {ckpt_path}: {len(tf_vars)} model variables")
    params, mapping, ambiguous = tf1_import.import_params(tf_vars, template,
                                                          name_map)
    for key in ambiguous:
        print(f"  ambiguous (shape-tied, first-name match): {key} <- "
              f"{mapping[key]}")

    run = ckpt.next_run_dir(cfg.train.test_path)
    ckpt.save_gen(run, 0, params)
    ckpt.save_param_log(run, cfg, sys.argv[1:] if argv is None else argv)
    with open(os.path.join(run, "tf1_import_map.json"), "w") as f:
        json.dump({"source": os.path.abspath(ckpt_path), "pass": pass_no,
                   "mapping": mapping}, f, indent=1)
    idx = int(os.path.basename(run).split("_")[1])
    print(f"imported -> {run}/gen_0000 (pass {pass_no}); use e.g. "
          f"`out 1 load_model_test{'' if pass_no == 1 else pass_no} {idx} "
          f"load_model_no{'' if pass_no == 1 else pass_no} 0`")


if __name__ == "__main__":
    main()

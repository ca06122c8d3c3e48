#!/usr/bin/env python
"""Quality evaluation: PSNR of super-resolved volumes vs ground-truth HR
(BASELINE.json quality metric: "PSNR vs reference ... outputs").

    python scripts/eval.py basePath data/ fromSim 1000 toSim 1000 \
        frameMin 0 frameMax 20 upRes 4 tileSizeLow 16 useVelocities 1 \
        load_model_test 0 load_model_no 4 [load_model_test2 1 load_model_no2 4] \
        testPath runs/

Prints one JSON line with mean/min/max PSNR, mean volumetric SSIM, and the
temporal-coherence tdiff for the model and for the trilinear-upsampling
baseline (the reference's tooling reports PSNR only; SSIM is additive —
adversarial outputs trade PSNR for the structure SSIM measures).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()  # JAX_PLATFORMS must win over sitecustomize's pin

import numpy as np

from mpgan_tpu.utils import params as ph


def main(argv=None):
    if argv is not None:
        ph.setParams(argv)
    cc = ph.getParam("compileCache", "")
    setup_compilation_cache(cc if cc else None)
    load_test2 = int(ph.getParam("load_model_test2", -1))
    load_no2 = int(ph.getParam("load_model_no2", -1))
    load_test3 = int(ph.getParam("load_model_test3", -1))
    load_no3 = int(ph.getParam("load_model_no3", -1))

    from mpgan_tpu import config as cfgmod
    cfg = cfgmod.from_cli(None)

    import jax
    import jax.numpy as jnp
    from mpgan_tpu.data import loader
    from mpgan_tpu.infer import assemble
    from mpgan_tpu.infer.load import (load_pass_chain, make_default_upscaler,
                                      read_lr_frame,
                                      read_uni_volume as _read_uni)

    chain = load_pass_chain(cfg, load_test2, load_no2, load_test3, load_no3)
    gen2, gen3 = chain[2], chain[4]
    upscale = make_default_upscaler(cfg, chain)
    s = cfg.data.up_res

    from mpgan_tpu.utils.metrics import ssim_volume

    psnrs, psnrs_tri = [], []
    ssims, ssims_tri = [], []
    tdiffs, tdiffs_gt = [], []
    for sim in range(cfg.data.from_sim, cfg.data.to_sim + 1):
        sim_dir = os.path.join(cfg.data.base_path, f"sim_{sim:04d}")
        prev_out = prev_gt = None
        for f in range(cfg.infer.frame_min, cfg.infer.frame_max):
            hpath = os.path.join(sim_dir, loader.HIGH_DENSITY % f)
            # shared reader = training-parity channels (macRecenter, vort)
            lr_np = read_lr_frame(cfg, sim_dir, f)
            if lr_np is None or not os.path.exists(hpath):
                # a gap breaks temporal adjacency: the tdiff warp assumes
                # dt=1, so warping across the gap would corrupt the metric
                prev_out = prev_gt = None
                continue
            d = lr_np[..., :1]
            v = lr_np[..., 1:4] if cfg.data.use_velocities else None
            lr = jnp.asarray(lr_np)
            gt = _read_uni(hpath)
            # widen on host: bf16 models (out_dtype) return bf16 volumes
            out = np.asarray(upscale(lr)).astype(np.float32, copy=False)
            z, y, x, _ = d.shape
            tri = np.asarray(jax.image.resize(
                jnp.asarray(d), (z * s, y * s, x * s, 1), "linear"))
            psnrs.append(assemble.psnr_volume(out, gt))
            psnrs_tri.append(assemble.psnr_volume(tri, gt))
            ssims.append(ssim_volume(out, gt))
            ssims_tri.append(ssim_volume(tri, gt))
            # temporal-coherence metric (tempoGAN-style T_diff): mean |d_t −
            # A(d_{t−1}; v_t)| — lower = smoother; compare model vs GT level
            if v is not None and prev_out is not None:
                from mpgan_tpu.ops.warp import advect_3d
                v_hr = np.asarray(jax.image.resize(
                    jnp.asarray(v), (z * s, y * s, x * s, 3), "linear")) * s
                warp_prev = np.asarray(advect_3d(jnp.asarray(prev_out),
                                                 jnp.asarray(v_hr), 1.0))
                tdiffs.append(float(np.abs(out - warp_prev).mean()))
                warp_gt = np.asarray(advect_3d(jnp.asarray(prev_gt),
                                               jnp.asarray(v_hr), 1.0))
                tdiffs_gt.append(float(np.abs(gt - warp_gt).mean()))
            prev_out, prev_gt = out, gt

    if not psnrs:
        sys.exit(f"no evaluable frames: no (density_low, density_high) pairs "
                 f"for sims {cfg.data.from_sim}..{cfg.data.to_sim}, frames "
                 f"{cfg.infer.frame_min}..{cfg.infer.frame_max} under "
                 f"{cfg.data.base_path!r} — check basePath/sim/frame ranges")
    result = {
        "frames": len(psnrs),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "psnr_min": round(float(np.min(psnrs)), 3),
        "psnr_max": round(float(np.max(psnrs)), 3),
        "trilinear_psnr_mean": round(float(np.mean(psnrs_tri)), 3),
        "ssim_mean": round(float(np.mean(ssims)), 4),
        "trilinear_ssim_mean": round(float(np.mean(ssims_tri)), 4),
        "two_pass": gen2 is not None,
        "three_pass": gen3 is not None,
    }
    if tdiffs:
        result["tdiff_mean"] = round(float(np.mean(tdiffs)), 5)
        result["tdiff_gt_mean"] = round(float(np.mean(tdiffs_gt)), 5)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

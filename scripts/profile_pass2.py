#!/usr/bin/env python
"""Capture the evidence behind BASELINE.md's pass-2 floor attribution
(VERDICT r3 weak #6 / next #7): a profiler trace + the optimized HLO of the
pass-2 inference program on the real chip, so "the residual ~19% HBM-BW
headroom sits inside XLA's conv lowerings at pass-2's slice shapes" is a
measurement, not attribution-by-elimination.

Writes into --out (default .profiles/pass2/):
  - plugins/profile/... XPlane trace (if the backend supports device
    tracing through the axon tunnel; host-side trace otherwise)
  - pass2_hlo.txt: optimized post-fusion HLO with per-op shapes
  - summary.json: measured ms/frame + cost-analysis roofline fields

Usage: python scripts/profile_pass2.py [--out DIR]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache
honor_jax_platforms_env()
setup_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from mpgan_tpu.infer import assemble
from mpgan_tpu.models import generator as G


def main():
    out_dir = ".profiles/pass2/"
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(out_dir, exist_ok=True)

    # the exact pass-2 program bench_decompose times (pass2_only)
    z = y = x = 64
    up, stages = 4, 2
    dtype = jnp.bfloat16
    g2 = G.make_pass2(stages, 32, 2, dtype=dtype, out_dtype=dtype)
    p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 64, 4)))
    rng = np.random.default_rng(0)
    lr_vel = jnp.asarray(rng.random((z, y, x, 3), dtype=np.float32))
    interm = jnp.asarray(
        rng.random((z, y * up, x * up, 1), dtype=np.float32)).astype(dtype)
    n_iters = int(os.environ.get("N", "50"))

    def chained(p2_, it_, v_):
        def step(_, acc):
            return acc + jnp.mean(
                assemble.pass2_volume(g2, p2_, it_ + acc * 1e-30, v_),
                dtype=jnp.float32)
        return jax.lax.fori_loop(0, n_iters, step, jnp.float32(0.0))

    lowered = jax.jit(chained).lower(p2, interm, lr_vel)
    compiled = lowered.compile()
    with open(os.path.join(out_dir, "pass2_hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    float(compiled(p2, interm, lr_vel))  # warm

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(p2, interm, lr_vel))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / n_iters * 1e3

    trace_ok = True
    try:
        with jax.profiler.trace(out_dir):
            float(compiled(p2, interm, lr_vel))
    except Exception as e:  # tracing through the tunnel may be unsupported
        trace_ok = False
        print(f"profiler trace failed: {e!r}", file=sys.stderr)

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", 0))
    by = float(ca.get("bytes accessed", 0))
    kind = jax.devices()[0].device_kind
    peak_bw = 819e9 if "v5 lite" in kind else None
    summary = {
        "program": "pass2_only (staging + 256 xz slices), N-chained",
        "device": kind, "n_iters": n_iters,
        "ms_per_frame": round(ms, 3),
        # HloCostAnalysis counts a fori_loop body ONCE regardless of trip
        # count (BASELINE.md r2 correction) — flops/bytes are per frame
        "gflops_per_frame": round(fl / 1e9, 1),
        "gbytes_per_frame": round(by / 1e9, 2),
        "trace_captured": trace_ok,
    }
    if peak_bw:
        summary["hbm_bw_util"] = round(by / (ms / 1e3) / peak_bw, 4)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

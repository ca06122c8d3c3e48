#!/usr/bin/env python
"""On-device compute rate of the chunked two-pass 8x 128^3 -> 1024^3 upscale
(the scripts/demo_1024.sh program), measured with the chained-loop trick:
N data-dependent frames inside one jit, ending in a scalar fetch — so the
number excludes the device->host volume fetch and the host gzip/.uni write
that dominate the end-to-end sweep (BASELINE.md beyond-HBM row reports both
sides of that split).

Usage: [N=3] [CHUNK=32] python scripts/bench_1024_compute.py
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
    z = y = x = 128
    up, stages = 8, 3
    chunk = int(os.environ.get("CHUNK", "32"))
    n_iters = int(os.environ.get("N", "3"))
    dtype = jnp.bfloat16
    g1 = G.make_pass1(stages, 32, 2, dtype=dtype, out_dtype=dtype)
    g2 = G.make_pass2(stages, 32, 2, dtype=dtype, out_dtype=dtype)
    p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16 * up, 4)))
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((z, y, x, 4), dtype=np.float32))

    def chained(p1_, p2_, lr_):
        def step(_, acc):
            out = assemble.upscale_volume(g1, p1_, g2, p2_,
                                          lr_ + acc * 1e-30, up, chunk=chunk)
            return acc + jnp.mean(out, dtype=jnp.float32)
        return jax.lax.fori_loop(0, n_iters, step, jnp.float32(0.0))

    t0 = time.perf_counter()
    compiled = jax.jit(chained).lower(p1, p2, lr).compile()
    compile_s = time.perf_counter() - t0
    float(compiled(p1, p2, lr))  # warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(compiled(p1, p2, lr))
        ts.append(time.perf_counter() - t0)
    s_frame = float(np.min(ts)) / n_iters
    voxels = (z * up) * (y * up) * (x * up)
    print(json.dumps({
        "program": f"two-pass 8x 128^3->1024^3, sliceChunk {chunk}, "
                   f"{n_iters}-chained, bf16",
        "device": jax.devices()[0].device_kind,
        "compile_s": round(compile_s, 1),
        "s_per_frame_compute": round(s_frame, 3),
        "voxels_per_sec_compute": round(voxels / s_frame / 1e9, 3),
        "unit": "Gvox/s (on-device, fetch/write excluded)",
    }))


if __name__ == "__main__":
    main()

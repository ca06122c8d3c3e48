#!/usr/bin/env python
"""On-device two-pass SR throughput at arbitrary (RES, UP, CHUNK) — the
generic form of scripts/bench_1024_compute.py, for re-measuring the
BASELINE.md throughput rows under the shipped generator defaults
(VERDICT r4 missing #3: the 512^3 and 1024^3 rows predate the conv_dense
upsample rewrite).

Chained-loop timing (N data-dependent frames inside one jit, scalar fetch)
because the axon tunnel does not synchronize on block_until_ready; the
number excludes device->host fetch and host writes, like bench.py.

Env: RES (LR cube edge, default 64), UP (4|8, default 8), CHUNK (slice
chunk, 0 = unchunked, default 0), N (chained frames, default 10), OUT
(also write the JSON doc to this path).

Usage: RES=64 UP=8 N=10 OUT=BENCH_512_r05.json python scripts/bench_sr.py
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
    z = y = x = int(os.environ.get("RES", "64"))
    up = int(os.environ.get("UP", "8"))
    chunk = int(os.environ.get("CHUNK", "0"))
    n_iters = int(os.environ.get("N", "10"))
    stages = {2: 1, 4: 2, 8: 3}[up]
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
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(p1, p2, lr))
        ts.append(time.perf_counter() - t0)
    s_frame = float(np.median(ts)) / n_iters
    voxels = (z * up) * (y * up) * (x * up)
    doc = {
        "program": f"two-pass {up}x {z}^3->{z * up}^3, "
                   f"sliceChunk {chunk or 'none'}, {n_iters}-chained, bf16, "
                   f"upsample_mode=conv_dense (shipped default)",
        "device": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        "compile_s": round(compile_s, 1),
        "s_per_frame_compute": round(s_frame, 4),
        "voxels_per_sec_compute": round(voxels / s_frame / 1e9, 4),
        "unit": "Gvox/s (on-device, fetch/write excluded)",
    }
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        hbm = float(ca.get("bytes accessed", 0.0))
        if hbm and "v5 lite" in jax.devices()[0].device_kind:
            doc["hbm_gb_per_frame"] = round(hbm / 1e9, 2)
            doc["hbm_bw_util"] = round(hbm / s_frame / 819e9, 3)
    except Exception:
        pass
    line = json.dumps(doc)
    print(line)
    out = os.environ.get("OUT")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

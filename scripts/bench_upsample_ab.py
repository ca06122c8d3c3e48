#!/usr/bin/env python
"""A/B the r4 layout-preserving upsample (ops/upsample.py) against the
jax.image.resize lowering it replaces, on the real chip, with the exact
pass-1/pass-2 inference programs bench_decompose times.

Usage: python scripts/bench_upsample_ab.py  [N=50 iterations via env N]
Prints one JSON line per (program, variant).
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


def time_chained(fn, args, n_iters):
    def chained(*a):
        def step(_, acc):
            return acc + fn(*a, eps=acc * 1e-30)
        return jax.lax.fori_loop(0, n_iters, step, jnp.float32(0.0))

    compiled = jax.jit(chained).lower(*args).compile()
    float(compiled(*args))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(*args))
        ts.append(time.perf_counter() - t0)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ms = float(np.median(ts)) / n_iters * 1e3
    return ms, float(ca.get("bytes accessed", 0))


def main():
    n_iters = int(os.environ.get("N", "50"))
    z = y = x = 64
    up = 4
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((z, y, x, 4), dtype=np.float32)).astype(dtype)
    lr_vel = jnp.asarray(rng.random((z, y, x, 3), dtype=np.float32))
    interm = jnp.asarray(
        rng.random((z, y * up, x * up, 1), dtype=np.float32)).astype(dtype)

    peak_bw = 819e9
    modes = os.environ.get("MODES", "conv_dw,conv_dense,resize").split(",")
    for mode in modes:
        g1 = G.Generator(factors=((2, 2), (2, 2)), base_filters=32,
                         dtype=dtype, out_dtype=dtype, upsample_mode=mode)
        p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
        g2 = G.Generator(factors=((2, 1), (2, 1)), base_filters=32,
                         dtype=dtype, out_dtype=dtype, upsample_mode=mode)
        p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 64, 4)))

        def pass1(p, lr_, eps):
            return jnp.mean(
                assemble.pass1_volume(g1, p, lr_ + eps), dtype=jnp.float32)

        def pass2(p, it_, v_, eps):
            return jnp.mean(
                assemble.pass2_volume(g2, p, it_ + eps, v_),
                dtype=jnp.float32)

        for name, fn, args in (("pass1", pass1, (p1, lr)),
                               ("pass2", pass2, (p2, interm, lr_vel))):
            ms, by = time_chained(fn, args, n_iters)
            print(json.dumps({
                "program": name, "upsample_mode": mode,
                "ms_per_frame": round(ms, 3),
                "gbytes_per_frame": round(by / 1e9, 2),
                "hbm_bw_util": round(by / (ms / 1e3) / peak_bw, 4),
            }), flush=True)


if __name__ == "__main__":
    main()

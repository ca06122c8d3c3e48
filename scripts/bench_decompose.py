"""Decompose the two-pass 4x 64^3->256^3 inference program: where do the
bytes/time go? (full | pass-1 | pass-2 | pass-2-sans-staging) — the evidence
behind BASELINE.md's roofline-floor note (VERDICT r2 weak #1 resolution).

Measured on the real v5e (2026-08-19, N=50 chained frames):
  full_two_pass     29.35 ms  16.69 GB  69.4% HBM-BW
  pass1_only         5.98 ms   3.97 GB  81.1% HBM-BW
  pass2_only        23.74 ms  12.68 GB  65.2% HBM-BW
  pass2_apply_only  23.50 ms  12.32 GB  64.0% HBM-BW
Conclusions: staging (velocity resize + transposes) costs 0.24 ms (0.8%);
pass-1's identical conv recipe reaches 81% of peak BW, so the harness is not
the limiter; the residual headroom sits inside XLA's conv lowerings at
pass-2's slice shapes (256-slice batch, anisotropic h-only upsamples) — and
ops/s2d.py already documents that repacking/hand-rolled alternatives lose.
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

z = y = x = 64
up = 4
stages = 2
dtype = jnp.bfloat16
g1 = G.make_pass1(stages, 32, 2, dtype=dtype, out_dtype=dtype)
g2 = G.make_pass2(stages, 32, 2, dtype=dtype, out_dtype=dtype)
p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 64, 4)))
rng = np.random.default_rng(0)
lr = jnp.asarray(rng.random((z, y, x, 4), dtype=np.float32))
interm0 = jnp.asarray(rng.random((z, y * up, x * up, 1), dtype=np.float32)).astype(dtype)
n_iters = int(os.environ.get("N", "50"))

kind = jax.devices()[0].device_kind
peak_bw = 819e9 if "v5 lite" in kind else None


def timed(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    float(c(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / n_iters
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", 0)); by = float(ca.get("bytes accessed", 0))
    out = {"name": name, "ms_per_frame": round(dt * 1e3, 3),
           "gflops": round(fl / 1e9, 1), "gbytes": round(by / 1e9, 2),
           "ai": round(fl / max(by, 1), 1)}
    if peak_bw:
        out["hbm_bw_util"] = round(by / dt / peak_bw, 4)
        out["mfu"] = round(fl / dt / 197e12, 4)
    print(json.dumps(out), flush=True)
    return dt


def chain(body):
    def fn(*args):
        def step(_, acc):
            return acc + body(acc, *args)
        return jax.lax.fori_loop(0, n_iters, step, jnp.float32(0.0))
    return fn


# full two-pass (the bench.py program)
timed("full_two_pass", chain(
    lambda acc, p1_, p2_, lr_: jnp.mean(
        assemble.upscale_volume(g1, p1_, g2, p2_, lr_ + acc * 1e-30, up),
        dtype=jnp.float32)), p1, p2, lr)

# pass 1 only: 64 xy slices 64^2 -> 256^2
timed("pass1_only", chain(
    lambda acc, p1_, lr_: jnp.mean(
        assemble.pass1_volume(g1, p1_, lr_ + acc * 1e-30),
        dtype=jnp.float32)), p1, lr)

# pass 2 only: staging (vel resize + transpose) + 256 xz slices
timed("pass2_only", chain(
    lambda acc, p2_, it_, lr_: jnp.mean(
        assemble.pass2_volume(g2, p2_, it_ + acc * 1e-30,
                              lr_[..., 1:4]), dtype=jnp.float32)),
    p2, interm0, lr)

# pass-2 G apply alone on a pre-staged slice stack (no resize/transposes)
slices = jnp.transpose(
    jnp.concatenate([interm0, jax.image.resize(
        lr[..., 1:4].astype(dtype), (z, y * up, x * up, 3), "linear")],
        axis=-1), (1, 0, 2, 3))
timed("pass2_apply_only", chain(
    lambda acc, p2_, s_: jnp.mean(g2.apply(p2_, s_ + acc * 1e-30),
                                  dtype=jnp.float32)), p2, slices)

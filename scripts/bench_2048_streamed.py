#!/usr/bin/env python
"""Beyond-HBM-OUTPUT demo: one streamed two-pass 8x 256^3 -> 2048^3 frame on
one v5e chip (r5). A 2048^3 bf16 volume alone is 17 GB > the chip's 16 GB
HBM, so `upscale_volume` (which materializes its result on device) cannot
run it at ANY sliceChunk — `assemble.upscale_volume_streamed` computes
pass-2 one chunk at a time and assembles the final volume in host RAM
(34 GB f32), fetching chunk k while chunk k+1 computes.

Reports wall time and host-assembled voxel rate (the number includes every
device->host fetch through the axon tunnel — this is an end-to-end
capability measurement, not an on-device rate).

Usage: [RES=256] [CHUNK=64] [OUT=...] python scripts/bench_2048_streamed.py
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
    z = y = x = int(os.environ.get("RES", "128"))
    up, stages = 8, 3
    # chunk 128 is the lane-aligned regime (slice batch = 128 lanes): below
    # it XLA lays the C=1 head-conv output channel-in-lanes and tile-pads
    # chunk buffers 128x (8 GB at 2048^2 planes — the measured blocker that
    # keeps RES=256/2048^3 out of reach on one chip today; see the commit
    # message and BASELINE.md)
    chunk = int(os.environ.get("CHUNK", "128"))
    chunk1 = int(os.environ.get("CHUNK1", "128"))
    dtype = jnp.bfloat16
    g1 = G.make_pass1(stages, 32, 2, dtype=dtype, out_dtype=dtype,
                      skip_mode="conv_dense")
    g2 = G.make_pass2(stages, 32, 2, dtype=dtype, out_dtype=dtype,
                      skip_mode="conv_dense")
    p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16 * up, 4)))
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((z, y, x, 4), dtype=np.float32))

    t0 = time.perf_counter()
    out = assemble.upscale_volume_streamed(g1, p1, g2, p2, lr, up, chunk,
                                           chunk1=chunk1)
    wall = time.perf_counter() - t0
    assert out.shape == (z * up, y * up, x * up, 1), out.shape
    checksum = float(out.mean())
    voxels = out.size
    out_gb_dev = voxels * 2 / 1e9  # bf16 on device if it were materialized
    doc = {
        "program": f"STREAMED two-pass 8x {z}^3->{z * up}^3, chunk {chunk}, "
                   "bf16 compute, f32 host assembly (host-streamed pass-2: "
                   f"the {out_gb_dev:.1f} GB output is never materialized "
                   "in HBM)",
        "device": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        "wall_s": round(wall, 1),
        "gvox_per_s_incl_host_fetch": round(voxels / wall / 1e9, 4),
        "host_volume_gb_f32": round(out.nbytes / 1e9, 1),
        "checksum_mean": checksum,
        "finite": bool(np.isfinite(out).all()),
    }
    line = json.dumps(doc)
    print(line)
    outp = os.environ.get("OUT")
    if outp:
        with open(outp, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

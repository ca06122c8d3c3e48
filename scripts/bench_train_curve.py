#!/usr/bin/env python
"""Training-throughput CURVE on the real chip (VERDICT r4 weak #4 / next #7).

One steady-state `bench.train_point` measurement per (batch, tile) point of
the flagship adversarial recipe (pass-1 4x, temporal D, hinge + lazy R1 +
TTUR + EMA, bf16). The single BENCH_TRAIN point (b16 tile16, 28.1 steps/s)
cannot distinguish a hardware floor from a recipe choice; the curve says
which axis moves steps/s (and samples/s) and which doesn't — the recipe
designer's throughput map.

Writes one JSON object with every point to the output path (default
BENCH_TRAIN_CURVE_r05.json, committed so scratch wipes can't orphan it).

Run: python scripts/bench_train_curve.py [out.json]   (real TPU, ~10 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()
setup_compilation_cache()

POINTS = [  # (batch, tile)
    (16, 16), (64, 16), (256, 16),   # batch axis at the flagship tile
    (16, 32), (64, 32),              # tile axis (tile32 = 4x the pixels/sample)
]


def main():
    import jax

    import bench

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_TRAIN_CURVE_r05.json"
    results = []
    for batch, tile in POINTS:
        t0 = time.time()
        r = bench.train_point(batch=batch, tile=tile)
        r["wall_s"] = round(time.time() - t0, 1)
        results.append(r)
        print(f"b{batch} tile{tile}: {r['value']} steps/s "
              f"({r['samples_per_sec']} samples/s, K={r['steps_per_dispatch']})",
              flush=True)
        # write after EVERY point: cold remote compiles cost tens of minutes
        # per point on this tunnel, and a partial curve must survive a kill
        doc = {
            "metric": "train steps/sec vs (batch, tile), flagship 4x GAN recipe",
            "platform": jax.devices()[0].platform,
            "device_kind": jax.devices()[0].device_kind,
            "points": results,
        }
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({"written": out_path, "n_points": len(results)}))


if __name__ == "__main__":
    main()

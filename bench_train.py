#!/usr/bin/env python
"""Training-throughput benchmark entry point (VERDICT r2 missing #3).

Thin wrapper: runs bench.py in MPGAN_BENCH_MODE=train under the same
probe/retry/CPU-fallback supervisor. Prints one JSON line with steps/sec,
samples/sec, and roofline fields for the fused adversarial train step
(see bench.main_train for the exact config).
"""

import os
import sys

os.environ["MPGAN_BENCH_MODE"] = "train"

if __name__ == "__main__":
    import bench

    if os.environ.get("MPGAN_BENCH_CHILD"):
        bench.main_train()
    else:
        sys.exit(bench._supervise())

#!/bin/bash
# Diverse-scene training + OOD generalization recipe (VERDICT r2 missing #4).
#
# Generates a RANDOMIZED-scene 4x dataset (per-sim inflow/buoyancy/vorticity/
# obstacles — solver/datagen.varied_plume_scene), trains the two-pass L1
# chain on sims 3000-3007, and evaluates on:
#   - sim_3008  (ID holdout: same 'varied' family, unseen seed)
#   - sim_3020  (OOD: 'moving' family — obstacle orbiting through the plume)
#   - sim_3021  (OOD: 'varied-dual' family — two merging inflows)
# Neither OOD family ever appears in training. Every stage is restartable
# (skipExisting / resumeLatest / retryOnError).
#
# Results (real v5e, completed 2026-08-20): BASELINE.md "Diverse-scene
# training + OOD generalization" table; raw JSON .datad/diverse_eval.jsonl;
# trained pair bundled as examples/checkpoints/g1_div + g2_div and gated by
# tests/test_quality.py (PSNR/SSIM/tdiff on the bundled sim_3020 frames).
set -eu
cd "$(dirname "$0")/.."
B=".datad/"
GEN="timeout 5400 python scripts/datagen.py basePath $B resHigh 64 upRes 4 frames 48 warmup 8 pressureSolver cg skipExisting 1 retryOnError 8 hangTimeout 600"
$GEN fromSim 3000 toSim 3008 scene varied
$GEN fromSim 3020 toSim 3020 scene moving
$GEN fromSim 3021 toSim 3021 scene varied-dual

# resumeIndex pins each stage to its run dir and makes it restartable
# ACROSS script reruns (not just within one supervisor's retry budget):
# a rerun resumes pass-1 IN test_0000 / pass-2 IN test_0001, a stage that
# died before its first save restarts from scratch into its own (dead)
# dir, and a COMPLETED stage exits immediately without loading the dataset
# — so the eval's pinned test 0/1 indices always hold. (resumeLatest's
# newest-same-pass scan is the crash-recovery default but the wrong tool
# for recipes: it can land on a different run than the one a stage owns.)
T="python scripts/multipass_gan.py out 0 basePath $B fromSim 3000 toSim 3007 \
   frameMin 0 frameMax 48 upRes 4 tileSizeLow 12 useVelocities 1 \
   batchSize 16 useTempoD 0 kAdv 0 kt 0 kf 0 testPath ${B}runs/ randSeed 42 \
   saveInterval 2000 outputInterval 1000 retryOnError 6 hangTimeout 600"
# pass 1 (xy SR), pure L1            -> ${B}runs/test_0000
$T resumeIndex 0 firstNN 1 trainingIters 12000
# pass 2 (z refinement) on frozen G1 -> ${B}runs/test_0001
$T resumeIndex 1 firstNN 0 pass2Source g1 load_model_test 0 load_model_no -1 trainingIters 12000

E="python scripts/eval.py basePath $B frameMin 8 frameMax 48 upRes 4 \
   tileSizeLow 12 useVelocities 1 testPath ${B}runs/ \
   load_model_test 0 load_model_no -1 load_model_test2 1 load_model_no2 -1"
OUT=${1:-.datad/diverse_eval.jsonl}
: > "$OUT"
for row in "id_varied 3008" "ood_moving 3020" "ood_dual 3021"; do
  set -- $row
  echo "EVAL $1 (sim $2)" >&2
  line=$(JAX_PLATFORMS=cpu timeout 3600 $E fromSim $2 toSim $2 | tail -1)
  echo "{\"config\": \"4x_twopass_l1_diverse_$1\", \"result\": $line}" >> "$OUT"
done
cat "$OUT"
echo DIVERSE_RECIPE_DONE

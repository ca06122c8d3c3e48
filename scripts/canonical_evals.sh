#!/bin/bash
# Canonical-holdout quality table (BASELINE.md): every trained config is
# evaluated on ONE fixed held-out simulation per upscale factor so PSNR/tdiff
# numbers are directly comparable across configs (VERDICT r1 weak #3).
#
#   4x: sim_1010 of .data  (32^3 -> 128^3, frames 8..48, trilinear 28.04 dB)
#   8x: sim_2010 of .data8 (16^3 -> 128^3, frames 8..48, trilinear 25.03 dB)
#
# Holdouts are the last sim of each datagen range and are never in any
# training set (trainings use fromSim..toSim-1). CPU backend for consistency
# (the TPU may be training); scripts/eval.py prints one JSON line per run.
#
# Checkpoint run/model numbers below are the round-2 runs on this box; when
# retraining, update them to match `testPath` contents.
#
# r3 NOTE: the .data/.data8 scratch (datasets + all r2 run dirs) was wiped
# between rounds — these rows need their datasets regenerated and configs
# retrained before they reproduce (numbers preserved in BASELINE.md).
# The r3 diverse-scene + OOD-generalization table is produced by
# scripts/diverse_recipe.sh (restartable end-to-end: datagen → two-pass L1
# training → ID/OOD holdout evals).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-.data/canonical_eval.jsonl}
: > "$OUT"

run() {
  label="$1"; shift
  echo "RUN $label" >&2
  line=$(JAX_PLATFORMS=cpu timeout 3600 python scripts/eval.py "$@" 2>/tmp/eval_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"config\": \"$label\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"config\": \"$label\", \"error\": true}" >> "$OUT"
    tail -5 /tmp/eval_err.log >&2
  fi
}

E4="basePath .data/ fromSim 1010 toSim 1010 frameMin 8 frameMax 48 upRes 4 tileSizeLow 16 useVelocities 1"
E8="basePath .data8/ fromSim 2010 toSim 2010 frameMin 8 frameMax 48 upRes 8 tileSizeLow 16 useVelocities 1"

run "4x_g1_l1"              $E4 testPath .data/l1long/  load_model_test 0 load_model_no 6
run "4x_twopass_l1"         $E4 testPath .data/l1long/  load_model_test 0 load_model_no 6 load_model_test2 1 load_model_no2 6
run "4x_twopass_ganft"      $E4 testPath .data/l1long/  load_model_test 2 load_model_no 4 load_model_test2 1 load_model_no2 6
run "4x_twopass_ganscratch" $E4 testPath .data/ganexp3/ load_model_test 0 load_model_no 7 load_model_test2 1 load_model_no2 7
run "4x_threepass_l1p3"     $E4 testPath .data/l1long/  load_model_test 0 load_model_no 6 load_model_test2 1 load_model_no2 6 load_model_test3 3 load_model_no3 4
run "8x_g1_l1"              $E8 testPath .data8/l1long8/ load_model_test 0 load_model_no 6
run "8x_twopass_l1"         $E8 testPath .data8/l1long8/ load_model_test 0 load_model_no 6 load_model_test2 1 load_model_no2 6
run "8x_twopass_ganft"      $E8 testPath .data8/l1long8/ load_model_test 2 load_model_no 4 load_model_test2 1 load_model_no2 6
run "8x_twopass_ganscratch" $E8 testPath .data8/ganexp2/ load_model_test 1 load_model_no 7 load_model_test2 2 load_model_no2 7
run "8x_threepass_gan_l1p3" $E8 testPath .data8/ganexp2/ load_model_test 1 load_model_no 7 load_model_test2 2 load_model_no2 7 load_model_test3 4 load_model_no3 4
run "8x_threepass_gan_advp3" $E8 testPath .data8/ganexp2/ load_model_test 1 load_model_no 7 load_model_test2 2 load_model_no2 7 load_model_test3 3 load_model_no3 4

# r2: GAN fine-tunes retrained with lazy R1 (r1Interval 16) + emaDecay 0.999;
# the _ema rows evaluate the averaged generator (useEma 1) of the SAME runs
run "4x_twopass_ganft_lazyr1"     $E4 testPath .data/l1long/   load_model_test 4 load_model_no 4 load_model_test2 1 load_model_no2 6
run "4x_twopass_ganft_lazyr1_ema" $E4 testPath .data/l1long/   load_model_test 4 load_model_no 4 load_model_test2 1 load_model_no2 6 useEma 1
run "8x_twopass_ganft_lazyr1"     $E8 testPath .data8/l1long8/ load_model_test 3 load_model_no 4 load_model_test2 1 load_model_no2 6
run "8x_twopass_ganft_lazyr1_ema" $E8 testPath .data8/l1long8/ load_model_test 3 load_model_no 4 load_model_test2 1 load_model_no2 6 useEma 1

echo EVALS_DONE

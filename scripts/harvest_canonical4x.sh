#!/bin/bash
# Harvest the 4x half of the canonical table mid-recipe (r4): evaluate the
# completed run dirs of scripts/canonical_recipe.sh's 4x chain on the pinned
# holdout (sim_1010), and bundle the generator checkpoints into
# examples/checkpoints/ so the results survive a scratch wipe (the .data*
# dirs have been wiped between rounds twice; bundled orbax generator dirs
# are ~60 KB each). Skips configs whose runs are incomplete — safe to run
# at any point; rerunning overwrites the same outputs.
#
# Usage: bash scripts/harvest_canonical4x.sh [out.jsonl]
set -eu
cd "$(dirname "$0")/.."
OUT=${1:-.data/canonical_eval4x_r04.jsonl}
E4="basePath .data/ fromSim 1010 toSim 1010 frameMin 8 frameMax 48 upRes 4 \
    tileSizeLow 16 useVelocities 1 testPath .data/runs4c/"

done_run() {  # done_run <idx> -> 0 iff run test_<idx> completed its budget
  python - "$1" <<'PY'
import json, os, sys
idx = int(sys.argv[1])
rd = f".data/runs4c/test_{idx:04d}"
if not os.path.isdir(rd):
    sys.exit(1)
models = sorted(int(d.split("_")[1]) for d in os.listdir(rd)
                if d.startswith("model_") and not d.endswith(".json"))
if not models:
    sys.exit(1)
meta = json.load(open(os.path.join(rd, f"model_{models[-1]:04d}.json")))
total = int(meta.get("total_iters", 1 << 30))
sys.exit(0 if int(meta.get("it", -1)) >= total else 1)
PY
}

run_eval() {  # run_eval <label> <needs...> -- <eval args...>
  local label=$1; shift
  local needs=()
  while [ "$1" != "--" ]; do needs+=("$1"); shift; done; shift
  for idx in "${needs[@]}"; do
    if ! done_run "$idx"; then
      echo "HARVEST $label: run test_$idx incomplete — skipped" >&2
      return 0
    fi
  done
  echo "HARVEST eval $label" >&2
  local line
  line=$(JAX_PLATFORMS=cpu timeout 5400 python scripts/eval.py $E4 "$@" \
         2>/tmp/harvest_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"config\": \"4x_$label\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"config\": \"4x_$label\", \"error\": true}" >> "$OUT"
    tail -5 /tmp/harvest_err.log >&2
  fi
}

: > "$OUT"
run_eval g1_l1              0 -- load_model_test 0 load_model_no -1
run_eval twopass_l1         0 1 -- load_model_test 0 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1
run_eval twopass_ganft_lazyr1 2 1 -- load_model_test 2 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1
run_eval twopass_ganft_lazyr1_ema 2 1 -- load_model_test 2 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1 useEma 1
run_eval twopass_ganscratch 3 4 -- load_model_test 3 load_model_no -1 \
    load_model_test2 4 load_model_no2 -1
run_eval threepass_l1p3     0 1 5 -- load_model_test 0 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1 load_model_test3 5 load_model_no3 -1
cat "$OUT"

# bundle the generator checkpoints that back the rows (survives scratch
# wipes; tests/test_quality.py-style gates can pin them). The need-set is
# keyed on EVERY row that used a run index (ADVICE r4: the old logic lost
# run 0 when only g1_l1 evaluated, and run 2 when only the non-ema ganft
# row did); the ema row additionally bundles the gen_ema checkpoint.
python - "$OUT" <<'PY'
import json, os, shutil, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
ok = {r["config"] for r in rows if "result" in r}
runs = {0: "g1_l1_4x", 1: "g2_l1_4x", 2: "g1_ganft_4x",
        3: "g1_scratch_4x", 4: "g2_scratch_4x", 5: "g3_l1p3_4x"}
# mirror run_eval's needs lists exactly
row_needs = {"4x_g1_l1": {0}, "4x_twopass_l1": {0, 1},
             "4x_twopass_ganft_lazyr1": {2, 1},
             "4x_twopass_ganft_lazyr1_ema": {2, 1},
             "4x_twopass_ganscratch": {3, 4},
             "4x_threepass_l1p3": {0, 1, 5}}
need = set()
for label, idxs in row_needs.items():
    if label in ok:
        need |= idxs

def bundle(rd, prefix, dst_name):
    # exact prefix + digits: "gen_" must not match "gen_ema_0003"
    models = sorted(int(d[len(prefix):]) for d in os.listdir(rd)
                    if d.startswith(prefix) and d[len(prefix):].isdigit())
    if not models:
        return
    src = os.path.join(rd, f"{prefix}{models[-1]:04d}")
    dst = os.path.join("examples/checkpoints", dst_name)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    meta = json.load(open(os.path.join(rd, f"model_{models[-1]:04d}.json")))
    with open(dst + ".json", "w") as f:
        json.dump(meta, f)
    print("bundled", dst, f"({meta.get('it')} iters)")

for idx in sorted(need):
    rd = f".data/runs4c/test_{idx:04d}"
    bundle(rd, "gen_", runs[idx])
if "4x_twopass_ganft_lazyr1_ema" in ok:
    bundle(".data/runs4c/test_0002", "gen_ema_", "g1_ganft_ema_4x")
PY
echo HARVEST_DONE

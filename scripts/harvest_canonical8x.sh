#!/bin/bash
# Harvest the 8x half of the canonical table mid-recipe (r5): evaluate the
# COMPLETED run dirs of scripts/canonical_recipe.sh's 8x chain on the pinned
# holdout (sim_2010) without waiting for the whole chain, and bundle the
# generator checkpoints into examples/checkpoints/ so results survive a
# scratch wipe. Rows land in the recipe's own OUT file with the recipe's
# labels, so the recipe's final (idempotent) eval pass skips them.
# Safe to run at any point; already-landed rows are skipped.
#
# Usage: bash scripts/harvest_canonical8x.sh [out.jsonl]
set -eu
cd "$(dirname "$0")/.."
OUT=${1:-.data/canonical_eval_r04.jsonl}
E8="basePath .data8/ fromSim 2010 toSim 2010 frameMin 8 frameMax 48 upRes 8 \
    tileSizeLow 16 useVelocities 1 testPath .data8/runs8c/"

done_run() {  # done_run <idx> -> 0 iff run test_<idx> completed its budget
  python - "$1" <<'PY'
import json, os, sys
idx = int(sys.argv[1])
rd = f".data8/runs8c/test_{idx:04d}"
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
  if grep -q "\"config\": \"$label\", \"result\"" "$OUT" 2>/dev/null; then
    echo "HARVEST $label: already landed, skipping" >&2
    return 0
  fi
  for idx in "${needs[@]}"; do
    if ! done_run "$idx"; then
      echo "HARVEST $label: run test_$idx incomplete — skipped" >&2
      return 0
    fi
  done
  echo "HARVEST eval $label" >&2
  local line
  line=$(JAX_PLATFORMS=cpu timeout 7200 python scripts/eval.py $E8 "$@" \
         2>/tmp/harvest8_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"config\": \"$label\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"config\": \"$label\", \"error\": true}" >> "$OUT"
    tail -5 /tmp/harvest8_err.log >&2
  fi
}

touch "$OUT"
run_eval 8x_g1_l1              0 -- load_model_test 0 load_model_no -1
run_eval 8x_twopass_l1         0 1 -- load_model_test 0 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1
run_eval 8x_twopass_ganft_lazyr1 2 1 -- load_model_test 2 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1
run_eval 8x_twopass_ganft_lazyr1_ema 2 1 -- load_model_test 2 \
    load_model_no -1 load_model_test2 1 load_model_no2 -1 useEma 1
run_eval 8x_twopass_ganscratch 3 4 -- load_model_test 3 load_model_no -1 \
    load_model_test2 4 load_model_no2 -1
run_eval 8x_threepass_l1p3     0 1 5 -- load_model_test 0 load_model_no -1 \
    load_model_test2 1 load_model_no2 -1 load_model_test3 5 load_model_no3 -1
grep "8x_" "$OUT" || true

# bundle the generator checkpoints that back landed rows (same need-set
# policy as harvest_canonical4x.sh: every row that used a run index)
python - "$OUT" <<'PY'
import json, os, shutil, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
ok = {r["config"] for r in rows if "result" in r}
runs = {0: "g1_l1_8x", 1: "g2_l1_8x", 2: "g1_ganft_8x",
        3: "g1_scratch_8x", 4: "g2_scratch_8x", 5: "g3_l1p3_8x"}
row_needs = {"8x_g1_l1": {0}, "8x_twopass_l1": {0, 1},
             "8x_twopass_ganft_lazyr1": {2, 1},
             "8x_twopass_ganft_lazyr1_ema": {2, 1},
             "8x_twopass_ganscratch": {3, 4},
             "8x_threepass_l1p3": {0, 1, 5}}
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
    bundle(f".data8/runs8c/test_{idx:04d}", "gen_", runs[idx])
if "8x_twopass_ganft_lazyr1_ema" in ok:
    bundle(".data8/runs8c/test_0002", "gen_ema_", "g1_ganft_ema_8x")
PY
echo HARVEST8_DONE

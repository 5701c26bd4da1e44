#!/bin/bash
# Round-5 serial TPU queue, take 4: the shutdown joint pose+field BA A/B
# against the residual online-vs-ceiling gap (post-fix study gaps:
# 0.72 / 1.60 / 1.11 dB on seeds 0-2 vs the leakage-free holdout ceilings).
# The GT-pose probe showed EVAL poses are solved; the suspect is residual
# supervision-pose noise that the mid-run geometric rewrite cannot see —
# joint photometric BA (runtime/manager.py _joint_ba) is the built-but-
# never-A/B'd lever for exactly that.
# Waits for queue3's TPU work to finish first. All stages resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# serialize against queue3 (single TPU chip)
while [ -f /tmp/r5_queue3.pid ] && kill -0 "$(cat /tmp/r5_queue3.pid)" 2>/dev/null; do
  sleep 60
done

run_demo() {  # out_dir extra_env...
  local OUT="$1"; shift
  if [ -f "$OUT/eval.json" ]; then echo "== $OUT already done =="; return; fi
  if [ -f "$OUT/server.pid" ]; then
    kill "$(cat "$OUT/server.pid")" 2>/dev/null || true
    sleep 2; kill -9 "$(cat "$OUT/server.pid")" 2>/dev/null || true
    rm -f "$OUT/server.pid"
  fi
  env "$@" ROMAP_DEMO_SPARSE_DEPTH=1 ROMAP_DENSE_VIEWS=1 ROMAP_NO_VIDEO=1 \
    timeout -k 30 2100 examples/run_online_demo.sh "$OUT" 300 tpu \
    || echo "(run failed: $OUT)"
  [ -f "$OUT/eval.json" ] && python -c "
import json; d = json.load(open('$OUT/eval.json'))
print('$OUT:', json.dumps(d.get('aggregate', {})))"
}

# joint-BA A/B on the two largest-gap seeds first, then seed 0
for SEED in 1 2 0; do
  run_demo "output/seed_study_r5jba/dense_seed$SEED" \
    ROMAP_DEMO_SEED=$SEED ROMAP_DEMO_JOINT_BA=500
done

for SEED in 1 2 0; do
  OUT="output/seed_study_r5jba/dense_seed$SEED"
  [ -f "$OUT/eval.json" ] && python - "$OUT" "$SEED" <<'EOF'
import json, sys, os
out, seed = sys.argv[1], int(sys.argv[2])
d = json.load(open(os.path.join(out, "eval.json")))
row = {"mode": "dense+jba500", "seed": seed,
       "psnr_db": d["aggregate"]["mean_psnr_db"],
       "mask_iou": d["aggregate"]["mean_mask_iou"]}
path = "output/seed_study_r5jba/study.jsonl"
rows = []
if os.path.exists(path):
    rows = [json.loads(l) for l in open(path)]
if not any(r["seed"] == seed and r["mode"] == row["mode"] for r in rows):
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")
print(row)
EOF
done

echo "r5 queue4 done"

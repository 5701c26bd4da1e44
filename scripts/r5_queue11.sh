#!/bin/bash
# Round-5 serial TPU queue, take 11: complete the shutdown-polish study.
# Queue10 found seed 0 budget-limited: +8 polish waves (final_waves 9,
# +2400 iters on the final BA-refined pose graph) took it 23.68 ->
# 24.83 dB (gap 1.95 -> 0.80). Pose noise slows convergence, and the
# angle-gated wave credit under-budgets low-texture objects. Measure
# seeds 1/2 at the same setting for the full ceiling-normalized table
# (VERDICT item 1's 0.75 dB criterion is judged on the 3-seed mean).
# Waits for queue10. Resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue10.pid /tmp/r5_queue9.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

for SEED in 1 2; do
  OUT="output/seed_study_r5budget/dense_seed$SEED"
  [ -f "$OUT/eval.json" ] && { echo "== $OUT done =="; continue; }
  if [ -f "$OUT/server.pid" ]; then
    kill "$(cat "$OUT/server.pid")" 2>/dev/null || true
    sleep 2; kill -9 "$(cat "$OUT/server.pid")" 2>/dev/null || true
    rm -f "$OUT/server.pid"
  fi
  env ROMAP_DEMO_SEED=$SEED ROMAP_DEMO_SPARSE_DEPTH=1 ROMAP_DENSE_VIEWS=1 \
    ROMAP_NO_VIDEO=1 timeout -k 30 2100 examples/run_online_demo.sh \
    "$OUT" 300 tpu 1 9 || echo "(run failed: $OUT)"
  [ -f "$OUT/eval.json" ] && python -c "
import json; d = json.load(open('$OUT/eval.json'))
print('seed$SEED +8 polish waves:', json.dumps(d.get('aggregate', {})))"
done

python - <<'EOF'
import json, os
ceil = {0: 25.63, 1: 22.99, 2: 24.20}
rows = []
for s in (0, 1, 2):
    p = f"output/seed_study_r5budget/dense_seed{s}/eval.json"
    if os.path.exists(p):
        a = json.load(open(p))["aggregate"]
        rows.append((s, a["mean_psnr_db"], round(ceil[s] - a["mean_psnr_db"], 2)))
print("polish study:", rows)
if len(rows) == 3:
    print("mean gap:", round(sum(r[2] for r in rows) / 3, 3))
EOF

echo "r5 queue11 done"

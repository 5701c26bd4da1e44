#!/bin/bash
# Round-5 serial TPU queue, take 10: seed-0 budget-sensitivity A/B.
# Seed 0 carries the study's largest gap (1.95 dB) AND the smallest
# earned wave budget (18 vs 25-27: its low-texture object is detected in
# fewer keyframes, so the angle-gated flushes credit fewer waves). Its
# retrain budget (5400 iters) still exceeds the ceiling's 5000, so the
# pose-cost attribution predicts extra budget changes little. Test it:
# same run + 8 extra shutdown polish waves (final_waves 9 = +2400 iters).
# If PSNR moves >= ~0.3 dB the gap is partially budget-limited; if not,
# the attribution stands pure.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue9.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

OUT=output/seed_study_r5budget/dense_seed0
if [ ! -f "$OUT/eval.json" ]; then
  if [ -f "$OUT/server.pid" ]; then
    kill "$(cat "$OUT/server.pid")" 2>/dev/null || true
    sleep 2; kill -9 "$(cat "$OUT/server.pid")" 2>/dev/null || true
    rm -f "$OUT/server.pid"
  fi
  env ROMAP_DEMO_SEED=0 ROMAP_DEMO_SPARSE_DEPTH=1 ROMAP_DENSE_VIEWS=1 \
    ROMAP_NO_VIDEO=1 timeout -k 30 2100 examples/run_online_demo.sh \
    "$OUT" 300 tpu 1 9 || echo "(run failed: $OUT)"
fi
[ -f "$OUT/eval.json" ] && python -c "
import json; d = json.load(open('$OUT/eval.json'))
print('seed0 +8 polish waves:', json.dumps(d.get('aggregate', {})),
      '(control 23.68 / 0.9866, ceiling 25.63)')"

echo "r5 queue10 done"

#!/bin/bash
# Round-5 serial TPU queue, take 5: clean seed-0 control re-run. The r5b
# seed-0 control hit the cold-compile UPDATE_VOLUME stall (watchdog at
# 609 s): the frontend kept tracking while uploads blocked, so the slot
# earned only 14 waves (vs 25 on seeds 1-2) and shipped 9/19 eval views —
# its 24.91 dB is an underestimate of the post-fix pipeline. With the
# persistent XLA compile cache landed, re-measure seed 0 cleanly.
# Waits for queue4. Resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue4.pid /tmp/r5_queue3.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

OUT=output/seed_study_r5c/dense_seed0
if [ ! -f "$OUT/eval.json" ]; then
  if [ -f "$OUT/server.pid" ]; then
    kill "$(cat "$OUT/server.pid")" 2>/dev/null || true
    sleep 2; kill -9 "$(cat "$OUT/server.pid")" 2>/dev/null || true
    rm -f "$OUT/server.pid"
  fi
  env ROMAP_DEMO_SEED=0 ROMAP_DEMO_SPARSE_DEPTH=1 ROMAP_DENSE_VIEWS=1 \
    ROMAP_NO_VIDEO=1 timeout -k 30 2100 examples/run_online_demo.sh \
    "$OUT" 300 tpu || echo "(run failed: $OUT)"
fi
[ -f "$OUT/eval.json" ] && python -c "
import json; d = json.load(open('$OUT/eval.json'))
print('seed0 clean control:', json.dumps(d.get('aggregate', {})))"

echo "r5 queue5 done"

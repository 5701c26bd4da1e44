#!/bin/bash
# Round-5 serial TPU queue, take 8:
#  1. boxnoise online re-run on a QUIET box. The queue6 re-run's SLAM
#     tracking diverged (ATE 0.924 vs 0.0144, RPE 9.4 deg) because the
#     builder session's CPU work shared the single core and shifted the
#     async tracker/mapper interleaving; tracking-only replays of the same
#     dataset are deterministic at ATE 0.0139 (x3). Keep the diverged run
#     for the variance record.
#  2. MX_SNAP=1 end-to-end online validation (seed 1) ahead of the
#     default flip: the snap encoding benches 936 obj-iters/s with a
#     PASSING 3-seed parity gate (gap 0.052 dB); this checks the full
#     online pipeline (manager, volume updates, retrain, eval) on the
#     folded basis against the 21.39 dB unsnapped row.
# Waits for queue7. Resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue7.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

OUT=output/adversarial_r5/boxnoise_online
if [ -f "$OUT/eval.json" ] && [ ! -d output/adversarial_r5/boxnoise_online_diverged ]; then
  mv "$OUT" output/adversarial_r5/boxnoise_online_diverged
fi
scripts/adversarial_study.sh output/adversarial_r5 boxnoise

SOUT=output/seed_study_r5snap/dense_seed1
if [ ! -f "$SOUT/eval.json" ]; then
  if [ -f "$SOUT/server.pid" ]; then
    kill "$(cat "$SOUT/server.pid")" 2>/dev/null || true
    sleep 2; kill -9 "$(cat "$SOUT/server.pid")" 2>/dev/null || true
    rm -f "$SOUT/server.pid"
  fi
  env MX_SNAP=1 ROMAP_DEMO_SEED=1 ROMAP_DEMO_SPARSE_DEPTH=1 \
    ROMAP_DENSE_VIEWS=1 ROMAP_NO_VIDEO=1 timeout -k 30 2100 \
    examples/run_online_demo.sh "$SOUT" 300 tpu \
    || echo "(snap online run failed)"
fi
[ -f "$SOUT/eval.json" ] && python -c "
import json; d = json.load(open('$SOUT/eval.json'))
print('snap online seed1:', json.dumps(d.get('aggregate', {})),
      '(unsnapped row: 21.39 / 0.9898)')"

echo "r5 queue8 done"

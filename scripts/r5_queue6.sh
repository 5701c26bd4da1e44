#!/bin/bash
# Round-5 serial TPU queue, take 6: clean boxnoise re-run. The original
# boxnoise online run hit the UPDATE_VOLUME cold-compile stall (watchdog
# at 605 s, 14/25-ish waves earned, 11/17 eval views before the 2100 s
# timeout) — same failure mode as the r5b seed-0 control, and the only
# adversarial scene that ran with a cold XLA compile cache. Its 19.53 dB
# (gap 2.69) is an underestimate. Re-run the online half on the warm
# cache; the study script replaces the stale row and keeps the existing
# leakage-free ceiling (dataset regeneration is seed-deterministic).
# Waits for queue5. Resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue5.pid /tmp/r5_queue4.pid /tmp/r5_queue3.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

OUT=output/adversarial_r5/boxnoise_online
if [ -f "$OUT/eval.json" ] && [ ! -d output/adversarial_r5/boxnoise_online_stalled ]; then
  # preserve the stalled artifacts for the record, force a fresh online run
  mv "$OUT" output/adversarial_r5/boxnoise_online_stalled
fi
scripts/adversarial_study.sh output/adversarial_r5 boxnoise

echo "r5 queue6 done"

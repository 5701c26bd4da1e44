#!/bin/bash
# Round-5 serial TPU queue, take 9: re-measure the four adversarial
# online runs at HEAD — the up-aligned cuboid frames + cloud-yaw +
# cross-term silhouette correction (commit ba1743b) change the SLAM
# cuboids and therefore the NeRF training volumes for non-spherical
# objects (tracking-only ext_err_max: clean box 0.72->0.34, boxnoise
# 0.80->0.34). Ceilings are offline GT-pose runs — unchanged. The room
# seed-study numbers are sphere scenes (isotropic extents, frame
# rotation is a no-op on their volumes) and stay valid.
# Previous online runs preserved as *_online_prefix for the record.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue8.pid /tmp/r5_queue7.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

for SC in concave boxnoise compound exposure; do
  OUT="output/adversarial_r5/${SC}_online"
  if [ -f "$OUT/eval.json" ] && [ ! -d "${OUT}_prefix" ]; then
    mv "$OUT" "${OUT}_prefix"
  fi
done
scripts/adversarial_study.sh output/adversarial_r5

echo "r5 queue9 done"

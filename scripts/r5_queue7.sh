#!/bin/bash
# Round-5 serial TPU queue, take 7: supervision-pose-cost probe.
# ceiling(SLAM poses) vs ceiling(GT poses) on the same images/schedule —
# the last unattributed variable behind the residual online-vs-ceiling
# gap (see scripts/slam_pose_ceiling.py docstring). MX_SNAP=0 pins the
# unsnapped flagship so the numbers compare against the existing
# ceiling_r5_seedN records regardless of any later default flip.
# Waits for queue6. Resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

for Q in /tmp/r5_queue8.pid /tmp/r5_queue6.pid /tmp/r5_queue5.pid; do
  while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do sleep 60; done
done

for SEED in 1 2 0; do
  OUT="output/slam_pose_ceiling_seed$SEED"
  RUN="output/seed_study_r5b/dense_seed$SEED"
  [ -f "$OUT/eval.json" ] && { echo "== $OUT done =="; continue; }
  mkdir -p "$OUT"
  python scripts/slam_pose_ceiling.py "$RUN" "$OUT" || continue
  env MX_SNAP=0 timeout -k 30 2400 python -m romap_tpu.runtime.offline - \
    "$OUT/dataset" 0 --out "$OUT" --no-video --holdout 4 \
    > "$OUT/offline.log" 2>&1 || echo "(offline failed: seed $SEED)"
  python -m romap_tpu.utils.eval_psnr "$OUT" "$OUT/dataset" \
    --json "$OUT/eval.json" || true
  python - "$SEED" <<'EOF'
import json, sys
seed = sys.argv[1]
d = json.load(open(f"output/slam_pose_ceiling_seed{seed}/eval.json"))
c = json.load(open(f"output/ceiling_r5_seed{seed}/eval.json"))
print(f"seed {seed}: slam-pose ceiling {d['aggregate']['mean_psnr_db']} "
      f"vs GT-pose ceiling {c['aggregate']['mean_psnr_db']} "
      f"(pose cost {c['aggregate']['mean_psnr_db'] - d['aggregate']['mean_psnr_db']:.2f} dB)")
EOF
done

echo "r5 queue7 done"

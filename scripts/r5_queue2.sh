#!/bin/bash
# Round-5 serial TPU queue, take 2 — reordered after the wave-budget fix
# (lifetime earned credit) landed mid-round: the post-fix seed study and
# its leakage-free ceilings are the headline and run FIRST; everything
# else follows in VERDICT priority order. All stages resumable.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# 1. post-fix 3-seed dense online study (r5a is the pre-fix record)
scripts/seed_study.sh output/seed_study_r5b dense 0 1 2

# 2. post-fix attribution control: seed 0, mid-run rewrite off
if [ ! -f output/seed_study_r5bctl/dense_seed0/eval.json ]; then
  if [ -f output/seed_study_r5bctl/dense_seed0/server.pid ]; then
    kill "$(cat output/seed_study_r5bctl/dense_seed0/server.pid)" 2>/dev/null || true
    sleep 2; rm -f output/seed_study_r5bctl/dense_seed0/server.pid
  fi
  env ROMAP_MIDRUN_POSES=0 ROMAP_DEMO_SEED=0 ROMAP_DEMO_SPARSE_DEPTH=1 \
    ROMAP_DENSE_VIEWS=1 ROMAP_NO_VIDEO=1 timeout -k 30 1500 \
    examples/run_online_demo.sh output/seed_study_r5bctl/dense_seed0 300 tpu \
    || echo "(control run failed)"
fi

# 3. leakage-free offline GT-pose ceilings on the same datasets
scripts/r5_ceilings.sh 0 1 2

# 4. adversarial scenes (online + holdout ceilings)
scripts/adversarial_study.sh output/adversarial_r5

# 5. hashgrid parity anchors, seeds 1-2
python scripts/quality_hashgrid_tpu.py --seed 1 || true
python scripts/quality_hashgrid_tpu.py --seed 2 || true

# 6. three-seed flagship parity gate
python scripts/quality_gate.py || true

# 7. BASELINE config #2 refresh: 10-object RGB-only offline
C2="output/config2_r5"
if [ ! -f "$C2/eval.json" ]; then
  mkdir -p "$C2"
  python -c "
from romap_tpu.data.world import write_room_dataset
write_room_dataset('$C2/dataset', n_objects=10, seed=0)
print('dataset done')"
  timeout -k 30 3600 python -m romap_tpu.runtime.offline - "$C2/dataset" 0 \
    --out "$C2" --no-video > "$C2/offline.log" 2>&1 \
    || echo "(config2 run failed)"
  python -m romap_tpu.utils.eval_psnr "$C2" "$C2/dataset" \
    --json "$C2/eval.json" || true
  grep -m3 train_time "$C2/offline.log" || true
fi

# 8. snap_levels speed + parity A/B
scripts/r5_snap_ab.sh

echo "r5 queue2 done"

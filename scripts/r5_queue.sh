#!/bin/bash
# Round-5 serial TPU work queue (one device — runs must not overlap):
#  1. 3-seed dense online study on the new pipeline (incremental frame
#     store + mid-run pose rewrite) + a midrun-off control for attribution
#  2. adversarial-scene study (online + offline ceilings)
#  3. hashgrid parity anchors for seeds 1,2 (seed 0 recorded in r2)
#  4. 3-seed flagship parity gate
# Each stage is resumable; logs under the out roots.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# 1a. dense study, new pipeline defaults
scripts/seed_study.sh output/seed_study_r5a dense 0 1 2

# 1b. attribution control: seed 0 with the mid-run rewrite disabled
#     (incremental store still on — isolates the pose-rewrite effect)
if [ ! -f output/seed_study_r5ctl/dense_seed0/eval.json ]; then
  env ROMAP_MIDRUN_POSES=0 ROMAP_DEMO_SEED=0 ROMAP_DEMO_SPARSE_DEPTH=1 \
    ROMAP_DENSE_VIEWS=1 ROMAP_NO_VIDEO=1 timeout -k 30 1500 \
    examples/run_online_demo.sh output/seed_study_r5ctl/dense_seed0 300 tpu \
    || echo "(control run failed)"
fi

# 2. adversarial scenes (online + offline ceiling each)
scripts/adversarial_study.sh output/adversarial_r5

# 3. hashgrid anchors, seeds 1-2 (seed 0 already in QUALITY.json)
python scripts/quality_hashgrid_tpu.py --seed 1 || true
python scripts/quality_hashgrid_tpu.py --seed 2 || true

# 4. three-seed parity gate
python scripts/quality_gate.py || true

# 5. BASELINE config #2 refresh (VERDICT r4 next #6): 10-object RGB-only
#    offline run at the reference budget on the current flagship.
#    README:~115 quotes stale round-2 numbers (560 it/s, 18.4-20.5 dB).
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

echo "r5 queue done"

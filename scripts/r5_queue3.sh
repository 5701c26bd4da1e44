#!/bin/bash
# Round-5 serial TPU queue, take 3: inserts the final-retrain-vs-midrun-poses
# interplay A/B (seed 1, the largest-gap scene) before the remaining stages.
# Rationale: with ROMAP_MIDRUN_POSES keeping supervision poses fresh, the
# shutdown from-scratch retrain may just discard accumulated training — its
# +1.7 dB was measured without the rewrite and with the r4 compounding bug.
# All stages resumable; safe to relaunch.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

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

# 1. retrain interplay A/B: seed 1, midrun on, final_retrain OFF
run_demo output/seed_study_r5b_nort/dense_seed1 \
  ROMAP_DEMO_SEED=1 ROMAP_DEMO_NO_FINAL_RETRAIN=1

# 2. leakage-free ceilings for the post-fix study
scripts/r5_ceilings.sh 0 1 2

# 3. adversarial scenes (online + holdout ceilings)
scripts/adversarial_study.sh output/adversarial_r5

# 4. hashgrid parity anchors, seeds 1-2
python scripts/quality_hashgrid_tpu.py --seed 1 || true
python scripts/quality_hashgrid_tpu.py --seed 2 || true

# 5. three-seed flagship parity gate
python scripts/quality_gate.py || true

# 6. BASELINE config #2 refresh
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

# 7. snap_levels speed + parity A/B
scripts/r5_snap_ab.sh

echo "r5 queue3 done"

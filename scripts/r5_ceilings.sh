#!/bin/bash
# Leakage-free offline GT-pose ceilings for the room seed study (runs AFTER
# r5_queue.sh; reuses the datasets its online runs generated). The round-4
# ceilings trained on every view including the ones they were scored on —
# --holdout 4 removes that train-set leakage so the online-vs-ceiling gap
# (VERDICT r4 next #1) is measured like-for-like.
# usage: scripts/r5_ceilings.sh [seed ...]   (default 0 1 2)
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
SEEDS=("$@")
[ ${#SEEDS[@]} -eq 0 ] && SEEDS=(0 1 2)
STUDY="${ROMAP_STUDY_ROOT:-output/seed_study_r5b}"

for SEED in "${SEEDS[@]}"; do
  DS="$STUDY/dense_seed${SEED}/dataset"
  OFF="output/ceiling_r5_seed${SEED}"
  if [ ! -d "$DS" ]; then
    echo "(no dataset for seed $SEED at $DS — run the seed study first)"
    continue
  fi
  if [ ! -f "$OFF/eval.json" ]; then
    mkdir -p "$OFF"
    timeout -k 30 2400 python -m romap_tpu.runtime.offline - "$DS" 1 \
      --out "$OFF" --no-video --holdout 4 > "$OFF/offline.log" 2>&1 \
      || echo "(ceiling run failed: seed $SEED)"
    python -m romap_tpu.utils.eval_psnr "$OFF" "$DS" \
      --json "$OFF/eval.json" || true
  fi
  python - "$OFF/eval.json" "$SEED" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    print(f"seed {sys.argv[2]} leakage-free ceiling:",
          json.dumps(d.get("aggregate", {})))
except Exception as e:
    print(f"(no eval for seed {sys.argv[2]}: {e})")
EOF
done
echo "r5 ceilings done"

#!/bin/bash
# snap_levels promotion A/B (round-5 speed ladder, runs AFTER r5_queue.sh
# because the 3-seed gate needs the hashgrid anchors that queue stage 3
# records). Serial TPU work:
#   1. bench.py speed with MX_SNAP=0 and MX_SNAP=1 (10-object flagship)
#   2. 3-seed parity gate with MX_SNAP=1, recorded under parity_gate_snap
# The default flip is a human decision on this evidence (config.py
# mx_snap_levels) — this script only measures and records.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

OUT=output/snap_ab
mkdir -p "$OUT"

for SNAP in 0 1; do
  if [ ! -s "$OUT/bench_snap$SNAP.json" ]; then
    env MX_SNAP=$SNAP timeout -k 30 1800 python bench.py \
      > "$OUT/bench_snap$SNAP.json" 2> "$OUT/bench_snap$SNAP.log" \
      || echo "(bench MX_SNAP=$SNAP failed)"
    cat "$OUT/bench_snap$SNAP.json"
  fi
done

python - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
q = json.load(open("QUALITY.json"))
rec = q.setdefault("speeds_r5_snap", {})
for snap in (0, 1):
    p = os.path.join(out, f"bench_snap{snap}.json")
    try:
        rec[f"MX_SNAP={snap}"] = json.load(open(p))["value"]
    except Exception as e:
        print(f"(no bench value for MX_SNAP={snap}: {e})")
json.dump(q, open("QUALITY.json", "w"), indent=1)
print("speeds_r9_snap:", rec)
EOF

# 3-seed parity gate for the snapped encoding (needs anchors for seeds 0-2)
env MX_SNAP=1 timeout -k 30 5400 python scripts/quality_gate.py \
  --record-key parity_gate_snap 2>&1 | tee "$OUT/gate_snap.log"

echo "snap A/B done"

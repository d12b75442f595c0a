"""Test config: run on CPU with 8 virtual devices so sharding tests work
anywhere (mirrors the multi-chip dry-run the driver performs).

Note: on this machine the axon TPU plugin ignores the JAX_PLATFORMS env var,
so we must force the platform through jax.config before any computation.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("QPALETTE_INTERPRET", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

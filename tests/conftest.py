"""Test config: force CPU with a virtual 8-device mesh so sharding tests run
without TPU hardware (multi-chip is validated on a host-platform mesh).

NOTE: the surrounding environment pre-sets JAX_PLATFORMS=axon (a tunneled TPU
whose per-op dispatch latency is ~1s) — tests MUST override it, not setdefault.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

# The axon plugin ignores the env var; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

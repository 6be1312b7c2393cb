"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual mesh per the TPU testing
recipe (``--xla_force_host_platform_device_count=8``).

Note: this environment pre-imports jax (sitecustomize) with the axon TPU
platform selected, so JAX_PLATFORMS in os.environ is already consumed; the
platform must be overridden through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

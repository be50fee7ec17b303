"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (the axon TPU plugin
ignores the JAX_PLATFORMS env var, so use jax.config).

Set CONSENT_TPU_TESTS=1 to keep the real backend instead — used to run
tests/test_tpu_compiled.py on the actual chip."""

import os

import jax  # noqa: E402

if os.environ.get("CONSENT_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

from consent_tpu.utils.jaxcache import enable  # noqa: E402

enable()

"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (the axon TPU plugin
ignores the JAX_PLATFORMS env var, so use jax.config)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from consent_tpu.utils.jaxcache import enable  # noqa: E402

enable()

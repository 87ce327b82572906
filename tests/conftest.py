"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware.

Note: this image registers an 'axon' TPU PJRT plugin via sitecustomize
and pins JAX_PLATFORMS=axon in the environment, so the env var alone is
not enough — we must update jax's config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

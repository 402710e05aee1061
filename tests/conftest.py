"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
without TPU hardware.  Note: the axon TPU plugin in this image overrides the
JAX_PLATFORMS environment variable, so the platform must be forced via
jax.config *before* any backend initialization — hence here at conftest import
time, together with the host-device-count XLA flag.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

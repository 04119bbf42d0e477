"""
Test configuration: run JAX on a virtual 8-device CPU mesh so the full test
suite (including multi-device sharding tests) runs anywhere, fast, without
TPU hardware.

The environment may pre-register a TPU platform plugin via sitecustomize
(and pre-import jax), so setting JAX_PLATFORMS alone is not enough — we also
update the config directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

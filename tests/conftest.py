"""Test configuration.

Mirrors the reference's CI trick (SURVEY.md section 4.2): run everything on the
CPU backend with 8 virtual XLA devices
(``--xla_force_host_platform_device_count=8``) so all distributed/sharded code
paths are exercised on a single host without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

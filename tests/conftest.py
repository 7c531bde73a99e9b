"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

NOTE: this environment pre-imports jax via a sitecustomize hook with
JAX_PLATFORMS=axon (the real TPU tunnel), so setting os.environ here is too
late — the platform must be overridden through jax.config.  Tests must not
touch the TPU: the tunnel admits one client and concurrent processes hang.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

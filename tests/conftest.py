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

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    One pytest process compiles many hundreds of XLA:CPU programs over the
    full suite; keeping them all loaded eventually segfaults the LLVM JIT
    mid-compile (reproducibly at the ~194th test, independent of which
    tests ran — both halves of the suite pass in isolation).  Dropping the
    jit caches at module teardown bounds resident compiled code; each
    module still reuses compilations internally."""
    yield
    jax.clear_caches()

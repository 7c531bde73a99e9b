"""Persistent XLA compilation cache — accelerator backends only.

Round-4 keyed the cache by a /proc/cpuinfo fingerprint, but the AOT
mismatch warnings ("Compile machine features ... doesn't match ... could
lead to SIGILL") persisted: XLA:CPU AOT entries embed SYNTHETIC target
features (+prefer-no-scatter, +prefer-no-gather, amx-* subsets) that are
never present in the host feature list, so the loader's subset check fails
for every reloaded CPU AOT entry regardless of fingerprint — no cache key
can make it pass.  The only warning-free (and SIGILL-safe) configuration
is to not persist XLA:CPU compilations at all.

Policy therefore:
- CPU backend (tests, virtual-mesh dryruns, JAX_PLATFORMS=cpu): persistent
  cache DISABLED.  CPU compiles are local and fast; correctness beats
  replay speed.
- TPU/accelerator backends: cache enabled, keyed by the toolchain that
  shaped the executable format (jax + jaxlib + libtpu versions, platform
  selection, host arch) — a cache written under one runtime never feeds
  another.  The key reads only environment/version metadata so importing
  the package does not force accelerator-backend initialization.
"""
from __future__ import annotations

import hashlib
import os
import platform as _platform


def _active_platform() -> str:
    """The platform jax will actually use, WITHOUT initializing a backend.

    jax.config.jax_platforms is authoritative: this environment pre-imports
    jax with JAX_PLATFORMS=axon via a sitecustomize hook, so CPU-forced
    processes (tests, dryruns) override through jax.config and the env var
    still says axon."""
    try:
        import jax

        v = jax.config.jax_platforms
        if v:
            return v.split(",")[0].lower()
    except Exception:  # pragma: no cover
        pass
    v = (
        os.environ.get("JAX_PLATFORMS")
        or os.environ.get("JAX_PLATFORM_NAME")
        or ""
    )
    return v.split(",")[0].lower()


def machine_key() -> str:
    """Digest of the compilation toolchain + target selection, computed
    without initializing a backend."""
    import jax

    parts = [
        _active_platform() or "default",
        _platform.machine(),
        jax.__version__,
    ]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:  # pragma: no cover
        pass
    try:
        from libtpu import __version__ as _libtpu_ver  # type: ignore

        parts.append(_libtpu_ver)
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def enable_persistent_cache(base_dir: str) -> str | None:
    """Point jax at <base_dir>/<machine_key> and enable caching of every
    compile over 0.5s — accelerator backends only (see module docstring).
    Returns the directory used, or None when caching stays off (CPU)."""
    import jax

    if _active_platform() == "cpu":
        return None
    d = os.path.join(base_dir, machine_key())
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d

"""Persistent XLA compilation cache, keyed by machine fingerprint.

A cache populated on one host type can hand mismatched AOT results to
another (XLA:CPU logs "Compile machine features ... doesn't match" and may
SIGILL): the cache directory is therefore suffixed with a digest of the
platform + CPU feature flags, so each host type compiles into its own
subtree while same-type re-runs still hit."""
from __future__ import annotations

import hashlib
import os
import platform


def machine_key() -> str:
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    feats += line
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def enable_persistent_cache(base_dir: str) -> str:
    """Point jax at <base_dir>/<machine_key> and enable caching of every
    compile over 0.5s.  Returns the directory used."""
    import jax

    d = os.path.join(base_dir, machine_key())
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d

"""Log10-space probability math.

Ref: src/ngsep/math/LogMath.java:38-89.  The reference works in log10 (not
ln) throughout its genotype-likelihood model; we keep that convention for
output parity.  Both numpy (host) and jnp (device) variants are provided.
"""
from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover - jax always present in target env
    jnp = None

LOG10_E = float(np.log10(np.e))


def log10_sum(log_a, log_b):
    """log10(10^a + 10^b), None-safe like the reference's logSum.

    Ref: LogMath.java logSum (null treated as probability 0).
    """
    if log_a is None:
        return log_b
    if log_b is None:
        return log_a
    if log_a < log_b:
        log_a, log_b = log_b, log_a
    diff = log_b - log_a
    if diff < -20:
        return log_a
    return log_a + np.log10(1.0 + 10.0 ** diff)


def log10_sum_array(log_values: np.ndarray, axis=None):
    """Vectorized log10-sum-exp over an array (numpy)."""
    m = np.max(log_values, axis=axis, keepdims=True)
    out = m + np.log10(np.sum(10.0 ** (log_values - m), axis=axis, keepdims=True))
    return np.squeeze(out, axis=axis) if axis is not None else float(out.reshape(()))


def jnp_log10_sum(log_values, axis=None, keepdims=False):
    """Device log10-sum-exp (jnp), safe against -inf rows."""
    m = jnp.max(log_values, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(10.0 ** (log_values - m_safe), axis=axis, keepdims=True)
    out = m_safe + jnp.log10(s)
    out = jnp.where(jnp.isfinite(m), out, m)
    if not keepdims and axis is not None:
        out = jnp.squeeze(out, axis=axis)
    return out


def power10(log_p):
    """10^log_p, None-safe (ref: LogMath.power10)."""
    if log_p is None:
        return 0.0
    return 10.0 ** log_p

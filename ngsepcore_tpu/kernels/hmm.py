"""Log-space HMM forward/backward/posterior/Viterbi as lax.scan kernels.

Ref: src/ngsep/hmm/HMM.java:24-110 (interface), AbstractHMM.java:29-277
(log10-space forward/backward/posterior decoding/Viterbi, Baum-Welch
constants).  The reference iterates positions with per-state scalar loops;
here each step is a vectorized (batch, states) update inside lax.scan, and
Baum-Welch statistics come from the same scans.

All probabilities are log10 like the reference (LogMath conventions).
Emissions are supplied as a dense (T, S) log-emission matrix — the
per-model emission logic (imputation haplotype clusters, Poisson read
depth) builds that matrix host- or device-side and reuses these kernels.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log10sumexp(x, axis=None):
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(10.0 ** (x - m_safe), axis=axis, keepdims=True)
    out = m_safe + jnp.log10(s)
    out = jnp.where(jnp.isfinite(m), out, m)
    return jnp.squeeze(out, axis=axis)


@jax.jit
def forward_log(
    log_start: jnp.ndarray,  # (S,)
    log_trans: jnp.ndarray,  # (T-1, S, S) or broadcastable (1, S, S)
    log_emit: jnp.ndarray,  # (T, S)
):
    """Forward recursion; returns (log_alpha (T,S), log_likelihood)."""
    a0 = log_start + log_emit[0]
    T = log_emit.shape[0]

    def step(alpha, inputs):
        emit_t, trans_t = inputs
        nxt = _log10sumexp(alpha[:, None] + trans_t, axis=0) + emit_t
        return nxt, nxt

    trans = jnp.broadcast_to(
        log_trans, (T - 1,) + log_trans.shape[-2:]
    )
    _, alphas = jax.lax.scan(step, a0, (log_emit[1:], trans))
    log_alpha = jnp.concatenate([a0[None], alphas], axis=0)
    ll = _log10sumexp(log_alpha[-1], axis=0)
    return log_alpha, ll


@jax.jit
def backward_log(log_trans: jnp.ndarray, log_emit: jnp.ndarray):
    """Backward recursion; returns log_beta (T,S)."""
    T, S = log_emit.shape
    bT = jnp.zeros(S)

    def step(beta, inputs):
        emit_t1, trans_t = inputs
        prev = _log10sumexp(trans_t + (emit_t1 + beta)[None, :], axis=1)
        return prev, prev

    trans = jnp.broadcast_to(log_trans, (T - 1,) + log_trans.shape[-2:])
    _, betas = jax.lax.scan(
        step, bT, (log_emit[1:], trans), reverse=True
    )
    return jnp.concatenate([betas, bT[None]], axis=0)


@jax.jit
def posterior_log(log_start, log_trans, log_emit):
    """State posteriors per position: returns (posteriors (T,S) in log10,
    log-likelihood)."""
    log_alpha, ll = forward_log(log_start, log_trans, log_emit)
    log_beta = backward_log(log_trans, log_emit)
    un = log_alpha + log_beta
    norm = _log10sumexp(un, axis=1)
    return un - norm[:, None], ll


@jax.jit
def viterbi_log(log_start, log_trans, log_emit):
    """Most likely state path; returns (path (T,) int32, best log prob).

    Ref: AbstractHMM.getViterbiPath.
    """
    T, S = log_emit.shape
    d0 = log_start + log_emit[0]

    def fwd(delta, inputs):
        emit_t, trans_t = inputs
        scores = delta[:, None] + trans_t  # (S_prev, S_next)
        best_prev = jnp.argmax(scores, axis=0)
        nxt = jnp.max(scores, axis=0) + emit_t
        return nxt, (nxt, best_prev.astype(jnp.int32))

    trans = jnp.broadcast_to(log_trans, (T - 1,) + log_trans.shape[-2:])
    dT, (deltas, back) = jax.lax.scan(fwd, d0, (log_emit[1:], trans))
    last = jnp.argmax(dT).astype(jnp.int32)
    best = dT[last]

    def bwd(state, back_t):
        prev = back_t[state]
        return prev, prev

    _, path_rev = jax.lax.scan(bwd, last, back, reverse=True)
    path = jnp.concatenate([path_rev, last[None]])
    return path, best


@jax.jit
def baum_welch_expected_counts(log_start, log_trans, log_emit):
    """E-step statistics: expected transition counts (S,S) and per-position
    state posteriors (T,S), both in linear space.

    Ref: AbstractHMM Baum-Welch accumulation (calculateForward/Backward +
    expected transitions).
    """
    log_alpha, ll = forward_log(log_start, log_trans, log_emit)
    log_beta = backward_log(log_trans, log_emit)
    T, S = log_emit.shape
    trans = jnp.broadcast_to(log_trans, (T - 1, S, S))
    # xi[t,i,j] = alpha[t,i] + trans[t,i,j] + emit[t+1,j] + beta[t+1,j] - ll
    xi = (
        log_alpha[:-1, :, None]
        + trans
        + (log_emit[1:] + log_beta[1:])[:, None, :]
        - ll
    )
    expected_trans = jnp.sum(10.0 ** xi, axis=0)
    gamma_log = log_alpha + log_beta - ll
    return expected_trans, 10.0 ** gamma_log, ll

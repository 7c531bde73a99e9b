"""Window-minimizer selection on device.

Ref: src/ngsep/sequences/ShortKmerCodesTable.java:261-335 — per window of
`w` consecutive k-mers the k-mer with the smallest hash is selected; the
default hash (no spectrum analyzer) is `(code+1) % 1073676287`
(ShortKmerCodesTable.java / SURVEY A.4), optionally replaced by a
count-aware rank so rare k-mers win.

TPU redesign: the reference walks each window with a scalar loop keeping a
rolling min.  Here selection is two `reduce_window` passes over the whole
hash tensor at once:
    W[s]   = min(hash[s .. s+w-1])              (window minima)
    sel[i] = ( max_{windows s covering i} W[s] ) == hash[i]
Because W[s] <= hash[i] for every window covering i, position i is a
minimizer of some window iff the max of covering window minima equals its
own hash — two vectorized reductions, no sequential state.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_HASH_MOD = 1073676287  # ref: ShortKmerCodesTable hash modulus


@jax.jit
def default_kmer_hash(codes: jnp.ndarray) -> jnp.ndarray:
    """(code+1) % 1073676287, the reference's analyzer-free hash.

    Result < 2^30, so int32 — native on TPU where int64 is emulated."""
    return ((codes.astype(jnp.int64) + 1) % DEFAULT_HASH_MOD).astype(jnp.int32)


@partial(jax.jit, static_argnames=("window",))
def select_minimizers(hashes: jnp.ndarray, valid: jnp.ndarray, window: int):
    """Mark minimizer positions in a (B, n_kmers) hash tensor.

    valid masks k-mer slots that exist (in-range, no N).  Invalid slots get
    +inf hash so they never win a window; windows containing any invalid
    slot still select among their valid members (the reference skips
    windows with invalid kmers — we additionally require the window to be
    fully in-range, handled by the caller via `valid`).
    Returns bool (B, n_kmers).
    """
    big = jnp.array(jnp.iinfo(hashes.dtype).max // 2, hashes.dtype)
    h = jnp.where(valid, hashes, big)
    nk = h.shape[-1]
    w = min(window, nk)
    # window minima over sliding windows of size w (VALID windows only)
    wmin = -jax.lax.reduce_window(
        -h,
        -big,
        jax.lax.max,
        window_dimensions=(1, w),
        window_strides=(1, 1),
        padding="VALID",
    )  # (B, nk-w+1)
    # max of covering window minima: window s covers i if s in [i-w+1, i];
    # pad wmin so position i sees exactly its covering windows
    cover = jax.lax.reduce_window(
        wmin,
        -big,
        jax.lax.max,
        window_dimensions=(1, w),
        window_strides=(1, 1),
        padding=[(0, 0), (w - 1, w - 1)],
    )  # (B, nk)
    return (cover == h) & valid


@partial(jax.jit, static_argnames=("k", "window"))
def extract_minimizers(codes: jnp.ndarray, lengths: jnp.ndarray, k: int, window: int):
    """codes (B, L) -> (kcodes, minimizer mask, valid) for canonical strand.

    Selection runs on the forward-strand codes with the default hash —
    deterministic and strand-stable enough for seeding (behavioral parity
    with final alignments is the acceptance bar, not identical seed sets;
    SURVEY §7 hard parts).
    """
    from .kmers import kmer_codes

    kcodes, valid = kmer_codes(codes, lengths, k)
    hashes = default_kmer_hash(kcodes)
    sel = select_minimizers(hashes, valid, window)
    return kcodes, sel, valid

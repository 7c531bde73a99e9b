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

# murmur3-style mixing constants for the int32-native two-half hashes
_MIX_A = 0x85EBCA6B
_MIX_B = 0xC2B2AE35
_MIX_C = 0x7FEB352D


@jax.jit
def default_kmer_hash(codes: jnp.ndarray) -> jnp.ndarray:
    """(code+1) % 1073676287, the reference's analyzer-free hash.

    Result < 2^30, so int32 — native on TPU where int64 is emulated."""
    return ((codes.astype(jnp.int64) + 1) % DEFAULT_HASH_MOD).astype(jnp.int32)


def minimizer_hash30(hi, lo):
    """30-bit selection hash of two-half k-mer codes — all native int32/uint32
    ops (works on both numpy and jax arrays).  Replaces the reference's
    `(code+1) % 1073676287` ordering hash: any deterministic ordering gives
    valid minimizers; behavioral parity target is final alignments, not seed
    sets (SURVEY §7 hard parts)."""
    xp = jnp if isinstance(hi, jnp.ndarray) else np
    u = xp.uint32
    h = hi.astype(u) * u(_MIX_A) + lo.astype(u) * u(_MIX_B)
    h = h ^ (h >> u(15))
    h = h * u(_MIX_C)
    h = h ^ (h >> u(13))
    return (h >> u(2)).astype(xp.int32)  # < 2^30: safe for select_minimizers


def lookup_hash32(hi, lo):
    """Full-width uint32 table key of two-half k-mer codes (distinct mix from
    the selection hash so key collisions are independent of selection ties).
    Exactness comes from verifying (hi, lo) per query, not from this hash."""
    xp = jnp if isinstance(hi, jnp.ndarray) else np
    u = xp.uint32
    h = hi.astype(u) * u(_MIX_B) + lo.astype(u) * u(_MIX_A)
    h = h ^ (h >> u(16))
    h = h * u(_MIX_C)
    h = h ^ (h >> u(15))
    return h


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
def extract_minimizers_canonical(
    codes: jnp.ndarray, lengths: jnp.ndarray, k: int, window: int
):
    """codes (B, L) -> (hi, lo, flag, minimizer mask, valid): canonical
    int32-native extraction used by BOTH the genome table build and read
    queries — strand-symmetric selection means a read and its mapping locus
    select the same windows regardless of orientation, so one query strand
    suffices."""
    from .kmers import kmer_codes_canonical_2x32

    hi, lo, flag, valid = kmer_codes_canonical_2x32(codes, lengths, k)
    sel = select_minimizers(minimizer_hash30(hi, lo), valid, window)
    return hi, lo, flag, sel, valid


@partial(jax.jit, static_argnames=("k", "window", "cap"))
def _extract_compact_dev(codes, lengths, k: int, window: int, cap: int):
    hi, lo, flag, sel, valid = extract_minimizers_canonical(
        codes, lengths, k, window
    )
    B, NK = sel.shape
    flat = jnp.nonzero(
        sel.reshape(-1), size=cap, fill_value=B * NK
    )[0].astype(jnp.int32)
    n = jnp.sum(sel, dtype=jnp.int32)
    ok = flat < B * NK
    flat_c = jnp.where(ok, flat, 0)
    row = flat_c // NK
    posn = flat_c % NK
    g = lambda a: jnp.where(ok, a.reshape(-1)[flat_c], 0)
    return row, posn, g(hi), g(lo), g(flag.astype(jnp.int32)), n


def extract_minimizers_compact(codes, lengths, k: int, window: int):
    """codes (B, L) -> compact host arrays (row, pos, kcodes int64) of the
    selected minimizer positions only.

    The dense wrapper below fetches four (B, n_kmers) tensors over the
    host link (~40 MB per 256x10kb long-read batch, the dominant seeding
    cost); this compacts on device with one fixed-size nonzero and
    transfers ~6x less.  Selection is canonical (same as the table build);
    returned codes are forward-strand."""
    from .kmers import rc_code_int64

    B, L = codes.shape
    cap = max(1024, int(B * L * 3 // window))
    row, posn, hi, lo, flag, n = _extract_compact_dev(
        jnp.asarray(codes), jnp.asarray(lengths), k, window, cap
    )
    n = int(n)
    assert n <= cap, f"minimizer compaction overflow: {n} > {cap}"
    row = np.asarray(row)[:n]
    posn = np.asarray(posn)[:n]
    hi = np.asarray(hi).astype(np.int64)[:n]
    lo = np.asarray(lo).astype(np.int64)[:n]
    flag = np.asarray(flag)[:n]
    canon = (hi << (2 * min(k, 15))) | lo
    kcodes = np.where(flag == 1, rc_code_int64(canon, k), canon)
    return row, posn, kcodes


def extract_minimizers(codes, lengths, k: int, window: int):
    """codes (B, L) -> (kcodes int64 numpy, minimizer mask, valid) for the
    forward strand.  Host-facing wrapper: selection is canonical (matching
    the table build) but the returned codes are the forward-strand codes at
    the selected positions, so host callers (long reads, transposons) keep
    their forward-coordinate view; MinimizerTable.collect_hits
    re-canonicalizes and strand-filters.
    """
    from .kmers import rc_code_int64

    hi, lo, flag, sel, valid = extract_minimizers_canonical(
        codes, lengths, k, window
    )
    hi = np.asarray(hi).astype(np.int64)
    lo = np.asarray(lo).astype(np.int64)
    flag = np.asarray(flag)
    canon = (hi << (2 * min(k, 15))) | lo
    kcodes = np.where(flag == 1, rc_code_int64(canon, k), canon)
    return kcodes, np.asarray(sel), np.asarray(valid)

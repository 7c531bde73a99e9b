"""K-mer code extraction and counting on device.

TPU-first redesign of the reference's k-mer machinery:
- ref: DNASequence.java:132-178 — `getDNAHash`/`getNextDNAHash` scalar rolling
  2-bit hash per position.  Here: one vectorized shift-accumulate over a
  (reads, positions) code tensor, all positions at once.
- ref: KmersExtractor.java:393-426 + ShortArrayDNAKmersMapImpl.java:21,61-68 —
  Java counts into a giant `short[4^k]` under a lock.  A 4^15 flat array is
  4 GiB in int32 on HBM and scatter-heavy; the TPU-native layout is instead
  sort + run-length-encode per batch (XLA's sort maps well onto the VPU) with
  host-side sorted-run merging across batches (index/kmers_map.py).

Codes use the reference's alphabet order A=0,C=1,G=2,T=3
(DNASequence.java:33-34) so code values are directly comparable for parity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_CODE = 4


@partial(jax.jit, static_argnames=("k",))
def kmer_codes(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Extract k-mer codes from a padded (n_reads, L) int8 code batch.

    Returns (kcodes, valid):
      kcodes: (n_reads, L-k+1) int32/int64 2-bit-packed codes
      valid:  same-shape bool — window fully in-read and free of non-ACGT
              (non-ACGT breaks the rolling window, ref: KmersExtractor /
              DNASequence.java:164-178 semantics).
    """
    n, L = codes.shape
    nk = L - k + 1
    dtype = jnp.int32 if k <= 15 else jnp.int64
    c = codes.astype(dtype)
    acc = jnp.zeros((n, nk), dtype=dtype)
    ok = jnp.ones((n, nk), dtype=bool)
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, nk, axis=1)
        acc = acc * 4 + jnp.where(cj < 4, cj, 0)
        ok = ok & (cj < 4)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
    ok = ok & (pos + k <= lengths[:, None])
    return acc, ok


@partial(jax.jit, static_argnames=("k",))
def kmer_codes_2x32(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """K-mer codes for k<=30 as two native-int32 halves (TPU int64 is
    emulated; the int64 `kmer_codes` path costs ~3x per op).

    lo = code of the last min(k,15) bases (<=30 bits), hi = code of the
    first k-15 bases (0 when k<=15).  The exact int64 code is
    (hi << 2*min(k,15)) | lo.  Same window-validity semantics as
    `kmer_codes` (non-ACGT breaks the window, DNASequence.java:164-178).
    """
    assert k <= 30, "two-half int32 codes support k<=30"
    n, L = codes.shape
    nk = L - k + 1
    c = codes.astype(jnp.int32)
    split = max(0, k - 15)
    hi = jnp.zeros((n, nk), dtype=jnp.int32)
    lo = jnp.zeros((n, nk), dtype=jnp.int32)
    ok = jnp.ones((n, nk), dtype=bool)
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, nk, axis=1)
        v = jnp.where(cj < 4, cj, 0)
        if j < split:
            hi = hi * 4 + v
        else:
            lo = lo * 4 + v
        ok = ok & (cj < 4)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
    ok = ok & (pos + k <= lengths[:, None])
    return hi, lo, ok


@partial(jax.jit, static_argnames=("k",))
def kmer_codes_canonical_2x32(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Canonical (strand-symmetric) k-mer codes as two int32 halves.

    For each window the forward and reverse-complement codes are computed in
    one unrolled pass and the lexicographically smaller one is kept, with
    flag=1 when the reverse-complement won.  Canonical selection lets the
    seed index store one strand and read queries run on the forward strand
    only — half the rows of the fwd+rev design.  Palindromic windows
    (fwd == rc, only possible for even k) are dropped.

    Returns (hi, lo, flag, valid): flag int32 0/1.
    """
    assert k <= 30
    n, L = codes.shape
    nk = L - k + 1
    c = codes.astype(jnp.int32)
    split = max(0, k - 15)
    fhi = jnp.zeros((n, nk), jnp.int32)
    flo = jnp.zeros((n, nk), jnp.int32)
    rhi = jnp.zeros((n, nk), jnp.int32)
    rlo = jnp.zeros((n, nk), jnp.int32)
    ok = jnp.ones((n, nk), bool)
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, nk, axis=1)
        v = jnp.where(cj < 4, cj, 0)
        w = 3 - v
        if j < split:
            fhi = fhi * 4 + v
        else:
            flo = flo * 4 + v
        # reverse-complement base index m = k-1-j: j>=15 lands in rc_hi with
        # weight 4^(j-15), j<15 in rc_lo with weight 4^j
        if j >= 15:
            rhi = rhi + (w << (2 * (j - 15)))
        else:
            rlo = rlo + (w << (2 * j))
        ok = ok & (cj < 4)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
    ok = ok & (pos + k <= lengths[:, None])
    fwd_le = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    flag = jnp.where(fwd_le, 0, 1).astype(jnp.int32)
    hi = jnp.where(fwd_le, fhi, rhi)
    lo = jnp.where(fwd_le, flo, rlo)
    ok = ok & ~((fhi == rhi) & (flo == rlo))  # drop palindromes (even k only)
    return hi, lo, flag, ok


def rc_code_int64(codes: np.ndarray, k: int) -> np.ndarray:
    """Host: reverse-complement of 2-bit-packed int64 k-mer codes."""
    c = np.asarray(codes, np.int64).copy()
    out = np.zeros_like(c)
    for _ in range(k):
        out = (out << 2) | (3 - (c & 3))
        c >>= 2
    return out


@partial(jax.jit, static_argnames=("k",))
def kmer_codes_both_strands(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Forward + reverse-complement k-mer codes for a read batch.

    The reference counts each read's k-mers on both strands by default
    (KmersExtractor "both strands", SURVEY A.5).  The reverse-complement
    code of a window is computed arithmetically from the complemented
    codes read right-to-left — no second pass over the sequence.
    """
    fwd, ok = kmer_codes(codes, lengths, k)
    dtype = fwd.dtype
    n, L = codes.shape
    nk = L - k + 1
    c = codes.astype(dtype)
    comp = jnp.where(c < 4, 3 - c, c)
    acc = jnp.zeros((n, nk), dtype=dtype)
    # revcomp code: bases of the window reversed; accumulate from last to first
    for j in range(k - 1, -1, -1):
        cj = jax.lax.dynamic_slice_in_dim(comp, j, nk, axis=1)
        acc = acc * 4 + jnp.where(cj < 4, cj, 0)
    return fwd, acc, ok


@jax.jit
def sort_count_codes(flat_codes: jnp.ndarray, valid: jnp.ndarray):
    """Sort a flat code vector and run-length-encode it on device.

    Invalid entries are mapped to the sentinel max value so they sort last.
    Returns (sorted_unique_codes, counts, n_unique): fixed-size arrays where
    entries past n_unique are sentinel/zero.  This replaces the reference's
    locked scatter into `short[4^k]` (ShortArrayDNAKmersMapImpl.java:61-68)
    with a sort — deterministic and parallel with no contention.
    """
    sentinel = jnp.iinfo(flat_codes.dtype).max
    keyed = jnp.where(valid, flat_codes, sentinel)
    s = jnp.sort(keyed)
    n = s.shape[0]
    is_start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]]) & (s != sentinel)
    n_unique = jnp.sum(is_start.astype(jnp.int32))
    total_valid = jnp.sum(valid.astype(jnp.int32))
    # run starts compacted by ONE nonzero; counts = gap to the next start.
    # (the former segment_sum/segment_max pair lowered to serialized
    # scatters — ~0.7 s each at 24M lanes on this chip)
    start_pos = jnp.nonzero(is_start, size=n, fill_value=n)[0].astype(jnp.int32)
    sp = jnp.minimum(start_pos, n - 1)
    uniq = jnp.where(start_pos < n, s[sp], jnp.array(sentinel, s.dtype))
    nxt = jnp.concatenate(
        [start_pos[1:], jnp.full((1,), n, jnp.int32)]
    )
    counts = jnp.where(
        start_pos < n, jnp.minimum(nxt, total_valid) - start_pos, 0
    ).astype(jnp.int32)
    return uniq, counts, n_unique


@jax.jit
def sort_codes(flat_codes: jnp.ndarray, valid: jnp.ndarray):
    """Sort a flat code vector (invalids to the sentinel max, so they land
    at the tail) and count valid entries + distinct runs.  This is the
    cheap half of `sort_count_codes`: no run compaction (the
    jnp.nonzero(size=n) there costs ~70ms/1M lanes on this chip — ~1.7s at
    genome scale), so spectrum queries can stay sort-only and the RLE can
    run host-side at materialization time."""
    sentinel = jnp.iinfo(flat_codes.dtype).max
    keyed = jnp.where(valid, flat_codes, sentinel)
    s = jnp.sort(keyed)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    is_start = (
        jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]]) & (s != sentinel)
    )
    n_unique = jnp.sum(is_start.astype(jnp.int32))
    return s, n_valid, n_unique


@partial(jax.jit, static_argnames=("max_count",))
def spectrum_from_sorted(s: jnp.ndarray, *, max_count: int = 200):
    """Count distribution from a sorted code array, scatter-free.

    dist[c] = number of distinct codes occurring exactly c times (counts
    clipped at max_count, like KmersMap.count_distribution).  Uses the
    run-length identity  #runs(len >= c) = #run-starts i with
    s[i+c-1] == s[i]: each c is one shifted compare + reduce — no
    jnp.nonzero, no scatter, ~3 streaming passes over s per c.

    Ref: KmersMap.calculateAbundancesDistribution (the reference scans its
    short[4^k] once; here the sorted layout makes each abundance class one
    vector reduction)."""
    n = s.shape[0]
    sentinel = jnp.iinfo(s.dtype).max
    starts = (
        jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]]) & (s != sentinel)
    )
    ge = []  # ge[j] = #runs with length >= j+1
    for c in range(1, max_count + 1):
        if c == 1:
            ge.append(jnp.sum(starts.astype(jnp.int32)))
        elif c <= n:
            eq = s[: n - c + 1] == s[c - 1 :]
            ge.append(jnp.sum((starts[: n - c + 1] & eq).astype(jnp.int32)))
        else:
            ge.append(jnp.zeros((), jnp.int32))
    ge_v = jnp.stack(ge)
    dist = jnp.zeros(max_count + 1, jnp.int64)
    eq_counts = ge_v[:-1] - ge_v[1:]  # exactly c for c = 1..max_count-1
    dist = dist.at[1:max_count].set(eq_counts.astype(jnp.int64))
    dist = dist.at[max_count].set(ge_v[-1].astype(jnp.int64))
    return dist


@partial(jax.jit, static_argnames=("k", "both_strands"))
def sort_batch_kmers(codes, lengths, k: int, both_strands: bool = True):
    """Extract + sort on device, deferring run compaction (see sort_codes)."""
    if both_strands:
        fwd, rev, ok = kmer_codes_both_strands(codes, lengths, k)
        flat = jnp.concatenate([fwd.reshape(-1), rev.reshape(-1)])
        mask = jnp.concatenate([ok.reshape(-1), ok.reshape(-1)])
    else:
        fwd, ok = kmer_codes(codes, lengths, k)
        flat = fwd.reshape(-1)
        mask = ok.reshape(-1)
    return sort_codes(flat, mask)


@partial(jax.jit, static_argnames=("k", "both_strands"))
def count_batch_kmers(codes, lengths, k: int, both_strands: bool = True):
    """Full per-batch k-mer counting: extract + sort + RLE on device."""
    if both_strands:
        fwd, rev, ok = kmer_codes_both_strands(codes, lengths, k)
        flat = jnp.concatenate([fwd.reshape(-1), rev.reshape(-1)])
        mask = jnp.concatenate([ok.reshape(-1), ok.reshape(-1)])
    else:
        fwd, ok = kmer_codes(codes, lengths, k)
        flat = fwd.reshape(-1)
        mask = ok.reshape(-1)
    return sort_count_codes(flat, mask)


def decode_kmer(code: int, k: int) -> str:
    """Decode a 2-bit packed k-mer code back to an ACGT string."""
    out = []
    for _ in range(k):
        out.append("ACGT"[code & 3])
        code >>= 2
    return "".join(reversed(out))


def encode_kmer(kmer: str) -> int:
    code = 0
    for ch in kmer:
        code = code * 4 + "ACGT".index(ch.upper())
    return code

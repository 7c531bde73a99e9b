"""Tier-1 ungapped mismatch screen for read alignment.

Ref: ShortReadsUngappedSearchHitsClusterAligner.countMismatches(query,
subject, aln) (ShortReadsUngappedSearchHitsClusterAligner.java:157-192):
count mismatches between read and the reference window at the predicted
ungapped placement, plus how many leading/trailing bases should be
soft-clipped (clip grows until 3+ net matches observed).  Accepted when
total < 5% of read length and clips < 10% (":81-95").

Device version: two lax.scans (forward + backward) over the position axis,
vectorized across the candidate batch — replaces the per-read scalar loop.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


@jax.jit
def tier1_stats_from_mask(m: jnp.ndarray, qlen: jnp.ndarray):
    """Closed-form tier-1 stats from a precomputed mismatch mask
    m (B, L) bool (True = mismatch at an in-query position; positions at or
    past qlen must already be False).  Same outputs as tier1_stats but built
    from cumulative sums/maxima instead of sequential scans — O(log L)
    depth, no per-step scan overhead.

    Clip semantics (countMismatches): walking in from an end, the clip ends
    at the first position i that matches and has seen fewer than i-3
    mismatches so far; the clip is everything up to the last mismatch
    strictly before i.
    """
    B, L = m.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    inq = idx < qlen[:, None]
    m = m & inq
    total = m.sum(axis=1).astype(jnp.int32)

    mi = m.astype(jnp.int32)
    cnt_excl = jnp.cumsum(mi, axis=1) - mi  # mismatches before i
    lastmm_incl = jax.lax.cummax(jnp.where(m, idx, -1), axis=1)
    lastmm_excl = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), lastmm_incl[:, :-1]], axis=1
    )
    fire = inq & (~m) & (cnt_excl + 3 < idx)
    has = fire.any(axis=1)
    first_fire = jnp.argmax(fire, axis=1)
    clip_start = jnp.where(
        has, jnp.take_along_axis(lastmm_excl, first_fire[:, None], axis=1)[:, 0] + 1, 0
    ).astype(jnp.int32)

    # backward pass on the flipped mask (lax.rev is a cheap layout op; the
    # previous take_along_axis realign was a 4M-element gather).  Flipped
    # slot j' maps to original position L-1-j'; real read positions start
    # at pad = L - qlen, and the reversed read coordinate is j' - pad.
    # Padding slots are False in m (masked by inq), so cumsums pass through.
    mf = jnp.flip(m, axis=1)
    rstep = idx - (L - qlen)[:, None]  # reversed read coordinate at slot
    mi_f = mf.astype(jnp.int32)
    cnt_f_excl = jnp.cumsum(mi_f, axis=1) - mi_f
    # min original mismatch index among earlier reversed steps (exclusive):
    # original index L-1-j' decreases with j', so min = L-1 - cummax(slot)
    lastf_incl = jax.lax.cummax(jnp.where(mf, idx, -1), axis=1)
    lastf_excl = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), lastf_incl[:, :-1]], axis=1
    )
    minmm_excl = jnp.where(lastf_excl >= 0, L - 1 - lastf_excl, 1 << 30)
    minmm_excl = jnp.minimum(minmm_excl, qlen[:, None])  # init lastMismatch=qlen
    fire_r = (rstep >= 0) & (~mf) & (cnt_f_excl + 3 < rstep)
    has_r = fire_r.any(axis=1)
    first_r = jnp.argmax(fire_r, axis=1)
    clip_end = jnp.where(
        has_r,
        qlen - jnp.take_along_axis(minmm_excl, first_r[:, None], axis=1)[:, 0],
        0,
    ).astype(jnp.int32)
    return total, clip_start, clip_end


@jax.jit
def tier1_stats_vec(query: jnp.ndarray, qlen: jnp.ndarray, subject: jnp.ndarray):
    """tier1_stats_from_mask over explicit (query, subject) code arrays."""
    B, L = query.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    inq = idx < qlen[:, None]
    return tier1_stats_from_mask((query != subject) & inq, qlen)


@jax.jit
def tier1_stats(query: jnp.ndarray, qlen: jnp.ndarray, subject: jnp.ndarray):
    """query/subject (B, L) int8; qlen (B,).  Subject window is the same
    length as the read (ungapped placement).

    Returns (total_mismatches, clip_start, clip_end) each (B,) int32,
    reproducing the reference's countMismatches[0..2] for equal lengths.
    """
    B, L = query.shape
    mism = (query != subject)

    def fwd_step(state, x):
        count, last_mm, assigned, ans1 = state
        m, i = x  # (B,) bool, () int32
        valid = i < qlen
        mm = m & valid
        count = count + mm.astype(jnp.int32)
        last_mm = jnp.where(mm, i, last_mm)
        fire = valid & (~mm) & (~assigned) & (count + 3 < i)
        ans1 = jnp.where(fire, last_mm + 1, ans1)
        assigned = assigned | fire
        return (count, last_mm, assigned, ans1), None

    init = (
        jnp.zeros(B, jnp.int32),
        jnp.full(B, -1, jnp.int32),
        jnp.zeros(B, bool),
        jnp.zeros(B, jnp.int32),
    )
    idx = jnp.arange(L, dtype=jnp.int32)
    (total, _, _, clip_start), _ = jax.lax.scan(fwd_step, init, (mism.T, idx))

    def bwd_step(state, step):
        numm, last_mm, done, ans2 = state
        i = qlen - 1 - step  # per-read position, (B,)
        valid = i >= 0
        m = jnp.take_along_axis(mism, jnp.maximum(i, 0)[:, None], axis=1)[:, 0] & valid
        last_mm = jnp.where(m, i, last_mm)
        numm = numm + m.astype(jnp.int32)
        rev_idx = qlen - 1 - i
        fire = valid & (~m) & (~done) & (numm + 3 < rev_idx)
        ans2 = jnp.where(fire, qlen - last_mm, ans2)
        done = done | fire
        return (numm, last_mm, done, ans2), None

    init_b = (
        jnp.zeros(B, jnp.int32),
        qlen.astype(jnp.int32),  # ref: lastMismatch starts at refSeq.length
        jnp.zeros(B, bool),
        jnp.zeros(B, jnp.int32),
    )
    (_, _, _, clip_end), _ = jax.lax.scan(bwd_step, init_b, idx)
    return total, clip_start, clip_end

"""Fused on-device seeding: minimizers -> table lookup -> diagonal
clustering -> cross-strand candidate merge -> tier-1 ungapped screen, one
jit per read batch.

Ref: the short-read seeding stack
 - ShortKmerCodesTable.matchCompressed (ShortKmerCodesTable.java:344-420)
 - UngappedSearchHitsClusterBuilder.clusterRegionKmerAlns
   (UngappedSearchHitsClusterBuilder.java:43-375)
 - ShortReadsUngappedSearchHitsClusterAligner.countMismatches
   (ShortReadsUngappedSearchHitsClusterAligner.java:157-192)

TPU redesign: the reference walks per-read Java objects (hit lists,
TreeMaps).  Here a whole read batch is one tensor program:
 - table lookup is a searchsorted over native-int32 hash keys with one
   exact int64 verification per query (TPU int64 compares are emulated);
 - hits expand to a fixed (reads, minimizers, hits/kmer) block;
 - diagonal clustering is two per-row sorts + segmented cumsum stats
   (scatter-free: TPU scatters serialize);
 - predicted subject start is the diagonal of the cluster's earliest
   query anchor (the reference's early-weighted predictSubjectStart biases
   the same way, UngappedSearchHitsCluster.java:220-231);
 - fwd/rev strand candidates merge BEFORE the mismatch screen so the
   expensive subject gather runs on the per-read top candidates only.
Only (reads, candidates) scalars return to the host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .minimizers import default_kmer_hash, select_minimizers
from .tier1 import tier1_stats_vec

BIG32 = jnp.int32(1 << 30)
HASH_MULT = jnp.uint64(0x9E3779B97F4A7C15)


@partial(
    jax.jit,
    static_argnames=("k", "window", "max_minimizers", "hits_per_kmer", "max_clusters"),
)
def seed_cluster_screen(
    codes: jnp.ndarray,  # (2B, L) int8 read codes: B fwd rows then B rev rows
    lengths: jnp.ndarray,  # (2B,) int32
    hash_keys: jnp.ndarray,  # (U,) uint32 sorted hash of distinct codes
    exact_codes: jnp.ndarray,  # (U,) int64 exact code per hash key
    row_offsets: jnp.ndarray,  # (U+1,) int32 CSR offsets
    entry_pos: jnp.ndarray,  # (E,) int32 concat genome positions
    concat: jnp.ndarray,  # (G,) int8 concatenated genome codes
    *,
    k: int,
    window: int,
    max_minimizers: int = 32,
    hits_per_kmer: int = 4,
    max_clusters: int = 4,
):
    from .kmers import kmer_codes

    R, L = codes.shape
    B = R // 2
    M, K, C = max_minimizers, hits_per_kmer, max_clusters
    H = M * K

    # ---- stage 1: minimizer selection --------------------------------
    kcodes, valid = kmer_codes(codes, lengths, k)
    sel = select_minimizers(default_kmer_hash(kcodes), valid, window)
    # compact selected positions to M slots (position order preserved)
    seli = jnp.argsort(~sel, axis=1, stable=True)[:, :M]  # (R, M)
    msel = jnp.take_along_axis(sel, seli, axis=1)
    mcodes = jnp.take_along_axis(kcodes, seli, axis=1)
    mpos = seli.astype(jnp.int32)

    # ---- stage 2: hashed CSR lookup ------------------------------------
    U = hash_keys.shape[0]
    qhash = ((mcodes.astype(jnp.uint64) * HASH_MULT) >> 32).astype(jnp.uint32)
    r = jnp.clip(jnp.searchsorted(hash_keys, qhash), 0, max(U - 1, 0))
    if U > 0:
        found = msel & (hash_keys[r] == qhash) & (exact_codes[r] == mcodes)
    else:
        found = jnp.zeros_like(msel)
    start = jnp.where(found, row_offsets[r], 0)
    cnt = jnp.where(found, row_offsets[r + 1] - row_offsets[r], 0)
    cnt = jnp.minimum(cnt, K)
    kk = jnp.arange(K, dtype=jnp.int32)[None, None, :]
    hit_valid = kk < cnt[..., None]
    eidx = jnp.where(hit_valid, start[..., None] + kk, 0)
    spos = jnp.where(hit_valid, entry_pos[eidx], 0)
    qpos = jnp.broadcast_to(mpos[..., None], spos.shape)
    est = jnp.where(hit_valid, spos - qpos, BIG32)  # diagonal = est. start

    est = est.reshape(R, H)
    qpos = qpos.reshape(R, H)

    # ---- stage 3: diagonal clustering (scatter-free) -------------------
    # sort hits by estimated start; clusters become contiguous runs
    est_s, qpos_s = jax.lax.sort((est, qpos), dimension=1, num_keys=1)
    valid_s = est_s < BIG32
    tol = jnp.maximum(10, lengths // 10).astype(jnp.int32)[:, None]
    prev = jnp.concatenate([jnp.full((R, 1), -(1 << 30), jnp.int32), est_s[:, :-1]], 1)
    brk = (est_s - prev) > tol
    cid = jnp.cumsum(brk.astype(jnp.int32), axis=1) - 1
    cid = jnp.clip(cid, 0, H - 1)
    # re-sort by (cluster, query pos, est): runs stay contiguous, and the
    # first element of each run is the cluster's earliest query anchor
    key2 = jnp.where(valid_s, cid * jnp.int32(65536) + qpos_s, BIG32)
    key2_s, est2 = jax.lax.sort((key2, est_s), dimension=1, num_keys=2)
    valid2 = key2_s < BIG32
    prev2 = jnp.concatenate([jnp.full((R, 1), -1, jnp.int32), key2_s[:, :-1]], 1)
    distinct = (key2_s != prev2) & valid2  # first of each (cluster, qpos)
    dcid = key2_s >> 16
    prev_dcid = jnp.concatenate([jnp.full((R, 1), -1, jnp.int32), dcid[:, :-1]], 1)
    run_start = (dcid != prev_dcid) & valid2
    pos_idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (R, H))
    start_idx = jax.lax.cummax(jnp.where(run_start, pos_idx, 0), axis=1)
    next_start = jnp.concatenate([run_start[:, 1:], jnp.ones((R, 1), bool)], 1)
    is_end = valid2 & (next_start | ~jnp.concatenate(
        [valid2[:, 1:], jnp.zeros((R, 1), bool)], 1
    ))
    # segmented sums over contiguous runs via cumsum differences
    di = distinct.astype(jnp.int32)
    cs = jnp.cumsum(di, axis=1)
    cs_excl_at_start = jnp.take_along_axis(cs - di, start_idx, axis=1)
    seg_weight = cs - cs_excl_at_start
    weights_slot = jnp.where(is_end, seg_weight, 0)  # distinct qpos per cluster
    nh_slot = jnp.where(is_end, pos_idx - start_idx + 1, 0)
    pred_slot = jnp.take_along_axis(est2, start_idx, axis=1)

    w_row, slot_row = jax.lax.top_k(weights_slot, C)  # per strand row
    nh_row = jnp.take_along_axis(nh_slot, slot_row, axis=1)
    pred_row = jnp.take_along_axis(pred_slot, slot_row, axis=1)
    pred_row = jnp.where(w_row > 0, pred_row, BIG32)

    # ---- stage 3b: merge strands, keep per-read top candidates ---------
    # rows are [fwd x B, rev x B]; candidate axis becomes 2C with a strand
    # flag, and only the overall top C candidates get screened
    w2 = jnp.concatenate([w_row[:B], w_row[B:]], axis=1)  # (B, 2C)
    pred2 = jnp.concatenate([pred_row[:B], pred_row[B:]], axis=1)
    nh2 = jnp.concatenate([nh_row[:B], nh_row[B:]], axis=1)
    strand2 = jnp.concatenate(
        [jnp.zeros((B, C), jnp.int32), jnp.ones((B, C), jnp.int32)], axis=1
    )
    w_top, ci = jax.lax.top_k(w2, C)  # (B, C)
    pred = jnp.take_along_axis(pred2, ci, axis=1)
    nh = jnp.take_along_axis(nh2, ci, axis=1)
    strand = jnp.take_along_axis(strand2, ci, axis=1)

    # ---- stage 4: tier-1 ungapped screen -------------------------------
    G = concat.shape[0]
    offs = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    sidx = pred[..., None] + offs  # (B, C, L)
    in_b = (sidx >= 0) & (sidx < G)
    subj = jnp.where(in_b, concat[jnp.clip(sidx, 0, G - 1)], jnp.int8(4))
    # read codes on the candidate's strand: row = strand*B + read
    row_sel = strand * B + jnp.arange(B, dtype=jnp.int32)[:, None]  # (B, C)
    q3 = codes[row_sel]  # (B, C, L)
    l3 = lengths[row_sel]
    t_mm, t_cs, t_ce = tier1_stats_vec(
        q3.reshape(B * C, L), l3.reshape(B * C), subj.reshape(B * C, L)
    )

    return {
        "pred_start": pred,  # (B, C) concat coords
        "weight": w_top,
        "strand": strand,  # 0 = forward, 1 = reverse
        "num_hits": nh,
        "mismatches": t_mm.reshape(B, C),
        "clip_start": t_cs.reshape(B, C),
        "clip_end": t_ce.reshape(B, C),
    }

"""Fused on-device seeding: canonical minimizers -> table lookup ->
strand-aware diagonal clustering -> tier-1 ungapped screen, one jit per
read batch.

Ref: the short-read seeding stack
 - ShortKmerCodesTable.matchCompressed (ShortKmerCodesTable.java:344-420)
 - UngappedSearchHitsClusterBuilder.clusterRegionKmerAlns
   (UngappedSearchHitsClusterBuilder.java:43-375)
 - ShortReadsUngappedSearchHitsClusterAligner.countMismatches
   (ShortReadsUngappedSearchHitsClusterAligner.java:157-192)

TPU redesign: the reference walks per-read Java objects (hit lists,
TreeMaps) and aligns the forward and reverse-complement read separately
(SingleReadsAligner.java:46-75).  Here a whole read batch is one tensor
program with every hot array in native 32-bit types (TPU int64 is
emulated at ~3x cost):
 - k-mer codes are CANONICAL (min of fwd/rc) two-int32 halves, so one
   forward-strand pass finds matches on both genome strands — half the
   rows of a fwd+rev design, and the reverse-complement read never leaves
   the device (it is derived in the packed bit domain for the screen);
 - table lookup is a searchsorted over sorted uint32 keys with exact
   (hi, lo) int32 verification per query; entries carry the genome
   position with the canonical-strand flag in bit 31;
 - the match strand is query_flag XOR entry_flag; reverse matches use the
   reverse-read coordinate qlen-k-qpos so diagonals cluster per strand;
 - diagonal clustering is two per-row sorts + segmented cumsum stats
   (scatter-free: TPU scatters serialize);
 - the tier-1 screen compares 16-base bit-packed words (gather cost on
   this chip is per element, so packing cuts the subject gather ~16x) and
   expands the XOR mismatch bits to a bool mask for the clip statistics.
Only (reads, candidates) scalars return to the host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .minimizers import lookup_hash32, minimizer_hash30, select_minimizers
from .tier1 import tier1_stats_from_mask

BIG32 = jnp.int32(1 << 30)
# entry-row width of the bucketized table layout (index/minimizer_table.py
# builds one aligned (U, SEED_HITS_PER_KMER) row per code)
SEED_HITS_PER_KMER = 4


def pack_codes_words(codes: jnp.ndarray):
    """(R, L) int8 codes -> (packed, n2) uint32 (R, L//16) word arrays:
    base j of word w at bit 2*(j), non-ACGT flagged at the same bit of n2.
    L must be a multiple of 16 (pack_reads pads to 256-multiples)."""
    R, L = codes.shape
    W = L // 16
    c = codes.astype(jnp.uint32).reshape(R, W, 16)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    base = jnp.where(c < 4, c, 0)
    packed = jnp.bitwise_or.reduce((base << sh), axis=2)
    n2 = jnp.bitwise_or.reduce(((c >= 4).astype(jnp.uint32) << sh), axis=2)
    return packed, n2


def _bitrev_groups(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the sixteen 2-bit groups within each uint32 word."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << jnp.uint32(2)) | ((x >> jnp.uint32(2)) & m2)
    x = ((x & m4) << jnp.uint32(4)) | ((x >> jnp.uint32(4)) & m4)
    x = ((x & m8) << jnp.uint32(8)) | ((x >> jnp.uint32(8)) & m8)
    return (x << jnp.uint32(16)) | (x >> jnp.uint32(16))


def reverse_packed_rows(
    packed: jnp.ndarray,
    n2: jnp.ndarray,
    lengths: jnp.ndarray,
    const_len: int | None = None,
):
    """Reverse(-complement) packed read rows entirely in the packed bit
    domain: group-reversal within words + word flip reverses the padded row;
    a per-row left shift of (L - qlen) bases re-aligns the read to offset 0;
    complement is a plain XOR (N positions stay flagged in n2, so their
    garbage base bits never matter).  No per-base gathers.

    const_len: when every row has this length (the caller checks on host),
    the realigning shift is static — no take_along_axis (minor-axis gathers
    on this chip cost ~12ns per ELEMENT, dwarfing the actual bit math)."""
    R, W = packed.shape
    L = W * 16
    pr = jnp.flip(_bitrev_groups(packed), axis=1) ^ jnp.uint32(0xFFFFFFFF)
    nr = jnp.flip(_bitrev_groups(n2), axis=1)

    if const_len is not None:
        s = L - const_len
        wsh, ob = s >> 4, 2 * (s & 15)

        def shift_static(x):
            if wsh:
                x = jnp.concatenate(
                    [x[:, wsh:], jnp.zeros((R, wsh), x.dtype)], axis=1
                )
            if ob:
                hi = jnp.concatenate(
                    [x[:, 1:], jnp.zeros((R, 1), x.dtype)], axis=1
                )
                x = (x >> jnp.uint32(ob)) | (hi << jnp.uint32(32 - ob))
            return x

        return shift_static(pr), shift_static(nr)

    s = (L - lengths).astype(jnp.int32)  # bases to shift out
    wsh = (s >> 4)[:, None]
    o = (2 * (s & 15)).astype(jnp.uint32)[:, None]
    t = jnp.arange(W, dtype=jnp.int32)[None, :]
    idx0 = jnp.clip(t + wsh, 0, W - 1)
    idx1 = jnp.clip(t + wsh + 1, 0, W - 1)
    in1 = (t + wsh + 1) < W

    def shift(x):
        w0 = jnp.take_along_axis(x, idx0, axis=1)
        w1 = jnp.where(in1, jnp.take_along_axis(x, idx1, axis=1), 0)
        return jnp.where(o == 0, w0, (w0 >> o) | (w1 << (jnp.uint32(32) - o)))

    return shift(pr), shift(nr)


def gather_aligned_words(packed: jnp.ndarray, start: jnp.ndarray, n_words: int):
    """Gather `n_words` 16-base words beginning at arbitrary base offset
    `start` (any shape) from a packed uint32 genome, realigned in the packed
    domain (two shifts + or — no per-base gather).  Out-of-range words clamp;
    callers mask out-of-genome positions separately."""
    Wg = packed.shape[0]
    base_w = start >> 4  # arithmetic shift: floor division, negatives ok
    o = (start & 15).astype(jnp.uint32)  # base offset within word
    t = jnp.arange(n_words + 1, dtype=jnp.int32)
    idx = jnp.clip(base_w[..., None] + t, 0, Wg - 1)
    words = packed[idx]  # (..., n_words+1)
    sh = (2 * o)[..., None]
    w0 = words[..., :-1]
    w1 = words[..., 1:]
    # shift by 32 is undefined in XLA; the where() keeps the o==0 lane exact
    combined = (w0 >> sh) | (w1 << (jnp.uint32(32) - sh))
    return jnp.where(sh == 0, w0, combined)


@partial(
    jax.jit,
    static_argnames=(
        "k", "window", "genome_len", "max_minimizers", "hits_per_kmer",
        "max_clusters", "const_len", "genome_has_n",
    ),
)
def seed_cluster_screen(
    codes: jnp.ndarray,  # (B, L) int8 forward-strand read codes, OR uint8
    # packed (code | clamped_qual << 3) bytes — the quality bits ride the
    # same upload for the downstream genotyping scatter and are masked off
    # here (the dtype selects the unpacking at trace time)
    lengths: jnp.ndarray,  # (B,) int32
    hash_keys: jnp.ndarray,  # (U,) uint32 sorted lookup hash per distinct code
    ver_hi: jnp.ndarray,  # (U,) int32 exact canonical code high half per key
    ver_lo: jnp.ndarray,  # (U,) int32 exact canonical code low half per key
    row_offsets: jnp.ndarray,  # (U+1,) int32 CSR offsets
    entry_packed: jnp.ndarray,  # (E,) int32: fwd pos | canonical strand << 31
    packed_genome: jnp.ndarray,  # (Wg,) uint32 16-base packed genome
    genome_n2: jnp.ndarray,  # (Wg,) uint32 per-base non-ACGT flags (bit 2j)
    *,
    k: int,
    window: int,
    genome_len: int,
    max_minimizers: int = 16,
    hits_per_kmer: int = 4,
    max_clusters: int = 4,
    const_len: int | None = None,  # uniform read length (static fast paths)
    genome_has_n: bool = True,  # False skips the n2 word gather entirely
):
    from .kmers import kmer_codes_canonical_2x32

    if codes.dtype == jnp.uint8:
        codes = (codes & 7).astype(jnp.int8)
    B, L = codes.shape
    M, K, C = max_minimizers, hits_per_kmer, max_clusters
    H = M * K

    # ---- stage 1: canonical minimizer selection (int32-native) ---------
    khi, klo, kflag, valid = kmer_codes_canonical_2x32(codes, lengths, k)
    sel = select_minimizers(minimizer_hash30(khi, klo), valid, window)
    # compact selected positions to M slots (position order preserved):
    # M masked argmaxes over the selection ranks — top_k here lowered to a
    # full sorting network (~22ms per 32k batch for a 16-slot compaction)
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
    seli = jnp.stack(
        [
            jnp.argmax(sel & (rank == s), axis=1).astype(jnp.int32)
            for s in range(M)
        ],
        axis=1,
    )  # (B, M)
    # slots past the selected count point at argmax's fallback index 0 —
    # mask them (take_along_axis(sel, 0) may be True and would duplicate)
    n_sel = 1 + jnp.max(jnp.where(sel, rank, -1), axis=1)
    msel = jnp.take_along_axis(sel, seli, axis=1) & (
        jnp.arange(M, dtype=jnp.int32)[None, :] < n_sel[:, None]
    )
    mhi = jnp.take_along_axis(khi, seli, axis=1)
    mlo = jnp.take_along_axis(klo, seli, axis=1)
    mflag = jnp.take_along_axis(kflag, seli, axis=1)
    mpos = seli

    # ---- stage 2: table lookup ------------------------------------------
    qhash = lookup_hash32(mhi, mlo)
    if hash_keys.ndim == 2:
        # bucketized layout (MinimizerTable._build_bucketized): ONE row
        # gather of a combined [hi | lo | code-row | cnt | entries] bucket
        # row (row gathers on this chip cost per row, so one wide gather
        # beats several narrow ones), exact compare, then the matching
        # slot's inlined entry block selected with the same match mask —
        # no second dependent row gather, no element-granular gathers
        b_all, ep4 = hash_keys, entry_packed
        inline = ep4.shape[0] == 0
        W = (
            b_all.shape[1] // (4 + SEED_HITS_PER_KMER)
            if inline
            else b_all.shape[1] // 4
        )
        NB = b_all.shape[0]
        bidx = (qhash & jnp.uint32(NB - 1)).astype(jnp.int32)
        rows = b_all[bidx]  # (B, M, 4W [+ W*KH])
        match = (rows[..., :W] == mhi[..., None]) & (
            rows[..., W : 2 * W] == mlo[..., None]
        )
        found = msel & match.any(-1)
        mi = match.astype(jnp.int32)
        cnt = jnp.where(
            found, jnp.sum(rows[..., 3 * W : 4 * W] * mi, axis=-1), 0
        )
        cnt = jnp.minimum(cnt, K)
        kk = jnp.arange(K, dtype=jnp.int32)[None, None, :]
        hit_valid = kk < cnt[..., None]
        if inline:
            KH = SEED_HITS_PER_KMER
            assert K <= KH, f"hits-per-kmer K={K} exceeds inline slots {KH}"
            ent = rows[..., 4 * W :].reshape(rows.shape[:-1] + (W, KH))
            entry = jnp.sum(ent[..., :K] * mi[..., None], axis=-2)
        else:
            crow = jnp.where(
                found, jnp.sum(rows[..., 2 * W : 3 * W] * mi, axis=-1), 0
            )
            assert K <= ep4.shape[1]
            entry = ep4[crow][..., :K]
        entry = jnp.where(hit_valid, entry, 0)
    else:
        U = hash_keys.shape[0]
        r = jnp.clip(jnp.searchsorted(hash_keys, qhash), 0, max(U - 1, 0))
        if U > 0:
            # (hi, lo) verification alone decides membership: if the query
            # hash is absent, row r holds another code and the compare fails
            found = msel & (ver_hi[r] == mhi) & (ver_lo[r] == mlo)
        else:
            found = jnp.zeros_like(msel)
        start = jnp.where(found, row_offsets[r], 0)
        cnt = jnp.where(found, row_offsets[r + 1] - row_offsets[r], 0)
        cnt = jnp.minimum(cnt, K)
        kk = jnp.arange(K, dtype=jnp.int32)[None, None, :]
        hit_valid = kk < cnt[..., None]
        eidx = jnp.where(hit_valid, start[..., None] + kk, 0)
        entry = jnp.where(hit_valid, entry_packed[eidx], 0)
    spos = entry & jnp.int32(0x7FFFFFFF)
    sflag = (entry >> 31) & 1
    # match strand = query canonical flag XOR entry canonical flag; on the
    # reverse strand the read coordinate of the anchor is qlen - k - qpos
    mstr = mflag[..., None] ^ sflag
    qpos_f = jnp.broadcast_to(mpos[..., None], spos.shape)
    qpos_eff = jnp.where(
        mstr == 0, qpos_f, lengths[:, None, None] - k - qpos_f
    )
    est = jnp.where(hit_valid, spos - qpos_eff, BIG32)  # diagonal = est start
    strand_h = jnp.where(hit_valid, mstr, 2)  # invalid sorts last

    est = est.reshape(B, H)
    qpos = qpos_eff.reshape(B, H)
    strand_h = strand_h.reshape(B, H)

    # ---- stage 3: per-strand diagonal clustering (scatter-free) ---------
    # sort hits by (strand, est); clusters become contiguous runs
    str_s, est_s, qpos_s = jax.lax.sort((strand_h, est, qpos), dimension=1, num_keys=3)
    valid_s = str_s < 2
    tol = jnp.maximum(10, lengths // 10).astype(jnp.int32)[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -(1 << 30), jnp.int32), est_s[:, :-1]], 1)
    prev_str = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), str_s[:, :-1]], 1)
    brk = ((est_s - prev) > tol) | (str_s != prev_str)
    cid = jnp.cumsum(brk.astype(jnp.int32), axis=1) - 1
    cid = jnp.clip(cid, 0, H - 1)
    # re-sort by (cluster, query pos): runs stay contiguous, and the first
    # element of each run is the cluster's earliest query anchor
    key2 = jnp.where(valid_s, cid * jnp.int32(65536) + qpos_s, BIG32)
    key2_s, est2, str2 = jax.lax.sort((key2, est_s, str_s), dimension=1, num_keys=2)
    valid2 = key2_s < BIG32
    prev2 = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), key2_s[:, :-1]], 1)
    distinct = (key2_s != prev2) & valid2  # first of each (cluster, qpos)
    dcid = key2_s >> 16
    prev_dcid = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), dcid[:, :-1]], 1)
    run_start = (dcid != prev_dcid) & valid2
    pos_idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (B, H))
    start_idx = jax.lax.cummax(jnp.where(run_start, pos_idx, 0), axis=1)
    next_start = jnp.concatenate([run_start[:, 1:], jnp.ones((B, 1), bool)], 1)
    is_end = valid2 & (next_start | ~jnp.concatenate(
        [valid2[:, 1:], jnp.zeros((B, 1), bool)], 1
    ))
    # segmented sums over contiguous runs via cumsum differences.  The
    # run-start value of the (nondecreasing) exclusive cumsum propagates
    # with a cummax instead of a (B, H) minor-axis gather — element
    # gathers on this chip cost ~12ns each, and three full-width
    # take_along_axis here were ~70ms of a 190ms kernel
    di = distinct.astype(jnp.int32)
    cs = jnp.cumsum(di, axis=1)
    cs_excl_at_start = jax.lax.cummax(
        jnp.where(run_start, cs - di, -1), axis=1
    )
    seg_weight = cs - cs_excl_at_start
    weights_slot = jnp.where(is_end, seg_weight, 0)  # distinct qpos per cluster
    nh_slot = jnp.where(is_end, pos_idx - start_idx + 1, 0)

    # top-C clusters by weight: C masked argmax rounds (lax.top_k lowers
    # to a sorting network), then per-slot lookups only for the winners
    w_rem = weights_slot
    slots = []
    ws = []
    for _ in range(C):
        s = jnp.argmax(w_rem, axis=1).astype(jnp.int32)
        slots.append(s)
        ws.append(jnp.take_along_axis(w_rem, s[:, None], axis=1)[:, 0])
        w_rem = w_rem * (
            jnp.arange(H, dtype=jnp.int32)[None, :] != s[:, None]
        )
    slot = jnp.stack(slots, axis=1)  # (B, C)
    w_top = jnp.stack(ws, axis=1)
    nh = jnp.take_along_axis(nh_slot, slot, axis=1)
    sidx = jnp.take_along_axis(start_idx, slot, axis=1)  # run start of winner
    pred = jnp.take_along_axis(est2, sidx, axis=1)
    strand = jnp.take_along_axis(str2, sidx, axis=1)
    pred = jnp.where(w_top > 0, pred, BIG32)
    strand = jnp.clip(strand, 0, 1)

    # ---- stage 4: tier-1 ungapped screen on packed words ----------------
    Wr = L // 16
    pred_c = jnp.clip(pred, -BIG32, BIG32)  # avoid overflow in word math
    s_words = gather_aligned_words(packed_genome, pred_c, Wr)  # (B, C, Wr)
    s_n2 = (
        gather_aligned_words(genome_n2, pred_c, Wr)
        if genome_has_n
        else jnp.uint32(0)
    )
    q_packed, q_n2 = pack_codes_words(codes)  # (B, Wr)
    qr_packed, qr_n2 = reverse_packed_rows(q_packed, q_n2, lengths, const_len)
    rev = (strand == 1)[..., None]
    q_words = jnp.where(rev, qr_packed[:, None, :], q_packed[:, None, :])
    qn2 = jnp.where(rev, qr_n2[:, None, :], q_n2[:, None, :])
    x = q_words ^ s_words
    mism_bits = ((x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)) | s_n2 | qn2
    # expand bit 2j of each word to a (B, C, L) bool mismatch mask.  The
    # word axis expands via repeat so L stays the MINOR axis — the former
    # (..., Wr, 16) layout put a 16-wide minor dim on every intermediate,
    # which pads to the 128-lane tile (8x wasted VPU work and HBM)
    jsh_l = (2 * (jnp.arange(L, dtype=jnp.uint32) % 16))[None, None, :]
    m = (
        (jnp.repeat(mism_bits, 16, axis=-1)[..., :L] >> jsh_l)
        & jnp.uint32(1)
    ).astype(bool)
    # out-of-genome placements mismatch everywhere (old semantics: subj = N)
    offs = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    gpos = pred_c[..., None] + offs
    m = m | (gpos < 0) | (gpos >= genome_len)
    l3 = jnp.broadcast_to(lengths[:, None], (B, C))
    t_mm, t_cs, t_ce = tier1_stats_from_mask(
        m.reshape(B * C, L), l3.reshape(B * C)
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


@partial(jax.jit, static_argnames=("has_strs",))
def classify_candidates(
    pred: jnp.ndarray,  # (B, C) int32 predicted concat starts (BIG32 = none)
    weight: jnp.ndarray,  # (B, C) int32
    strand: jnp.ndarray,  # (B, C) int32
    mm: jnp.ndarray,  # (B, C) int32 tier-1 mismatches
    cs: jnp.ndarray,  # (B, C) int32 tier-1 clip start
    ce: jnp.ndarray,  # (B, C) int32 tier-1 clip end
    lengths: jnp.ndarray,  # (B,) int32
    offs: jnp.ndarray,  # (S+1,) int32 sequence concat offsets
    iv_lo: jnp.ndarray,  # (R,) int32 known-STR neighborhood bounds
    iv_hi: jnp.ndarray,
    min_mq: jnp.ndarray,  # () int32
    *,
    has_strs: bool,
):
    """Device-side mirror of the fused pipeline's candidate classification
    (fused_pipeline._classify_batch): fused/unique tier-1 accept,
    multi-candidate resolution, known-STR demotion, and host-cell
    compaction.  Only ~14 bytes/read cross the host link instead of the
    full (B, C) candidate matrix (the link is the bottleneck; VERDICT r2
    #2/#8).

    Mirrored thresholds: MIN_PROPORTION_BEST=0.2, MIN_WEIGHTED_COUNT=1
    (SingleReadsAligner.java:16-18), tier-1 accept mm<5%%/clip<10%%
    (ShortReadsUngappedSearchHitsClusterAligner.java:81-95), q=100-5*mm
    and the 0.8*best multi-alignment threshold
    (SingleReadsAligner.filterAlignments:118-143).

    Returns fused/resolved-drop flags, the selected column's placement for
    every row, DENSE host-cell lanes (pred, w|c|t1|strand, mm|cs|ce) with
    a (B*C,) mask the host compacts, and the two alignment counters."""
    B, C = pred.shape
    qlen = lengths[:, None]
    valid_c = (weight > 0) & (pred < (1 << 29)) & (pred >= 0)
    si = jnp.clip(
        jnp.searchsorted(offs, jnp.maximum(pred, 0), side="right") - 1,
        0,
        offs.shape[0] - 2,
    )
    w = weight
    # f64 threshold math mirrors the host/classic path bit-for-bit
    # (fused==classic equality depends on identical keep decisions)
    limit = jnp.minimum(1.0, 0.2 * w[:, :1].astype(jnp.float64))
    keep = valid_c
    keep_tail = keep[:, 1:] & (w[:, 1:].astype(jnp.float64) >= limit)
    keep = jnp.concatenate([keep[:, :1], keep_tail], axis=1)
    keep = jnp.cumprod(keep.astype(jnp.int32), axis=1).astype(bool)
    in_b = (pred >= offs[si]) & (pred + qlen <= offs[si + 1])
    t1 = (
        keep
        & in_b
        & (w > 2)
        & (mm * 20 < qlen)
        & ((cs + ce) * 10 < qlen)
    )
    n_kept = jnp.sum(keep, axis=1)
    minq = jnp.maximum(1, min_mq)
    fused = (n_kept == 1) & t1[:, 0] & (100 - mm[:, 0] * 5 >= minq)
    sel_col = jnp.zeros(B, jnp.int32)
    # ---- multi-candidate tier-1 resolution ----------------------------
    multi = (n_kept >= 2) & jnp.all(t1 | ~keep, axis=1)
    q = jnp.where(keep, 100 - 5 * mm, -(10 ** 9))
    best = jnp.max(q, axis=1)
    thr = jnp.trunc(0.8 * best.astype(jnp.float64)).astype(jnp.int32)
    n_final = jnp.sum(q > thr[:, None], axis=1)
    win = jnp.argmax(q, axis=1).astype(jnp.int32)
    if has_strs:
        # any kept candidate near a known STR forces the host tier-2 path
        last = pred + qlen
        k = jnp.clip(
            jnp.searchsorted(iv_lo, last, side="right") - 1,
            0,
            iv_lo.shape[0] - 1,
        )
        overl = keep & (iv_lo[k] <= last) & (iv_hi[k] >= pred)
        multi = multi & ~jnp.any(overl, axis=1)
    one = multi & (n_final == 1) & (best >= minq)
    resolved_drop = multi & ~one
    sel_col = jnp.where(one, win, sel_col)
    fused = fused | one
    aligned_extra = jnp.sum(
        (resolved_drop & ((n_final >= 2) | (best > 0))).astype(jnp.int32)
    )
    if has_strs:
        spred = jnp.take_along_axis(pred, sel_col[:, None], axis=1)[:, 0]
        last1 = spred + lengths
        k1 = jnp.clip(
            jnp.searchsorted(iv_lo, last1, side="right") - 1,
            0,
            iv_lo.shape[0] - 1,
        )
        overl1 = (iv_lo[k1] <= last1) & (iv_hi[k1] >= spred)
        fused = fused & ~overl1
    fused_count = jnp.sum(fused.astype(jnp.int32))

    take = lambda a: jnp.take_along_axis(a, sel_col[:, None], axis=1)[:, 0]
    sel_pred = take(pred)
    # one packed word per read: mm(10) | strand(1)<<10 | cs(10)<<11 |
    # ce(10)<<21 — halves the fetched per-read metadata (the host link
    # pays real time per MB on this tunnel)
    sel_ab = (
        jnp.clip(take(mm), 0, 0x3FF)
        | (jnp.clip(take(strand), 0, 1) << 10)
        | (jnp.clip(take(cs), 0, 0x3FF) << 11)
        | (jnp.clip(take(ce), 0, 0x3FF) << 21)
    )

    # ---- host cells: DENSE lanes + mask (host compacts) ----------------
    # the former on-device compaction was a (B*C, 4) scatter — TPU
    # scatters serialize (~36M lanes/s), ~15ms of a 38ms kernel — and
    # forced a separate cell-count prefetch plus an overflow re-dispatch
    # path; np.nonzero over 131k mask bytes costs ~1ms on host
    hostrow = jnp.any(keep, axis=1) & ~fused & ~resolved_drop
    cell = hostrow[:, None] & keep & in_b
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    lane2 = (
        jnp.clip(w, 0, 0xFFFF)
        | (cols << 16)
        | (t1.astype(jnp.int32) << 20)
        | (jnp.clip(strand, 0, 1) << 21)
    )
    lane3 = (
        jnp.clip(mm, 0, 0x3FF)
        | (jnp.clip(cs, 0, 0x3FF) << 10)
        | (jnp.clip(ce, 0, 0x3FF) << 20)
    )
    return {
        # int8, not bool: bool device->host copies are ~20x slower on the
        # link tunnel (see kernels/pairwise.dp_stats_pack)
        "fused": fused.astype(jnp.int8),
        "sel_pred": sel_pred,
        "sel_ab": sel_ab,
        "cell_mask": cell.reshape(-1).astype(jnp.int8),
        "cell_pred": pred.reshape(-1),
        "cell_l2": lane2.reshape(-1),
        "cell_l3": lane3.reshape(-1),
        "aligned_extra": aligned_extra,
        "fused_count": fused_count,
    }

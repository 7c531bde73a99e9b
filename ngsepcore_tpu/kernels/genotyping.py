"""Genotype likelihood + posterior math as dense batch tensors.

Ref: src/ngsep/discovery/CountsHelper.java — constants :42-48 (het rate
diploid 0.001, DEF_NUM_FREQUENCIES=501, min base q=3 excluded, max clamp
30, indel log error 1e-4), probability caches :135-185, per-call SNV
update :209-251, posterior with 1e-20 truncation :480-495 — and
VariantDiscoverySNVQAlgorithm.java:21-265 (genotype decision with +0.01
margins, GQ=0 => undecided, variant QS = phred(post[ref][ref])).

TPU redesign: the reference updates a 4x4 log-conditional matrix per allele
call inside the pileup listener (one scalar cache lookup per genotype cell
per call).  Because each call's contribution depends only on (observed
allele a, base quality q), the whole per-position matrix is a contraction

    logcond[p,i,j] = sum_{a,q} counts[p,a,q] * C[a,q,i,j]

where counts is a scatter-added (positions, 4 alleles, 31 quality bins)
tensor and C a constant (4,31,4,4) table — an MXU matmul of shape
(P,124)@(124,16).  float64 is kept for the contraction: the reference does
all of this in Java doubles and posterior truncation at 1e-20 is
parity-sensitive; the FLOP count is negligible next to alignment DP.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HET_RATE_DIPLOID = 0.001  # ref: CountsHelper.java:42
HET_RATE_HAPLOID = 1e-6
MIN_BASE_QS = 3  # calls with q<=3 excluded (ref :214-216)
MAX_BASE_QS = 30  # clamp (ref :217-218)
NUM_FREQ = 501
LOG_ERROR_PROB_INDEL = float(np.log10(1e-4))
N_QBINS = MAX_BASE_QS + 1  # quality axis 0..30 after clamping


def _log_caches(n_alleles: int, het_proportion: float = 0.5):
    """Numpy mirrors of logProbCacheError / logProbCacheGT rows used for SNVs."""
    q = np.arange(N_QBINS, dtype=np.float64)
    err_prob = 10.0 ** (-0.1 * q)
    log_err0 = -0.1 * q  # logProbCacheError[q][0]
    log_err_n = log_err0 - np.log10(n_alleles - 1)  # logProbCacheError[q][n]
    # f and g grid indices exactly like the reference rounding (ref :211-212;
    # Java Math.round is half-up)
    f = int(np.floor(het_proportion * (NUM_FREQ - 1) + 0.5))
    g = int(np.floor((1 - het_proportion) * (NUM_FREQ - 1) + 0.5))
    af_f = f / (NUM_FREQ - 1)
    af_g = g / (NUM_FREQ - 1)
    success = 1 - err_prob
    with np.errstate(divide="ignore"):  # q=0 rows are masked out below
        log_gt0 = np.log10(success)  # logProbCacheGT[*][q][0]
        log_gt_f = np.log10(af_f * success + (1 - af_f) * err_prob / (n_alleles - 1))
        log_gt_g = np.log10(af_g * success + (1 - af_g) * err_prob / (n_alleles - 1))
    return log_err0, log_err_n, log_gt0, log_gt_f, log_gt_g


def snv_contribution_table(n_alleles: int = 4, het_proportion: float = 0.5) -> np.ndarray:
    """C[a, q, i, j]: contribution of one call (allele a, quality q) to the
    log-conditional of ordered genotype (i,j).  Mirrors the update loop at
    CountsHelper.java:231-249."""
    log_err0, log_err_n, log_gt0, log_gt_f, log_gt_g = _log_caches(
        n_alleles, het_proportion
    )
    n = n_alleles
    C = np.zeros((n, N_QBINS, n, n), dtype=np.float64)
    for a in range(n):
        for i in range(n):
            for j in range(n):
                if i == j:
                    C[a, :, i, j] = log_gt0 if i == a else log_err_n
                elif j == a:
                    C[a, :, i, j] = log_gt_f
                elif i == a:
                    C[a, :, i, j] = log_gt_g
                else:
                    C[a, :, i, j] = log_err_n
    # calls with q <= MIN_BASE_QS are excluded entirely (ref :214-216)
    C[:, : MIN_BASE_QS + 1, :, :] = 0.0
    return C


@partial(jax.jit, static_argnames=("n_alleles", "out_size"))
def scatter_allele_counts(
    positions: jnp.ndarray,  # (N,) int32 window-relative positions
    alleles: jnp.ndarray,  # (N,) int8 observed allele index 0..3 (<0 = skip)
    quals: jnp.ndarray,  # (N,) int8 raw phred
    strands: jnp.ndarray,  # (N,) int8 1=negative
    n_alleles: int = 4,
    *,
    out_size: int,
):
    """Build (window, allele, qbin) count tensor + strand counts + low-qual
    counts by scatter-add — the dense replacement for the per-call pileup
    update loop (AlignmentsPileupGenerator/CountsHelper)."""
    valid = (alleles >= 0) & (positions >= 0) & (positions < out_size)
    q = jnp.clip(quals, 0, MAX_BASE_QS).astype(jnp.int32)
    low = valid & (quals <= MIN_BASE_QS)
    ok = valid & (quals > MIN_BASE_QS)
    pos = jnp.where(valid, positions, 0).astype(jnp.int32)
    al = jnp.where(valid, alleles, 0).astype(jnp.int32)
    counts = jnp.zeros((out_size, n_alleles, N_QBINS), jnp.int32)
    counts = counts.at[pos, al, q].add(ok.astype(jnp.int32))
    strand_counts = jnp.zeros((out_size, n_alleles, 2), jnp.int32)
    strand_counts = strand_counts.at[pos, al, strands.astype(jnp.int32)].add(
        ok.astype(jnp.int32)
    )
    low_qual = jnp.zeros((out_size,), jnp.int32).at[pos].add(low.astype(jnp.int32))
    total = jnp.zeros((out_size,), jnp.int32).at[pos].add(valid.astype(jnp.int32))
    return counts, strand_counts, low_qual, total


@partial(jax.jit, static_argnames=("n_alleles",))
def genotype_posteriors(
    counts: jnp.ndarray,  # (P, n, Q) int32
    contribution: jnp.ndarray,  # (n, Q, n, n) float64
    het_rate: float = HET_RATE_DIPLOID,
    n_alleles: int = 4,
):
    """Posterior genotype probabilities per position.

    Returns (post (P,n,n) float64, logcond (P,n,n) float64).
    Mirrors getPosteriorProbabilities + calculatePosteriorProbabilities
    (CountsHelper.java:410-495) including the 10^-20 truncation.
    """
    P = counts.shape[0]
    n = n_alleles
    logcond = jnp.einsum(
        "paq,aqij->pij", counts.astype(jnp.float64), contribution
    )
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    eye = jnp.eye(n, dtype=bool)
    prior = jnp.where(eye, log_prior_homo, log_prior_hetero)
    ev = logcond + prior[None, :, :]
    logmax = jnp.max(ev.reshape(P, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    total = jnp.sum(p.reshape(P, -1), axis=1)[:, None, None]
    return p / total, logcond


@partial(jax.jit, donate_argnames=("counts", "strand_counts", "low_qual", "total"))
def accumulate_allele_counts(
    counts: jnp.ndarray,  # (W, n, Q) int32
    strand_counts: jnp.ndarray,  # (W, n, 2) int32
    low_qual: jnp.ndarray,  # (W,) int32
    total: jnp.ndarray,  # (W,) int32
    positions: jnp.ndarray,  # (N,) int32 window-relative (<0 = skip)
    alleles: jnp.ndarray,  # (N,) int8
    quals: jnp.ndarray,  # (N,) int8
    strands: jnp.ndarray,  # (N,) int8
):
    """Scatter one fixed-size chunk of allele calls into existing count
    tensors (device-resident accumulation).  Chunked accumulation keeps
    compile shapes independent of coverage: any number of calls streams
    through the same executable."""
    out_size = counts.shape[0]
    valid = (alleles >= 0) & (positions >= 0) & (positions < out_size)
    q = jnp.clip(quals, 0, MAX_BASE_QS).astype(jnp.int32)
    low = valid & (quals <= MIN_BASE_QS)
    ok = valid & (quals > MIN_BASE_QS)
    pos = jnp.where(valid, positions, 0).astype(jnp.int32)
    al = jnp.where(valid, alleles, 0).astype(jnp.int32)
    counts = counts.at[pos, al, q].add(ok.astype(jnp.int32))
    strand_counts = strand_counts.at[pos, al, strands.astype(jnp.int32)].add(
        ok.astype(jnp.int32)
    )
    low_qual = low_qual.at[pos].add(low.astype(jnp.int32))
    total = total.at[pos].add(valid.astype(jnp.int32))
    return counts, strand_counts, low_qual, total


@partial(jax.jit, static_argnames=("N",))
def expand_mrun_calls(
    run_ref,  # (R,) int32 1-based seq position of each M-run start
    run_src,  # (R,) int32 offset of the run's first base in codes_flat
    run_len,  # (R,) int32 run length (ig5/ig3 trims pre-applied)
    run_strand,  # (R,) int32 1 = negative strand
    codes_flat,  # (C,) int8 concatenated read codes
    qflat,  # (C,) int8 per-base phred quals
    *,
    N: int,
):
    """Expand per-alignment M-runs into position-sorted packed base calls
    ON DEVICE — replaces the host pileup expansion of ~14M calls per
    sequence (call/aln_table.expand_calls, the former
    `call.expand_host_calls` stage) with one segmented-expand + sort.

    Returns (pos (N,) int32 ascending 1-based, attr (N,) int32, total):
    attr = qual(5b) | allele(3b)<<5 | strand<<8 — shifted left 20 at
    window-slice time it reproduces the span/hist kernels' pk layout
    (rel | qual<<20 | allele<<25 | strand<<28).  Slots past `total` carry
    pos=2^30-1 / attr=-1 so they sort last and scatter as no-ops."""
    R = run_len.shape[0]
    cum = jnp.cumsum(run_len.astype(jnp.int32))
    total = cum[-1]
    idx = jnp.arange(N, dtype=jnp.int32)
    rid = jnp.searchsorted(cum, idx, side="right")
    ridc = jnp.clip(rid, 0, R - 1)
    o = idx - (cum[ridc] - run_len[ridc])
    valid = idx < total
    pos = jnp.where(valid, run_ref[ridc] + o, jnp.int32(0x3FFFFFFF))
    src = jnp.clip(run_src[ridc] + o, 0, codes_flat.shape[0] - 1)
    code = jnp.clip(codes_flat[src].astype(jnp.int32), 0, 7)
    qq = jnp.clip(qflat[src].astype(jnp.int32), 0, MAX_BASE_QS)
    attr = qq | (code << 5) | (run_strand[ridc].astype(jnp.int32) << 8)
    attr = jnp.where(valid, attr, -1)
    order = jnp.argsort(pos)
    return pos[order], attr[order], total


@partial(jax.jit, static_argnames=("size",))
def window_pk_slice(pos, attr, lo, w0, count, *, size):
    """Per-window packed-call buffer from the device-resident sorted call
    arrays: pk[i] = (pos[lo+i] - w0) | attr[lo+i] << 20 for i < count,
    -1 padding to the static `size` (the callers' chunk/ladder shapes)."""
    k = jnp.arange(size, dtype=jnp.int32)
    idx = jnp.clip(lo + k, 0, pos.shape[0] - 1)
    a = attr[idx]
    pk = (pos[idx] - w0) | (a << 20)
    return jnp.where((k < count) & (a >= 0), pk, -1)


def _packed_scatter_body(counts, strand_counts, low_qual, total, packed):
    """Shared body: scatter packed calls into flat count tensors (see
    accumulate_allele_counts_packed for the packing layout)."""
    valid = packed >= 0
    rel = packed & 0xFFFFF
    q = (packed >> 20) & 31
    al = (packed >> 25) & 7
    st = (packed >> 28) & 1
    low = valid & (q <= MIN_BASE_QS)
    ok = valid & (q > MIN_BASE_QS)
    pos = jnp.where(valid, rel, 0)
    counts = counts.at[pos, al * N_QBINS + q].add(ok.astype(jnp.int32))
    strand_counts = strand_counts.at[pos, al * 2 + st].add(ok.astype(jnp.int32))
    low_qual = low_qual.at[pos].add(low.astype(jnp.int32))
    total = total.at[pos].add(valid.astype(jnp.int32))
    return counts, strand_counts, low_qual, total


@partial(jax.jit, donate_argnames=("counts", "strand_counts", "low_qual", "total"))
def accumulate_allele_counts_packed(
    counts: jnp.ndarray,  # (W, n*Q) int32 — FLAT (allele, qbin) minor axis
    strand_counts: jnp.ndarray,  # (W, n*2) int32 — flat (allele, strand)
    low_qual: jnp.ndarray,  # (W,) int32
    total: jnp.ndarray,  # (W,) int32
    packed: jnp.ndarray,  # (N,) int32: bit0-19 rel pos, 20-24 qual (pre-
    # clamped 0..30), 25-27 allele (4 = N: counts only toward total/low,
    # matching CountsHelper.updateCounts:209-220), 28 strand; negative = skip
):
    """Scatter one chunk of packed calls into FLAT count tensors.

    The minor axis is flattened to allele*Q+q (and allele*2+strand): a
    (W, 4, 31) layout pads each position to (8, 128) TPU tiles (8x memory)
    and — worse — a downstream reshape to (W, 124) before the genotype
    contraction sends XLA into a pathological minute-scale compile.  The
    flat layout tiles at 124/128 density and contracts directly.  N calls
    (allele 4) index out of bounds and drop from allele counts while still
    reaching `total`/`low_qual`, the CountsHelper.updateCounts semantics."""
    return _packed_scatter_body(counts, strand_counts, low_qual, total, packed)


@partial(
    jax.jit,
    donate_argnames=("counts", "strand_counts", "low_qual", "total"),
    static_argnames=("size",),
)
def accumulate_sorted_calls(
    counts: jnp.ndarray,  # (W, n, Q) int32
    strand_counts: jnp.ndarray,  # (W, n, 2) int32
    low_qual: jnp.ndarray,  # (W,) int32
    total: jnp.ndarray,  # (W,) int32
    pos: jnp.ndarray,  # (N,) int32 device-resident sorted 1-based positions
    attr: jnp.ndarray,  # (N,) int32 qual(5b) | allele<<5 | strand<<8
    lo: jnp.ndarray,  # scalar int32: first call index of this chunk
    w0: jnp.ndarray,  # scalar int32: window start (1-based)
    count: jnp.ndarray,  # scalar int32: calls in this chunk
    *,
    size: int,
):
    """Scatter one chunk of the device-expanded sorted call arrays
    (aln_table.device_calls / kernels.expand_mrun_calls) straight into
    (W, n, Q) count tensors — the multisample analog of the flagship's
    packed path: no host expansion, no per-chunk host repacking; only two
    int32 scalars and the chunk geometry cross the link per dispatch.
    Same update semantics as accumulate_allele_counts (N alleles index
    out of bounds and drop from counts while still reaching total)."""
    out_size = counts.shape[0]
    k = jnp.arange(size, dtype=jnp.int32)
    idx = jnp.clip(lo + k, 0, pos.shape[0] - 1)
    a = attr[idx]
    rel = pos[idx] - w0
    valid = (k < count) & (a >= 0) & (rel >= 0) & (rel < out_size)
    q = a & 31
    al = (a >> 5) & 7
    st = (a >> 8) & 1
    low = valid & (q <= MIN_BASE_QS)
    ok = valid & (q > MIN_BASE_QS)
    p = jnp.where(valid, rel, 0)
    counts = counts.at[p, al, q].add(ok.astype(jnp.int32))
    strand_counts = strand_counts.at[p, al, st].add(ok.astype(jnp.int32))
    low_qual = low_qual.at[p].add(low.astype(jnp.int32))
    total = total.at[p].add(valid.astype(jnp.int32))
    return counts, strand_counts, low_qual, total


def _tier1_scatter_body(
    counts, strand_counts, low_qual, total,
    codes, quals, lengths, keep, pred, cs, ce, strand,
):
    """Shared body: scatter one tier-1 read batch into flat count tensors
    (see accumulate_tier1_window)."""
    out_size = counts.shape[0]
    Lp = codes.shape[1]
    c = codes.astype(jnp.int32)  # (B, Lp)
    q = jnp.clip(quals.astype(jnp.int32), 0, MAX_BASE_QS)
    ln = lengths[:, None].astype(jnp.int32)
    j = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    rev = (strand == 1)[:, None]
    al = jnp.where(rev & (c < 4), 3 - c, c)
    # aligned offset of stored base j; clip window in stored coordinates
    off = jnp.where(rev, ln - 1 - j, j)
    lo = jnp.where(rev, ce[:, None], cs[:, None])
    hi = ln - jnp.where(rev, cs[:, None], ce[:, None])
    inread = (j >= lo) & (j < hi) & (keep != 0)[:, None]
    rel = pred[:, None] + off
    valid = inread & (rel >= 0) & (rel < out_size)
    pos = jnp.where(valid, rel, 0)
    low = valid & (q <= MIN_BASE_QS)
    ok = valid & (q > MIN_BASE_QS)
    st = jnp.broadcast_to(strand[:, None], al.shape)
    counts = counts.at[pos, al * N_QBINS + q].add(ok.astype(jnp.int32))
    strand_counts = strand_counts.at[pos, al * 2 + st].add(ok.astype(jnp.int32))
    low_qual = low_qual.at[pos].add(low.astype(jnp.int32))
    total = total.at[pos].add(valid.astype(jnp.int32))
    return counts, strand_counts, low_qual, total


@partial(jax.jit, donate_argnames=("counts", "strand_counts", "low_qual", "total"))
def accumulate_tier1_window(
    counts: jnp.ndarray,  # (W, n*Q) int32 flat minor axis (see packed kernel)
    strand_counts: jnp.ndarray,  # (W, n*2) int32
    low_qual: jnp.ndarray,  # (W,) int32
    total: jnp.ndarray,  # (W,) int32
    codes: jnp.ndarray,  # (B, Lp) int8 forward-strand read codes (device)
    quals: jnp.ndarray,  # (B, Lp) int8 phred qualities, read order (device)
    lengths: jnp.ndarray,  # (B,) int32
    keep: jnp.ndarray,  # (B,) int8: 1 = scatter this read into the window
    pred: jnp.ndarray,  # (B,) int32 predicted subject start - window start
    cs: jnp.ndarray,  # (B,) int32 soft-clip at aligned-read start
    ce: jnp.ndarray,  # (B,) int32 soft-clip at aligned-read end
    strand: jnp.ndarray,  # (B,) int32 1 = reverse
):
    """Fused pileup accumulation for tier-1 (ungapped) alignments straight
    from the aligner's device-resident read batch, so accepted reads
    contribute allele calls without ever materializing host-side alignment
    objects (the reference fires one listener call per (read, position)
    pair instead; AlignmentsPileupGenerator.java:377-403).

    Reverse-strand reads are handled WITHOUT any reordering gather (per-
    element gathers dominate on this chip): stored base j of a reverse read
    maps to aligned offset qlen-1-j with complemented allele and its own
    stored quality, so positions are mirrored instead of the row reversed.
    Per-call semantics mirror CountsHelper.updateCounts:209-251: every
    spanning base counts toward `total`; q<=3 only toward `low_qual`; N
    bases (code 4) never reach allele counts (OOB scatter lanes drop)."""
    return _tier1_scatter_body(
        counts, strand_counts, low_qual, total,
        codes, quals, lengths, keep, pred, cs, ce, strand,
    )


def _logcond_dot(csub, Cd, exact_f64: bool):
    """Exact-stage contraction counts @ log-likelihood table.

    Default: two-float (Dekker-split) f32 path — the f64 table splits into
    hi = f32(Cd) and the f32 residual lo, both contracted at HIGHEST
    precision and recombined in f64.  Counts are < 2^24 (exact in f32),
    so the only error is f32 accumulation over <=128 terms (~1e-4
    absolute worst-case at saturating depth, far below the +0.01 decision
    margins and GQ rounding granularity).  f64 emulation runs the MXU at
    ~1e-6 of peak; the f32 pair runs it natively.  `exact_f64=True`
    (-parityAudit) keeps the bit-exact emulated-f64 contraction.
    Ref constants preserved either way: CountsHelper.java:42-48,480-495.
    """
    if exact_f64:
        return jnp.dot(csub.astype(jnp.float64), Cd)
    hi = Cd.astype(jnp.float32)
    lo = (Cd - hi.astype(jnp.float64)).astype(jnp.float32)
    c32 = csub.astype(jnp.float32)
    p = jax.lax.Precision.HIGHEST
    return (
        jnp.dot(c32, hi, precision=p).astype(jnp.float64)
        + jnp.dot(c32, lo, precision=p).astype(jnp.float64)
    )


def _sparse_genotype_body(
    counts, strand_counts, total, ref_codes, contribution,
    het_rate, min_quality, n_alleles, max_flag, max_out,
    exact_f64=False,
):
    """Shared body of the screened genotyper (see genotype_window_sparse).

    Per-site outputs are thinned to `max_out` rows before they leave the
    program: the host↔device link pays ~tens of ms per MB, and real windows
    emit a few hundred sites, so shipping all `max_flag` rows wastes most
    of the transfer.  `n_sites` is exact; callers re-run with a larger
    max_out when n_sites > max_out (and larger max_flag when
    n_flagged > max_flag)."""
    P = counts.shape[0]
    n = n_alleles
    G = n * n
    rows = jnp.arange(P)
    ref = jnp.clip(ref_codes, 0, n - 1).astype(jnp.int32)

    # ---- stage 1: f32 screen over all positions (flat G axis) -----------
    # (reshaping the small contribution table is fine; it is the window-
    # scale operand whose minor-dim reshape stalls the compiler)
    Cf = contribution.astype(jnp.float32).reshape(n * N_QBINS, G)
    ev32 = jnp.dot(counts.astype(jnp.float32), Cf)  # (P, G)
    eye_flat = np.eye(n, dtype=bool).reshape(-1)
    log_prior_hetero32 = jnp.log10(het_rate / (n * (n - 1))).astype(jnp.float32)
    log_prior_homo32 = jnp.log10((1 - het_rate) / n).astype(jnp.float32)
    prior32 = jnp.where(jnp.asarray(eye_flat), log_prior_homo32, log_prior_hetero32)
    # unordered-pair evidence: het (i,j) posterior sums both orders (= +log10 2)
    pair32 = prior32 + jnp.asarray(
        np.where(eye_flat, 0.0, np.log10(2.0)).astype(np.float32)
    )
    ev_pair = ev32 + pair32[None, :]
    gref = ref * (n + 1)  # flat index of (ref, ref)
    # per-row extraction/masking via a one-hot compare — row-indexed
    # gathers are per-element on this chip, elementwise compares are free
    gidx = jnp.arange(G, dtype=jnp.int32)[None, :]
    is_ref_gt = gidx == gref[:, None]
    ref_ev = jnp.sum(jnp.where(is_ref_gt, ev_pair, 0.0), axis=1)
    best_ev = jnp.max(jnp.where(is_ref_gt, -jnp.inf, ev_pair), axis=1)
    # the screen only needs to cover f32 NUMERICAL error, not decision
    # semantics: when best_ev <= ref_ev exactly, the best non-ref posterior
    # cannot exceed the hom-ref posterior (let alone beat it by the +0.01
    # margin of VariantDiscoverySNVQAlgorithm:41), so the position decides
    # hom-ref.  f32 matmul error is ~1e-7 * depth * |C|max; 1e-4 * depth
    # plus a 0.01 floor is >100x that bound while flagging ~only real sites
    depth_tot = counts.sum(axis=1).astype(jnp.float32)
    slack = jnp.float32(0.01) + jnp.float32(1e-4) * depth_tot
    flag = (best_ev >= ref_ev - slack) & (total > 0)
    n_flagged = jnp.sum(flag.astype(jnp.int32))
    fidx = jnp.nonzero(flag, size=max_flag, fill_value=0)[0].astype(jnp.int32)
    in_flag = jnp.arange(max_flag) < n_flagged

    # ---- stage 2: exact path on flagged positions only ------------------
    csub = jnp.take(counts, fidx, axis=0)  # (F, n*Q)
    Cd = contribution.reshape(n * N_QBINS, G)
    logcond = _logcond_dot(csub, Cd, exact_f64).reshape(max_flag, n, n)
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    prior = jnp.where(
        jnp.asarray(np.eye(n, dtype=bool)), log_prior_homo, log_prior_hetero
    )
    ev = logcond + prior[None, :, :]
    F = max_flag
    logmax = jnp.max(ev.reshape(F, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    post = p / jnp.sum(p.reshape(F, -1), axis=1)[:, None, None]
    refs = jnp.take(ref, fidx)
    frows = jnp.arange(F)
    best = post[frows, refs, refs]
    bi = refs
    bj = refs
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = jnp.where(upd, prob, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)
    ref_prob = post[frows, refs, refs]
    one_minus = 1.0 - best
    gq = jnp.where(
        one_minus <= 0,
        255,
        jnp.minimum(jnp.round(-10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30))), 255),
    ).astype(jnp.int32)
    interesting = (
        ((bi != refs) | (bj != refs))
        & (jnp.take(ref_codes, fidx) < 4)
        & (gq >= min_quality)
        & (gq > 0)
        & (jnp.take(total, fidx) > 0)
        & in_flag
    )
    # interesting is a subset of flagged, so a max_flag-sized compaction
    # can never truncate sites; all remaining gathers permute the small
    # already-gathered flagged rows, thinned to the first max_out sites
    sidx = jnp.nonzero(interesting, size=max_flag, fill_value=0)[0][:max_out]
    k_valid = jnp.sum(interesting.astype(jnp.int32))
    gsel = jnp.take(fidx, sidx)
    depths_f = jnp.take(csub, sidx, axis=0).reshape(max_out, n, N_QBINS).sum(axis=2)
    return {
        "site_idx": gsel.astype(jnp.int32),
        "n_sites": k_valid,
        "n_flagged": n_flagged,
        "bi": jnp.take(bi, sidx).astype(jnp.int8),
        "bj": jnp.take(bj, sidx).astype(jnp.int8),
        "gq": jnp.take(gq, sidx),
        "ref_prob": jnp.take(ref_prob, sidx),
        "depths": depths_f,
        "total": jnp.take(total, gsel),
        "logcond": jnp.take(logcond, sidx, axis=0),
        "strand_counts": jnp.take(strand_counts, gsel, axis=0).reshape(
            max_out, n, 2
        ),
    }


@partial(
    jax.jit, static_argnames=("n_alleles", "max_flag", "max_out", "exact_f64")
)
def genotype_window_sparse(
    counts: jnp.ndarray,  # (W, n*Q) int32 flat (allele, qbin) minor axis
    strand_counts: jnp.ndarray,  # (W, n*2) int32
    total: jnp.ndarray,
    ref_codes: jnp.ndarray,  # (W,) int8
    contribution: jnp.ndarray,  # (n, Q, n, n) float64
    het_rate: jnp.ndarray,
    min_quality: jnp.ndarray,
    n_alleles: int = 4,
    max_flag: int = 1 << 14,
    max_out: int = 2048,
    exact_f64: bool = False,
):
    """Screened genotyping: a cheap float32 contraction over the whole
    window flags every position whose decision COULD differ from
    homozygous-reference (with a slack far above the f32 error bound);
    the parity-exact float64 math then runs only on the flagged sparse
    set.  float64 on this chip is VPU-emulated at ~2 GMAC/s, so skipping
    the ~99% all-reference positions is a >100x kernel-time cut with
    identical emitted records (same math as genotype_window_from_counts
    on every flagged position).  All window-scale arrays stay in flat
    2-D layouts — reshapes of (W, a, b) minor dims stall the TPU compiler.

    Returns compact per-site fields (first max_out sites) plus exact
    `n_sites`/`n_flagged`; callers must re-run with a larger max_flag
    when n_flagged > max_flag or larger max_out when n_sites > max_out."""
    return _sparse_genotype_body(
        counts, strand_counts, total, ref_codes, contribution,
        het_rate, min_quality, n_alleles, max_flag, max_out, exact_f64,
    )


@partial(
    jax.jit,
    static_argnames=("out_size", "n_alleles", "max_flag", "max_out"),
)
def genotype_window_fused(
    batches,  # tuple of per-batch tuples (codes, quals, lengths, keep,
    # pred, cs, ce, strand) — see accumulate_tier1_window for meanings
    packed: jnp.ndarray,  # (N,) int32 packed host-path calls (-1 = skip)
    ref_codes: jnp.ndarray,  # (out_size,) int8
    contribution: jnp.ndarray,  # (n, Q, n, n) float64
    het_rate: jnp.ndarray,
    min_quality: jnp.ndarray,
    *,
    out_size: int,
    n_alleles: int = 4,
    max_flag: int = 1 << 14,
    max_out: int = 2048,
):
    """One-program window genotyper: count-tensor init + tier-1 batch
    scatters + packed host-call scatter + screened genotyping, fused.

    On a network-attached accelerator every program execution pays a fixed
    ~tens-of-ms round trip, so the per-window chain (4 zero-fills, one
    scatter per batch, one packed scatter, one genotype kernel) is folded
    into a single executable: one dispatch, one result fetch.  Semantics
    are identical to running init_count_tensors_flat +
    accumulate_tier1_window* + accumulate_allele_counts_packed +
    genotype_window_sparse in sequence."""
    n = n_alleles
    acc = (
        jnp.zeros((out_size, n * N_QBINS), jnp.int32),
        jnp.zeros((out_size, n * 2), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
    )
    for b in batches:
        acc = _tier1_scatter_body(*acc, *b)
    acc = _packed_scatter_body(*acc, packed)
    counts, strand_counts, _low_qual, total = acc
    return _sparse_genotype_body(
        counts, strand_counts, total, ref_codes, contribution,
        het_rate, min_quality, n_alleles, max_flag, max_out,
    )


# meta matrix column layout for the compacted fused-read arrays
META_PRED, META_CS, META_CE, META_STRAND, META_LEN, META_COLS = 0, 1, 2, 3, 4, 8

# combined count tensor: cols 0..123 = (allele, qbin) ok calls, col 124 = N
# calls, col 125 = low-quality calls; `total` is the row sum.  128 columns
# tile exactly onto the (8, 128) int32 TPU layout — and folding N/low/total
# into one scatter halves the update count of the old 4-tensor design.
COL_N, COL_LOW, N_COLS = 124, 125, 128


def _span_scatter_counts(
    counts128, strand_flat, c, q, ln, keep, pred, cs, ce, strand
):
    """Scatter one span of tier-1 reads into the combined count tensor and
    the FLAT strand tensor.

    Layout notes (performance-critical): strand counts as a (W, 8) tensor
    tile-pad to (W, 128) int32 in HBM — 16x memory and zero-fill waste — so
    they live flat as (W*8,) with index pos*8 + allele*2 + strand.  Every
    lane makes exactly 2 scatter updates (combined-counts col + strand)
    instead of the 4 of the separate-tensor design."""
    out_size = counts128.shape[0]
    Lp = c.shape[1]
    q = jnp.clip(q.astype(jnp.int32), 0, MAX_BASE_QS)
    c = c.astype(jnp.int32)
    ln = ln[:, None].astype(jnp.int32)
    j = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    rev = (strand == 1)[:, None]
    al = jnp.where(rev & (c < 4), 3 - c, c)
    off = jnp.where(rev, ln - 1 - j, j)
    lo = jnp.where(rev, ce[:, None], cs[:, None])
    hi = ln - jnp.where(rev, cs[:, None], ce[:, None])
    inread = (j >= lo) & (j < hi) & (keep != 0)[:, None]
    rel = pred[:, None] + off
    valid = inread & (rel >= 0) & (rel < out_size)
    pos = jnp.where(valid, rel, 0)
    low = q <= MIN_BASE_QS
    okn = ~low  # q ok; allele may still be N
    col = jnp.where(
        low, COL_LOW, jnp.where(al < 4, al * N_QBINS + q, COL_N)
    )
    counts128 = counts128.at[pos, col].add(valid.astype(jnp.int32))
    st = jnp.broadcast_to(strand[:, None], al.shape)
    sidx = pos * 8 + jnp.minimum(al, 3) * 2 + st
    sval = (valid & okn & (al < 4)).astype(jnp.int32)
    strand_flat = strand_flat.at[jnp.where(valid, sidx, 0)].add(sval)
    return counts128, strand_flat


def _span_packed_scatter(counts128, strand_flat, packed):
    """Host-path packed calls into the combined/flat tensors (same packing
    as accumulate_allele_counts_packed)."""
    valid = packed >= 0
    rel = packed & 0xFFFFF
    q = (packed >> 20) & 31
    al = (packed >> 25) & 7
    st = (packed >> 28) & 1
    low = q <= MIN_BASE_QS
    pos = jnp.where(valid, rel, 0)
    col = jnp.where(low, COL_LOW, jnp.where(al < 4, al * N_QBINS + q, COL_N))
    counts128 = counts128.at[pos, col].add(valid.astype(jnp.int32))
    sidx = pos * 8 + jnp.minimum(al, 3) * 2 + st
    sval = (valid & ~low & (al < 4)).astype(jnp.int32)
    strand_flat = strand_flat.at[jnp.where(valid, sidx, 0)].add(sval)
    return counts128, strand_flat


def _sparse_genotype_body_flat(
    counts128, strand_flat, ref_codes, contribution,
    het_rate, min_quality, n_alleles, max_flag, max_out,
    exact_f64=False,
):
    """Screened genotyper over the combined (W, 128) count tensor and flat
    strand tensor (see _span_scatter_counts).  Same math/decisions as
    _sparse_genotype_body; `total` is derived as the row sum (every valid
    spanning call lands in exactly one column), saving its scatter."""
    P = counts128.shape[0]
    n = n_alleles
    G = n * n
    ref = jnp.clip(ref_codes, 0, n - 1).astype(jnp.int32)
    total = jnp.sum(counts128, axis=1)

    # zero-padded contraction tables: cols >= 124 (N/low) contribute nothing
    Cd = jnp.zeros((N_COLS, G), jnp.float64)
    Cd = Cd.at[: n * N_QBINS].set(contribution.reshape(n * N_QBINS, G))

    # ---- stage 1: f32 screen over all positions -------------------------
    ev32 = jnp.dot(counts128.astype(jnp.float32), Cd.astype(jnp.float32))
    eye_flat = np.eye(n, dtype=bool).reshape(-1)
    log_prior_hetero32 = jnp.log10(het_rate / (n * (n - 1))).astype(jnp.float32)
    log_prior_homo32 = jnp.log10((1 - het_rate) / n).astype(jnp.float32)
    prior32 = jnp.where(jnp.asarray(eye_flat), log_prior_homo32, log_prior_hetero32)
    pair32 = prior32 + jnp.asarray(
        np.where(eye_flat, 0.0, np.log10(2.0)).astype(np.float32)
    )
    ev_pair = ev32 + pair32[None, :]
    gref = ref * (n + 1)
    gidx = jnp.arange(G, dtype=jnp.int32)[None, :]
    is_ref_gt = gidx == gref[:, None]
    ref_ev = jnp.sum(jnp.where(is_ref_gt, ev_pair, 0.0), axis=1)
    best_ev = jnp.max(jnp.where(is_ref_gt, -jnp.inf, ev_pair), axis=1)
    # slack covers only f32 numerical error (see _sparse_genotype_body)
    depth_tot = total.astype(jnp.float32)
    slack = jnp.float32(0.01) + jnp.float32(1e-4) * depth_tot
    flag = (best_ev >= ref_ev - slack) & (total > 0)
    n_flagged = jnp.sum(flag.astype(jnp.int32))
    fidx = jnp.nonzero(flag, size=max_flag, fill_value=0)[0].astype(jnp.int32)
    in_flag = jnp.arange(max_flag) < n_flagged

    # ---- stage 2: exact path on flagged positions only ------------------
    csub = jnp.take(counts128, fidx, axis=0)  # (F, 128)
    logcond = _logcond_dot(csub, Cd, exact_f64).reshape(max_flag, n, n)
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    prior = jnp.where(
        jnp.asarray(np.eye(n, dtype=bool)), log_prior_homo, log_prior_hetero
    )
    ev = logcond + prior[None, :, :]
    F = max_flag
    logmax = jnp.max(ev.reshape(F, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    post = p / jnp.sum(p.reshape(F, -1), axis=1)[:, None, None]
    refs = jnp.take(ref, fidx)
    frows = jnp.arange(F)
    best = post[frows, refs, refs]
    bi = refs
    bj = refs
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = jnp.where(upd, prob, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)
    ref_prob = post[frows, refs, refs]
    one_minus = 1.0 - best
    gq = jnp.where(
        one_minus <= 0,
        255,
        jnp.minimum(jnp.round(-10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30))), 255),
    ).astype(jnp.int32)
    interesting = (
        ((bi != refs) | (bj != refs))
        & (jnp.take(ref_codes, fidx) < 4)
        & (gq >= min_quality)
        & (gq > 0)
        & (jnp.take(total, fidx) > 0)
        & in_flag
    )
    sidx = jnp.nonzero(interesting, size=max_flag, fill_value=0)[0][:max_out]
    k_valid = jnp.sum(interesting.astype(jnp.int32))
    gsel = jnp.take(fidx, sidx)
    depths_f = (
        jnp.take(csub, sidx, axis=0)[:, : n * N_QBINS]
        .reshape(max_out, n, N_QBINS)
        .sum(axis=2)
    )
    stidx = gsel[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
    strand_rows = jnp.take(strand_flat, stidx.reshape(-1)).reshape(max_out, n, 2)
    return {
        "site_idx": gsel.astype(jnp.int32),
        "n_sites": k_valid,
        "n_flagged": n_flagged,
        "bi": jnp.take(bi, sidx).astype(jnp.int8),
        "bj": jnp.take(bj, sidx).astype(jnp.int8),
        "gq": jnp.take(gq, sidx),
        "ref_prob": jnp.take(ref_prob, sidx),
        "depths": depths_f,
        "total": jnp.take(total, gsel),
        "logcond": jnp.take(logcond, sidx, axis=0),
        "strand_counts": strand_rows,
    }


@partial(
    jax.jit,
    static_argnames=(
        "out_size", "rows", "n_alleles", "max_flag", "max_out", "exact_f64"
    ),
)
def genotype_window_span(
    pq: jnp.ndarray,  # (F, Lp) uint8 packed reads: bits0-2 base code,
    # bits 3-7 phred quality pre-clamped to 0..30 (one byte per base so the
    # batch crosses the host link once for both seeding and genotyping)
    meta: jnp.ndarray,  # (F, META_COLS) int32 per-read metadata, rows sorted
    # by predicted start: [pred (concat coords), clip_start, clip_end,
    # strand, length, ...pad]
    start: jnp.ndarray,  # scalar int32: first fused row of this window's span
    count: jnp.ndarray,  # scalar int32: rows in the span
    w0: jnp.ndarray,  # scalar int32: window start, concatenated coords
    packed: jnp.ndarray,  # (N,) int32 packed host-path calls (-1 = skip)
    ref_codes: jnp.ndarray,  # (out_size,) int8
    contribution: jnp.ndarray,  # (n, Q, n, n) float64
    het_rate: jnp.ndarray,
    min_quality: jnp.ndarray,
    *,
    out_size: int,
    rows: int,
    n_alleles: int = 4,
    max_flag: int = 1 << 12,
    max_out: int = 1024,
    exact_f64: bool = False,
):
    """Window genotyper over a CONTIGUOUS SPAN of the run-wide fused-read
    arrays: count-tensor init + tier-1 span scatter + packed host-call
    scatter + screened genotyping in one program.

    The fused reads of the whole run are compacted once (on device) into
    arrays sorted by predicted start, so each window's reads are a
    contiguous row range selected here by `lax.dynamic_slice` — per-window
    work is O(reads-in-window), not O(whole batch).  The predecessor design
    passed every aligner batch to every window program, so a b-batch run
    re-scanned all B rows per window (n_windows x B x Lp scatter lanes); at
    yeast-genome window counts that dominated the pipeline (ref behavior
    being replaced: AlignmentsPileupGenerator.java:377-403 advances
    per-read, per-position).  Callers must pad the row arrays so
    start+rows never exceeds F (padded rows are masked by `count`)."""
    import jax.lax as lax

    counts128 = jnp.zeros((out_size, N_COLS), jnp.int32)
    strand_flat = jnp.zeros((out_size * 8,), jnp.int32)
    sl = lax.dynamic_slice_in_dim(pq, start, rows, 0)
    mt = lax.dynamic_slice_in_dim(meta, start, rows, 0)
    c = (sl & 7).astype(jnp.int8)
    q = (sl >> 3).astype(jnp.int8)
    keep = (jnp.arange(rows, dtype=jnp.int32) < count).astype(jnp.int8)
    pred_rel = mt[:, META_PRED] - w0
    counts128, strand_flat = _span_scatter_counts(
        counts128, strand_flat, c, q, mt[:, META_LEN], keep, pred_rel,
        mt[:, META_CS], mt[:, META_CE], mt[:, META_STRAND],
    )
    counts128, strand_flat = _span_packed_scatter(counts128, strand_flat, packed)
    return _sparse_genotype_body_flat(
        counts128, strand_flat, ref_codes, contribution,
        het_rate, min_quality, n_alleles, max_flag, max_out, exact_f64,
    )


def genotype_window_span_resolve_batch(pending: list, kernel=None) -> list:
    """Resolve MANY dispatched window programs with one batched fetch.

    `pending` is a list of (span_args, first_res).  A single jax.device_get
    over every result dict issues all host copies concurrently — the
    per-window sequential fetch paid one network round trip per window,
    which dominated genotyping wall-clock on link-attached devices.
    Stragglers whose f32 screen overflowed the default bounds are
    re-dispatched with grown bounds (pathological windows only).
    `kernel` overrides the retry dispatch (the mesh-sharded pipeline passes
    its shard_map-wrapped span kernel)."""
    import jax.numpy as jnp

    if kernel is None:
        kernel = genotype_window_span

    firsts = [first for _, first in pending]
    # stack result leaves across windows before fetching: the host link
    # pays a fixed per-ARRAY cost, so one (n_windows, ...) array per field
    # beats n_windows small arrays by the window count.  All first attempts
    # share DEF_MAX_FLAG/DEF_MAX_OUT shapes, so stacking is well-formed.
    if len(firsts) > 1:
        stacked = jax.device_get(
            jax.tree.map(lambda *xs: jnp.stack(xs), *firsts)
        )
        outs = [
            jax.tree.map(lambda a, i=i: a[i], stacked)
            for i in range(len(firsts))
        ]
    else:
        outs = jax.device_get(firsts)
    final = []
    retry = []
    for i, ((span_args, _), out) in enumerate(zip(pending, outs)):
        if (
            _needs_retry(out, DEF_MAX_FLAG, DEF_MAX_OUT)
            or int(out.get("span_overflow", 0))
        ):
            retry.append((i, span_args, out))
        final.append(out)
    for i, span_args, out in retry:
        max_flag, max_out = DEF_MAX_FLAG, DEF_MAX_OUT
        (
            pq, meta, start, count, w0, packed, ref_codes, contribution,
            het, minq, out_size, rows,
        ) = span_args
        k = kernel
        if int(out.get("span_overflow", 0)):
            # a mesh chunk's read span exceeded its static row budget
            # (pathologically skewed coverage): this window falls back to
            # the unsharded kernel, which is correct at any skew
            k = genotype_window_span
            out = jax.device_get(
                k(
                    pq, meta, start, count, w0, packed, ref_codes,
                    contribution, het, minq,
                    out_size=out_size, rows=rows,
                )
            )
        while _needs_retry(out, max_flag, max_out):
            max_flag, max_out = _grown_bounds(out, max_flag, max_out)
            res = k(
                pq, meta, start, count, w0, packed, ref_codes, contribution,
                het, minq,
                out_size=out_size, rows=rows, max_flag=max_flag,
                max_out=max_out,
            )
            out = jax.device_get(res)
        final[i] = out
    return final


def genotype_window_span_resolved(span_args, first_res=None):
    """Host wrapper over genotype_window_span: fetch + grow-and-retry when
    the f32 screen flags more rows than max_flag or more sites are called
    than max_out (pathological windows only)."""
    (
        pq, meta, start, count, w0, packed, ref_codes, contribution,
        het, minq, out_size, rows,
    ) = span_args
    max_flag, max_out = DEF_MAX_FLAG, DEF_MAX_OUT
    res = first_res
    if res is None:
        res = genotype_window_span(
            pq, meta, start, count, w0, packed, ref_codes, contribution,
            het, minq,
            out_size=out_size, rows=rows, max_flag=max_flag, max_out=max_out,
        )
    out = jax.device_get(res)
    while _needs_retry(out, max_flag, max_out):
        max_flag, max_out = _grown_bounds(out, max_flag, max_out)
        res = genotype_window_span(
            pq, meta, start, count, w0, packed, ref_codes, contribution,
            het, minq,
            out_size=out_size, rows=rows, max_flag=max_flag, max_out=max_out,
        )
        out = jax.device_get(res)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "window", "nq", "lanes", "n_alleles", "max_flag", "max_out",
        "exact_f64",
    ),
)
def genotype_window_hist(
    stage_t: jnp.ndarray,  # (Lp, S) uint8 transposed col-byte stage
    w0s: jnp.ndarray,  # scalar int32: stage col of window position 0
    colg: jnp.ndarray,  # (Fall, Lp) uint8 genome-oriented col bytes (all reads)
    res_idx: jnp.ndarray,  # (Rb,) int32 residual rows into colg
    res_pred: jnp.ndarray,  # (Rb,) int32 residual start rel. to window
    res_n: jnp.ndarray,  # scalar int32 valid residual rows
    packed: jnp.ndarray,  # (N,) int32 packed host-path calls (-1 = skip)
    ref_codes: jnp.ndarray,  # (window,) int8
    contribution: jnp.ndarray,  # (4, Q, 4, 4) float64 (full 31-bin table)
    expand: jnp.ndarray,  # (128, 128) f32 0/1: binned cols -> dense 124-col
    cdb32: jnp.ndarray,  # (128, 16) f32 screen table rows per BINNED col
    qual_bin: jnp.ndarray,  # (31,) int32 quality -> bin
    het_rate: jnp.ndarray,
    min_quality: jnp.ndarray,
    *,
    window: int,
    nq: int,
    lanes: int,
    n_alleles: int = 4,
    max_flag: int = 1 << 12,
    max_out: int = 1024,
    exact_f64: bool = False,
):
    """Window genotyper over the scatter-free shear-histogram pileup
    (kernels/shear_pileup.py).  Same screen/exact math and outputs as
    genotype_window_span; the exact stage expands the adaptive-bin counts
    back to the dense (allele x 31-qual) columns with an exact 0/1 matmul
    so the float64 contraction (logcond = counts @ Cd) sums the same terms
    in the same order (absent-quality columns contribute exact +0.0)."""
    from .shear_pileup import (
        hist_packed_scatter,
        hist_residual_scatter,
        shear_hist,
    )

    n = n_alleles
    G = n * n
    ncnt = 4 * nq + 2
    hist = shear_hist(stage_t, w0s, window=window, nq=nq, lanes=lanes)
    rb = res_idx.shape[0]
    res_rows = jnp.take(colg, res_idx, axis=0)
    res_ok = jnp.arange(rb, dtype=jnp.int32) < res_n
    hist = hist_residual_scatter(hist, res_rows, res_pred, res_ok, nq)
    hist = hist_packed_scatter(hist, packed, qual_bin, nq, MIN_BASE_QS)

    ref = jnp.clip(ref_codes, 0, n - 1).astype(jnp.int32)
    total = jnp.sum(hist[:, :ncnt], axis=1)

    # ---- stage 1: f32 screen over all positions (binned columns) --------
    ev32 = jnp.dot(
        hist.astype(jnp.float32), cdb32, preferred_element_type=jnp.float32
    )
    eye_flat = np.eye(n, dtype=bool).reshape(-1)
    log_prior_hetero32 = jnp.log10(het_rate / (n * (n - 1))).astype(jnp.float32)
    log_prior_homo32 = jnp.log10((1 - het_rate) / n).astype(jnp.float32)
    prior32 = jnp.where(jnp.asarray(eye_flat), log_prior_homo32, log_prior_hetero32)
    pair32 = prior32 + jnp.asarray(
        np.where(eye_flat, 0.0, np.log10(2.0)).astype(np.float32)
    )
    ev_pair = ev32 + pair32[None, :]
    gref = ref * (n + 1)
    gidx = jnp.arange(G, dtype=jnp.int32)[None, :]
    is_ref_gt = gidx == gref[:, None]
    ref_ev = jnp.sum(jnp.where(is_ref_gt, ev_pair, 0.0), axis=1)
    best_ev = jnp.max(jnp.where(is_ref_gt, -jnp.inf, ev_pair), axis=1)
    depth_tot = total.astype(jnp.float32)
    slack = jnp.float32(0.01) + jnp.float32(1e-4) * depth_tot
    flag = (best_ev >= ref_ev - slack) & (total > 0)
    n_flagged = jnp.sum(flag.astype(jnp.int32))
    # two-level compaction: jnp.nonzero over the full window costs ~70ms on
    # a 1 Mbp window; restricting the expensive pass to flagged 32-position
    # tiles (at most one tile per flagged position, so max_flag tiles) cuts
    # it ~6x while preserving ascending order
    tiles = flag.reshape(-1, 32)
    tflags = jnp.any(tiles, axis=1)
    n_tiles = jnp.sum(tflags.astype(jnp.int32))
    tidx = jnp.nonzero(tflags, size=max_flag, fill_value=0)[0].astype(jnp.int32)
    sub = jnp.take(tiles, tidx, axis=0)  # (max_flag, 32)
    valid_t = (jnp.arange(max_flag, dtype=jnp.int32) < n_tiles)[:, None]
    flat_pos = (
        tidx[:, None] * 32 + jnp.arange(32, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    flat_flag = (sub & valid_t).reshape(-1)
    fsel = jnp.nonzero(flat_flag, size=max_flag, fill_value=0)[0]
    fidx = jnp.take(flat_pos, fsel).astype(jnp.int32)
    in_flag = jnp.arange(max_flag) < n_flagged

    # ---- stage 2: exact math on flagged positions, dense 124-col layout -
    csub_b = jnp.take(hist, fidx, axis=0)  # (F, 128) binned layout
    csub = jnp.dot(
        csub_b.astype(jnp.float32), expand, preferred_element_type=jnp.float32
    ).astype(jnp.float64)  # exact: counts < 2^24, expand is 0/1
    Cd = jnp.zeros((N_COLS, G), jnp.float64)
    Cd = Cd.at[: n * N_QBINS].set(contribution.reshape(n * N_QBINS, G))
    logcond = _logcond_dot(csub, Cd, exact_f64).reshape(max_flag, n, n)
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    prior = jnp.where(
        jnp.asarray(np.eye(n, dtype=bool)), log_prior_homo, log_prior_hetero
    )
    ev = logcond + prior[None, :, :]
    F = max_flag
    logmax = jnp.max(ev.reshape(F, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    post = p / jnp.sum(p.reshape(F, -1), axis=1)[:, None, None]
    refs = jnp.take(ref, fidx)
    frows = jnp.arange(F)
    best = post[frows, refs, refs]
    bi = refs
    bj = refs
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = jnp.where(upd, prob, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)
    ref_prob = post[frows, refs, refs]
    one_minus = 1.0 - best
    gq = jnp.where(
        one_minus <= 0,
        255,
        jnp.minimum(jnp.round(-10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30))), 255),
    ).astype(jnp.int32)
    interesting = (
        ((bi != refs) | (bj != refs))
        & (jnp.take(ref_codes, fidx) < 4)
        & (gq >= min_quality)
        & (gq > 0)
        & (jnp.take(total, fidx) > 0)
        & in_flag
    )
    sidx = jnp.nonzero(interesting, size=max_flag, fill_value=0)[0][:max_out]
    k_valid = jnp.sum(interesting.astype(jnp.int32))
    gsel = jnp.take(fidx, sidx)
    depths_f = (
        jnp.take(csub, sidx, axis=0)[:, : n * N_QBINS]
        .reshape(-1, n, N_QBINS)
        .sum(axis=2)
    )
    from .shear_pileup import STRAND_COL0

    strand_rows = (
        jnp.take(csub_b, sidx, axis=0)[:, STRAND_COL0:]
        .reshape(-1, n, 2)
        .astype(jnp.int32)
    )
    return {
        "site_idx": gsel.astype(jnp.int32),
        "n_sites": k_valid,
        "n_flagged": n_flagged,
        "bi": jnp.take(bi, sidx).astype(jnp.int8),
        "bj": jnp.take(bj, sidx).astype(jnp.int8),
        "gq": jnp.take(gq, sidx),
        "ref_prob": jnp.take(ref_prob, sidx),
        "depths": depths_f,
        "total": jnp.take(total, gsel),
        "logcond": jnp.take(logcond, sidx, axis=0),
        "strand_counts": strand_rows,
    }


def hist_tables(
    nq: int,
    qual_levels: np.ndarray,
    contribution: np.ndarray | None = None,
    n_alleles: int = 4,
):
    """(expand, cdb32, qual_bin) numpy tables for genotype_window_hist.

    qual_levels: sorted distinct clamped base qualities present in the run
    (length nq).  expand maps binned columns to the dense al*31+q layout;
    cdb32 is the f32 screen table with one row per binned column (strand
    and unused columns zero) built from the SAME contribution table the
    exact stage uses; qual_bin maps a clamped quality 0..30 to its bin
    (absent qualities map to bin 0 — they never occur in data)."""
    n = n_alleles
    C = (
        np.asarray(contribution)
        if contribution is not None
        else snv_contribution_table(n)
    )
    G = n * n
    expand = np.zeros((128, 128), np.float32)
    cdb32 = np.zeros((128, G), np.float32)
    qual_bin = np.zeros(31, np.int32)
    for b, q in enumerate(qual_levels):
        qual_bin[int(q)] = b
        for a in range(n):
            expand[a * nq + b, a * N_QBINS + int(q)] = 1.0
            cdb32[a * nq + b] = C[a, int(q)].reshape(G).astype(np.float32)
    return expand, cdb32, qual_bin


def genotype_window_hist_resolve_batch(pending: list) -> list:
    """Batched fetch + grow-and-retry for genotype_window_hist results.
    `pending` entries are ((args, static_kwargs), first_res)."""
    firsts = [first for _, first in pending]
    if len(firsts) > 1:
        stacked = jax.device_get(
            jax.tree.map(lambda *xs: jnp.stack(xs), *firsts)
        )
        outs = [
            jax.tree.map(lambda a, i=i: a[i], stacked)
            for i in range(len(firsts))
        ]
    else:
        outs = jax.device_get(firsts)
    final = []
    retry = []
    for i, ((call_args, _), out) in enumerate(zip(pending, outs)):
        if _needs_retry(out, DEF_MAX_FLAG, DEF_MAX_OUT):
            retry.append((i, call_args, out))
        final.append(out)
    for i, (args, kwargs), out in retry:
        max_flag, max_out = DEF_MAX_FLAG, DEF_MAX_OUT
        while _needs_retry(out, max_flag, max_out):
            max_flag, max_out = _grown_bounds(out, max_flag, max_out)
            res = genotype_window_hist(
                *args, **kwargs, max_flag=max_flag, max_out=max_out
            )
            out = jax.device_get(res)
        final[i] = out
    return final


@partial(jax.jit, donate_argnames=("pq_out",))
def place_fused_rows(
    pq_out: jnp.ndarray,  # (F_pad, Lp) uint8 compacted packed reads
    pq_batch: jnp.ndarray,  # (B, Lpb) uint8 one aligner batch, device-resident
    src: jnp.ndarray,  # (Rb,) int32 fused row indices within the batch
    dst: jnp.ndarray,  # (Rb,) int32 destination rows (sorted-by-pred order;
    # sentinel lanes point at a pad row and are later masked by span counts)
):
    """Scatter one batch's fused rows into the run-wide compacted read
    array — the batch matrix uploaded for seeding is reused, so read bases
    cross the host link exactly once per run.  Placement meta is built on
    the host (the per-read accepted placements live there after
    multi-candidate resolution and late fusing)."""
    rows = jnp.take(pq_batch, src, axis=0)
    Lp_out = pq_out.shape[1]
    if rows.shape[1] > Lp_out:  # compacted width trimmed to longest read
        rows = rows[:, :Lp_out]
    if rows.shape[1] == Lp_out:
        pq_out = pq_out.at[dst].set(rows)
    else:
        pq_out = pq_out.at[dst, : rows.shape[1]].set(rows)
    return pq_out


DEF_MAX_FLAG = 1 << 12
DEF_MAX_OUT = 1024


def _needs_retry(out, max_flag, max_out):
    return int(out["n_flagged"]) > max_flag or int(out["n_sites"]) > max_out


def _grown_bounds(out, max_flag, max_out):
    if int(out["n_flagged"]) > max_flag:
        max_flag = 1 << (int(out["n_flagged"]) - 1).bit_length()
    if int(out["n_sites"]) > max_out:
        max_out = 1 << (int(out["n_sites"]) - 1).bit_length()
    return max_flag, min(max_out, max_flag)


def genotype_window_resolved(
    counts,
    strand_counts,
    total,
    ref_codes,
    contribution,
    het_rate,
    min_quality,
    first_res=None,
    exact_f64=False,
):
    """Host wrapper over genotype_window_sparse: fetches the compact result
    and retries with larger flag/output capacity in the (rare) event the
    f32 screen flagged more positions than the compaction bound or more
    sites were called than the thin-output bound.  `first_res` lets
    callers pre-dispatch the first attempt asynchronously."""
    import numpy as np

    ref_codes = np.asarray(ref_codes)
    max_flag, max_out = DEF_MAX_FLAG, DEF_MAX_OUT
    res = first_res
    if res is None:
        res = genotype_window_sparse(
            counts, strand_counts, total, ref_codes, contribution,
            het_rate, min_quality, max_flag=max_flag, max_out=max_out,
            exact_f64=exact_f64,
        )
    out = jax.device_get(res)
    while _needs_retry(out, max_flag, max_out):
        max_flag, max_out = _grown_bounds(out, max_flag, max_out)
        res = genotype_window_sparse(
            counts, strand_counts, total, ref_codes, contribution,
            het_rate, min_quality, max_flag=max_flag, max_out=max_out,
            exact_f64=exact_f64,
        )
        out = jax.device_get(res)
    return out


def genotype_window_fused_resolved(fused_args, first_res=None):
    """Host wrapper over genotype_window_fused: fetch + grow-and-retry.

    `fused_args` is (batches, packed, ref_codes, contribution, het_rate,
    min_quality, out_size) — kept by the caller so the one-program window
    chain can be re-dispatched with larger bounds when the defaults
    truncate (pathological windows only)."""
    batches, packed, ref_codes, contribution, het, minq, out_size = fused_args
    max_flag, max_out = DEF_MAX_FLAG, DEF_MAX_OUT
    res = first_res
    if res is None:
        res = genotype_window_fused(
            batches, packed, ref_codes, contribution, het, minq,
            out_size=out_size, max_flag=max_flag, max_out=max_out,
        )
    out = jax.device_get(res)
    while _needs_retry(out, max_flag, max_out):
        max_flag, max_out = _grown_bounds(out, max_flag, max_out)
        res = genotype_window_fused(
            batches, packed, ref_codes, contribution, het, minq,
            out_size=out_size, max_flag=max_flag, max_out=max_out,
        )
        out = jax.device_get(res)
    return out


def init_count_tensors(out_size: int, n_alleles: int = 4):
    import jax.numpy as jnp

    return (
        jnp.zeros((out_size, n_alleles, N_QBINS), jnp.int32),
        jnp.zeros((out_size, n_alleles, 2), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
    )


def init_count_tensors_flat(out_size: int, n_alleles: int = 4):
    """Flat-minor-axis accumulators for the packed/tier-1/sparse kernels."""
    import jax.numpy as jnp

    return (
        jnp.zeros((out_size, n_alleles * N_QBINS), jnp.int32),
        jnp.zeros((out_size, n_alleles * 2), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
        jnp.zeros((out_size,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("n_alleles", "max_sites"))
def genotype_window_from_counts(
    counts: jnp.ndarray,  # (W, n, Q) int32
    strand_counts: jnp.ndarray,
    total: jnp.ndarray,
    ref_codes: jnp.ndarray,  # (W,) int8
    contribution: jnp.ndarray,
    het_rate: jnp.ndarray,
    min_quality: jnp.ndarray,
    n_alleles: int = 4,
    max_sites: int = 16384,
):
    """Genotype every position of an accumulated count window; compact
    flagged sites on device (same math/decision as window_genotype_snv)."""
    P = counts.shape[0]
    n = n_alleles
    logcond = jnp.einsum("paq,aqij->pij", counts.astype(jnp.float64), contribution)
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    eye = jnp.eye(n, dtype=bool)
    prior = jnp.where(eye, log_prior_homo, log_prior_hetero)
    ev = logcond + prior[None, :, :]
    logmax = jnp.max(ev.reshape(P, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    post = p / jnp.sum(p.reshape(P, -1), axis=1)[:, None, None]
    ref = jnp.clip(ref_codes, 0, n - 1).astype(jnp.int32)
    rows = jnp.arange(P)
    best = post[rows, ref, ref]
    bi = ref
    bj = ref
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = jnp.where(upd, prob, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)
    ref_prob = post[rows, ref, ref]
    one_minus = 1.0 - best
    gq = jnp.where(
        one_minus <= 0,
        255,
        jnp.minimum(jnp.round(-10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30))), 255),
    ).astype(jnp.int32)
    depths = counts.sum(axis=2)
    interesting = (
        ((bi != ref) | (bj != ref))
        & (ref_codes < 4)
        & (gq >= min_quality)
        & (gq > 0)
        & (total > 0)
    )
    idx = jnp.nonzero(interesting, size=max_sites, fill_value=P - 1)[0]
    k_valid = jnp.sum(interesting.astype(jnp.int32))
    return {
        "site_idx": idx.astype(jnp.int32),
        "n_sites": jnp.minimum(k_valid, max_sites),
        "bi": bi[idx].astype(jnp.int8),
        "bj": bj[idx].astype(jnp.int8),
        "gq": gq[idx],
        "ref_prob": ref_prob[idx],
        "depths": depths[idx],
        "total": total[idx],
        "logcond": logcond[idx],
        "strand_counts": strand_counts[idx],
        "bi_full": bi.astype(jnp.int8),
        "bj_full": bj.astype(jnp.int8),
        "gq_full": gq,
        "ref_prob_full": ref_prob,
        "total_full": total,
        "depths_full": depths,
    }


@partial(jax.jit, static_argnames=("out_size", "n_alleles", "max_sites"))
def window_genotype_snv(
    positions: jnp.ndarray,
    alleles: jnp.ndarray,
    quals: jnp.ndarray,
    strands: jnp.ndarray,
    ref_codes: jnp.ndarray,  # (out_size,) int8 reference base codes
    contribution: jnp.ndarray,  # (4, Q, 4, 4) float64
    het_rate: jnp.ndarray,  # scalar float64 (traced: no recompile per value)
    min_quality: jnp.ndarray,  # scalar int32 (traced)
    n_alleles: int = 4,
    max_sites: int = 16384,
    *,
    out_size: int,
):
    """Fused window pipeline: scatter counts -> posteriors -> genotype
    decision, all on device.  Only compact per-position vectors (and lazily
    gathered per-site rows) ever reach the host."""
    counts, strand_counts, low_qual, total = scatter_allele_counts(
        positions, alleles, quals, strands, n_alleles, out_size=out_size
    )
    P = out_size
    n = n_alleles
    logcond = jnp.einsum("paq,aqij->pij", counts.astype(jnp.float64), contribution)
    log_prior_hetero = jnp.log10(het_rate / (n * (n - 1)))
    log_prior_homo = jnp.log10((1 - het_rate) / n)
    eye = jnp.eye(n, dtype=bool)
    prior = jnp.where(eye, log_prior_homo, log_prior_hetero)
    ev = logcond + prior[None, :, :]
    logmax = jnp.max(ev.reshape(P, -1), axis=1)[:, None, None]
    rel = ev - logmax
    p = jnp.where(rel < -20.0, 0.0, 10.0 ** rel)
    post = p / jnp.sum(p.reshape(P, -1), axis=1)[:, None, None]

    # genotype decision (VariantDiscoverySNVQAlgorithm.getIndexesMaxGenotype)
    ref = jnp.clip(ref_codes, 0, n - 1).astype(jnp.int32)
    rows = jnp.arange(P)
    best = post[rows, ref, ref]
    bi = ref
    bj = ref
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = jnp.where(upd, prob, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)
    ref_prob = post[rows, ref, ref]
    one_minus = 1.0 - best
    gq = jnp.where(
        one_minus <= 0,
        255,
        jnp.minimum(jnp.round(-10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30))), 255),
    ).astype(jnp.int32)
    depths = counts.sum(axis=2)

    # on-device site selection + compaction: only flagged sites (decided
    # non-homoref, quality >= threshold, ACGT reference, read evidence)
    # travel to the host — one small transfer instead of whole-window tensors
    interesting = (
        ((bi != ref) | (bj != ref))
        & (ref_codes < 4)
        & (gq >= min_quality)
        & (gq > 0)
        & (total > 0)
    )
    idx = jnp.nonzero(interesting, size=max_sites, fill_value=out_size - 1)[0]
    k_valid = jnp.sum(interesting.astype(jnp.int32))
    return {
        "site_idx": idx.astype(jnp.int32),
        "n_sites": jnp.minimum(k_valid, max_sites),
        "bi": bi[idx].astype(jnp.int8),
        "bj": bj[idx].astype(jnp.int8),
        "gq": gq[idx],
        "ref_prob": ref_prob[idx],
        "depths": depths[idx],
        "total": total[idx],
        "logcond": logcond[idx],
        "strand_counts": strand_counts[idx],
        # full per-position arrays stay device-resident; callers (e.g. the
        # multisample detector) gather sparse rows without bulk transfers
        "bi_full": bi.astype(jnp.int8),
        "bj_full": bj.astype(jnp.int8),
        "gq_full": gq,
        "ref_prob_full": ref_prob,
        "total_full": total,
        "depths_full": depths,
        "logcond_full": logcond,
    }


def decide_genotypes_discovery(
    post: np.ndarray, ref_idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized getIndexesMaxGenotype + GQ/variant-QS math (host numpy).

    Mirrors VariantDiscoverySNVQAlgorithm.getIndexesMaxGenotype:223-243:
    scan unordered pairs (i<=j) in row-major order, replacing the current
    best only when prob > best + 0.01, starting from (ref,ref).

    Returns (idx_i, idx_j, max_p, gq, ref_prob) per position.
    """
    P, n, _ = post.shape
    rows = np.arange(P)
    ref = np.clip(ref_idx, 0, n - 1)
    best = post[rows, ref, ref].copy()
    bi = ref.copy().astype(np.int32)
    bj = ref.copy().astype(np.int32)
    for i in range(n):
        for j in range(i, n):
            prob = post[:, i, j] + (post[:, j, i] if i != j else 0.0)
            upd = prob > best + 0.01
            best = np.where(upd, prob, best)
            bi = np.where(upd, i, bi)
            bj = np.where(upd, j, bj)
    from ..math.phred import MAX_PHRED

    ref_prob = post[rows, ref, ref]
    with np.errstate(divide="ignore", invalid="ignore"):
        gq = np.round(-10.0 * np.log10(np.maximum(1.0 - best, 0.0))).astype(np.int64)
    gq = np.where(1.0 - best <= 0, MAX_PHRED, np.minimum(gq, MAX_PHRED)).astype(
        np.int32
    )
    gq = np.where(best >= 1.0, MAX_PHRED, gq)
    return bi, bj, best, gq, ref_prob

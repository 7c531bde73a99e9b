"""Batched affine-gap (Gotoh) pairwise alignment on device.

Ref: src/ngsep/alignments/PairwiseAlignerAffineGap.java:29-292 — 3-matrix
Gotoh with match=+1 mismatch=-1 openGap=3 extGap=1 (subtracted), "force"
flags for free subject ends, and a deterministic traceback preference order
(M then I then D, PairwiseAlignerAffineGap.java:228-259).

TPU redesign: instead of the reference's per-cell scalar loops, the DP runs
as one `lax.scan` over query rows with each row fully vectorized across
subject positions and across a batch of (query, subject) pairs.  The
within-row dependency of the deletion matrix (D[i][j] depends on D[i][j-1])
is solved in closed form with a cumulative max:

    D[i][j] = max(A[j-1], D[i][j-1] - ext)   where A = max(M,I) - open
  =>  D[i][j] = max_h<=j-1 ( A[h] - ext*(j-1-h) )
  =>  D[i][j] = cummax( A[h] + ext*h )[j-1] - ext*(j-1)

so every row is O(Ls) vector work with no sequential inner loop.  Traceback
pointers are packed 2+2+2 bits into a uint8 tensor and walked on device by a
vmapped fori_loop, emitting per-step alignment ops that the host run-length
encodes into CIGARs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# alignment ops emitted by traceback
OP_NONE = 0
OP_MATCH = 1  # diagonal (match or mismatch)
OP_INS = 2  # query base consumed, gap in subject (CIGAR I)
OP_DEL = 3  # subject base consumed, gap in query (CIGAR D)

NEG = -(10 ** 7)  # "banned" score, matches spirit of length*-openGap*1000


@partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "open_gap", "ext_gap",
        "free_start1", "free_end1", "free_start2", "free_end2",
    ),
)
def affine_gap_align_batch(
    query: jnp.ndarray,  # (B, Lq) int8 codes, padded
    qlen: jnp.ndarray,  # (B,) int32
    subject: jnp.ndarray,  # (B, Ls) int8 codes, padded
    slen: jnp.ndarray,  # (B,) int32
    match: int = 1,
    mismatch: int = 1,
    open_gap: int = 3,
    ext_gap: int = 1,
    free_start1: bool = False,
    free_end1: bool = False,
    free_start2: bool = True,
    free_end2: bool = True,
):
    """Batch Gotoh alignment of query[i] vs subject[i].

    free_start2/free_end2 correspond to the reference's
    forceStart2=false/forceEnd2=false (subject ends unpenalized) — the
    configuration used for gapped read alignment
    (ShortReadsUngappedSearchHitsClusterAligner.java:137-141
    createAlignerFullRead).  free_start1/free_end1 unpenalize QUERY ends —
    the tier-2 STR split aligners (createAlignerLeftTR/RightTR:338-349 set
    forceEnd1/forceStart1 false).  With free_end1, the best score is taken
    over the last M column with ties at the largest query row (ref
    getAlignedStrings:193-202); the unaligned query tail [end_i, qlen) is
    NOT emitted in `ops` — callers read `end_i` and treat the tail as a
    trailing insertion/soft-clip.  With free_start1 the unaligned query
    head IS emitted as leading OP_INS ops (same as the reference strings).

    Returns dict with:
      score   (B,) int32 — best alignment score
      ops     (B, Lq+Ls) uint8 — alignment operations in forward order,
              left-padded with OP_NONE
      n_ops   (B,) int32
      start_j (B,) int32 — 0-based subject offset where alignment begins
      end_j   (B,) int32 — 0-based subject offset one past alignment end
      end_i   (B,) int32 — query length consumed (== qlen unless free_end1)
    """
    assert not (free_end1 and free_end2), "free_end1 with free_end2 unsupported"
    B, Lq = query.shape
    _, Ls = subject.shape

    jj = jnp.arange(Ls + 1, dtype=jnp.int32)  # subject axis with boundary col

    # boundary row i=0: M[0][0]=0; M[0][j>0]=banned; D[0][j] per free_start2
    m0 = jnp.where(jj == 0, 0, NEG).astype(jnp.int32)
    m0 = jnp.broadcast_to(m0, (B, Ls + 1))
    i0 = jnp.where(jj == 0, 0, NEG).astype(jnp.int32)
    i0 = jnp.broadcast_to(i0, (B, Ls + 1))
    if free_start2:
        d0 = jnp.zeros((Ls + 1,), jnp.int32)
    else:
        d0 = jnp.where(jj == 0, 0, -open_gap - ext_gap * (jj - 1)).astype(jnp.int32)
    d0 = jnp.broadcast_to(d0, (B, Ls + 1))

    ext_j = ext_gap * jj  # (Ls+1,)

    def row_step(carry, qi):
        m_prev, i_prev, d_prev = carry  # each (B, Ls+1)
        q_char, row_i = qi  # (B,) int8, () int32

        # substitution score vs every subject position (boundary col excluded)
        sub = jnp.where(subject == q_char[:, None], match, -mismatch).astype(jnp.int32)
        # column j in 1..Ls uses prev row col j-1
        best_prev_diag = jnp.maximum(jnp.maximum(m_prev, i_prev), d_prev)[:, :-1]
        m_inner = best_prev_diag + sub  # (B, Ls)
        # traceback for M: which matrix preceded (ref order: M, I, D)
        mp = jnp.where(
            m_prev[:, :-1] >= jnp.maximum(i_prev[:, :-1], d_prev[:, :-1]),
            0,
            jnp.where(i_prev[:, :-1] >= d_prev[:, :-1], 1, 2),
        ).astype(jnp.uint8)
        # boundary col j=0 for row i>0
        m_bound = jnp.full((B, 1), NEG, jnp.int32)
        m_row = jnp.concatenate([m_bound, m_inner], axis=1)

        # I matrix (gap in subject; query consumed): depends on prev row same col
        i_cand_m = m_prev - open_gap
        i_cand_i = i_prev - ext_gap
        i_cand_d = d_prev - open_gap
        i_row = jnp.maximum(jnp.maximum(i_cand_m, i_cand_i), i_cand_d)
        ip = jnp.where(
            i_cand_m >= jnp.maximum(i_cand_i, i_cand_d),
            0,
            jnp.where(i_cand_i >= i_cand_d, 1, 2),
        ).astype(jnp.uint8)
        # boundary col: I[i][0] = -open-ext*(i-1) (query global, forceStart1)
        # or 0 when the query start is free (ref initMatrices:139-140)
        if free_start1:
            i_row = i_row.at[:, 0].set(0)
        else:
            i_bound = (-open_gap - ext_gap * (row_i - 1)).astype(jnp.int32)
            i_row = i_row.at[:, 0].set(i_bound)

        # D matrix via cumulative max within the row:
        # D[j] = max(A[j-1], D[j-1]-ext), A = max(M,I) - open  (and M vs I for tb)
        a_m = m_row - open_gap
        a_i = i_row - open_gap
        a = jnp.maximum(a_m, a_i)
        shifted = (a + ext_j)[:, :-1]  # A[h] + ext*h for h = 0..Ls-1
        run = jax.lax.cummax(shifted, axis=1)  # max_{h<=j-1}
        d_inner = run - ext_j[1:][None, :] + ext_gap  # - ext*(j-1)
        d_bound = jnp.full((B, 1), NEG, jnp.int32)
        d_row = jnp.concatenate([d_bound, d_inner], axis=1)
        # D traceback: opened here (from M or I at j-1) vs extended (D at j-1)
        opened = a[:, :-1] >= (d_row[:, :-1] - ext_gap)
        dp_open_from_m = a_m[:, :-1] >= a_i[:, :-1]
        dp = jnp.where(opened, jnp.where(dp_open_from_m, 0, 1), 2).astype(jnp.uint8)
        dp = jnp.concatenate([jnp.zeros((B, 1), jnp.uint8), dp], axis=1)

        # rows past the query length are frozen so final carry = row qlen
        active = row_i <= qlen  # (B,)
        m_row = jnp.where(active[:, None], m_row, m_prev)
        i_row = jnp.where(active[:, None], i_row, i_prev)
        d_row = jnp.where(active[:, None], d_row, d_prev)

        tb = (mp | (ip[:, 1:] << 2) | (dp[:, 1:] << 4)).astype(jnp.uint8)  # (B, Ls)
        # last-column M value of this row (free_end1 end-cell search); rows
        # past qlen emit NEG so they never win
        m_at_slen = jnp.where(
            row_i <= qlen,
            jnp.take_along_axis(m_row, slen[:, None], axis=1)[:, 0],
            NEG,
        )
        return (m_row, i_row, d_row), (tb, m_at_slen)

    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    (m_fin, i_fin, d_fin), (tb_rows, m_cols) = jax.lax.scan(
        row_step, (m0, i0, d0), (query.T, rows)
    )
    # tb_rows: (Lq, B, Ls) -> (B, Lq, Ls).  Because rows past qlen are frozen,
    # the final carry IS row qlen — no need to materialize all score rows.
    tb = jnp.transpose(tb_rows, (1, 0, 2))

    cols = jnp.arange(Ls + 1, dtype=jnp.int32)[None, :]
    col_valid = cols <= slen[:, None]
    # final-cell selection (ref: getAlignedStrings — M preferred, then I, then D)
    m_last = m_fin  # (B, Ls+1), row i=qlen
    m_corner = jnp.take_along_axis(m_last, slen[:, None], axis=1)[:, 0]
    i_corner = jnp.take_along_axis(i_fin, slen[:, None], axis=1)[:, 0]
    d_corner = jnp.take_along_axis(d_fin, slen[:, None], axis=1)[:, 0]
    if free_end2:
        # best M over the last row.  The ref scans h descending from the corner
        # updating only on strictly-greater, so ties resolve to the LARGEST j
        # attaining the max (PairwiseAlignerAffineGap.java:203-214).
        masked = jnp.where(col_valid, m_last, NEG)
        best = jnp.max(masked, axis=1)
        rev_hit = (masked == best[:, None])[:, ::-1]
        end_j = (Ls - jnp.argmax(rev_hit, axis=1)).astype(jnp.int32)
        score = best
        start_k = jnp.zeros((B,), jnp.int32)
        end_i = qlen
    elif free_end1:
        # best M over the last COLUMN (ref :193-202): rows h = 0..qlen, ties
        # at the LARGEST h (the scan goes h descending, strictly-greater)
        h0 = jnp.where(slen == 0, 0, NEG).astype(jnp.int32)[None, :]  # M[0][Ls]
        mstack = jnp.concatenate([h0, m_cols], axis=0)  # (Lq+1, B)
        best = jnp.max(mstack, axis=0)
        rev_hit = (mstack == best[None, :])[::-1]
        end_i = (Lq - jnp.argmax(rev_hit, axis=0)).astype(jnp.int32)
        score = best
        start_k = jnp.zeros((B,), jnp.int32)
        end_j = slen
    else:
        score = m_corner
        start_k = jnp.zeros((B,), jnp.int32)
        score = jnp.where(i_corner > score, i_corner, score)
        start_k = jnp.where(i_corner > m_corner, 1, start_k)
        score = jnp.where(d_corner > score, d_corner, score)
        start_k = jnp.where(d_corner > jnp.maximum(m_corner, i_corner), 2, start_k)
        end_j = slen
        end_i = qlen

    # --- device traceback -------------------------------------------------
    max_steps = Lq + Ls
    # with a free subject start, subject bases before the alignment are window
    # offset (start_j), not leading deletions
    emit_lead_del = not free_start2

    def walk(tb_one, i_init, j_init, k_init):
        # ops are emitted as scan OUTPUTS, not scattered at position n: a
        # NONE op can only occur after the path is exhausted (i==0 with
        # free subject start, or both cursors at 0), so emitted ops form
        # a prefix and step position == n.  The per-step .at[n].set was a
        # B-wide scatter x max_steps (TPU scatters serialize; ~half the
        # traceback cost).
        def step(state, _):
            i, j, k, n = state
            in_aln = (i > 0) & (j > 0)
            ptr_byte = tb_one[jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0)]
            mp = ptr_byte & 3
            ip = (ptr_byte >> 2) & 3
            dp = (ptr_byte >> 4) & 3
            # when j==0: consume query as insertions; i==0: subject as deletions
            only_i = (i > 0) & (j == 0)
            only_j = (i == 0) & (j > 0) & emit_lead_del
            op = jnp.where(
                in_aln,
                jnp.where(k == 0, OP_MATCH, jnp.where(k == 1, OP_INS, OP_DEL)),
                jnp.where(only_i, OP_INS, jnp.where(only_j, OP_DEL, OP_NONE)),
            )
            di = jnp.where((op == OP_MATCH) | (op == OP_INS), 1, 0)
            dj = jnp.where((op == OP_MATCH) | (op == OP_DEL), 1, 0)
            new_k = jnp.where(
                in_aln,
                jnp.where(k == 0, mp, jnp.where(k == 1, ip, dp)).astype(jnp.int32),
                k,
            )
            n = n + jnp.where(op != OP_NONE, 1, 0)
            return (i - di, j - dj, new_k, n), op.astype(jnp.uint8)

        (fi, fj, fk, n), ops = jax.lax.scan(
            step, (i_init, j_init, k_init, jnp.int32(0)), None,
            length=max_steps,
        )
        return ops, n, fj

    ops_rev, n_ops, start_j = jax.vmap(walk)(tb, end_i, end_j, start_k)
    # ops are emitted back-to-front; reverse into forward order per read
    idx = jnp.arange(max_steps, dtype=jnp.int32)[None, :]
    src = n_ops[:, None] - 1 - idx
    ops_fwd = jnp.where(
        src >= 0, jnp.take_along_axis(ops_rev, jnp.maximum(src, 0), axis=1), OP_NONE
    ).astype(jnp.uint8)

    return {
        "score": score,
        "ops": ops_fwd,
        "n_ops": n_ops,
        "start_j": start_j,
        "end_j": end_j,
        "end_i": end_i,
    }


def ops_to_cigar_and_strings(
    ops: np.ndarray, n_ops: int, query: np.ndarray, subject: np.ndarray, start_j: int
) -> tuple[list[tuple[int, str]], int]:
    """Host: run-length encode ops into CIGAR tuples and count mismatches.

    Mismatch counting follows the reference's countMismatches(String[])
    (ShortReadsUngappedSearchHitsClusterAligner.java:140-156): +1 per
    mismatched pair, +2 per *internal* gap run (leading/trailing free).
    Returns ([(length, op_char)...], mismatches).
    """
    ops = ops[:n_ops]
    cigar: list[tuple[int, str]] = []
    mismatches = 0
    qi = 0
    sj = start_j
    last_is_gap = True
    for op in ops:
        ch = "M" if op == OP_MATCH else ("I" if op == OP_INS else "D")
        if cigar and cigar[-1][1] == ch:
            cigar[-1] = (cigar[-1][0] + 1, ch)
        else:
            cigar.append((1, ch))
        if op == OP_MATCH:
            if query[qi] != subject[sj]:
                mismatches += 1
            qi += 1
            sj += 1
            last_is_gap = False
        else:
            if not last_is_gap:
                mismatches += 2
            last_is_gap = True
            if op == OP_INS:
                qi += 1
            else:
                sj += 1
    if last_is_gap and cigar:
        mismatches -= 2
    return cigar, mismatches


# ---------------------------------------------------------------------------
# Run-jump traceback (round 5).
#
# Profiling on the real chip showed the per-cell traceback walk, not the
# forward DP, dominated the old kernel: the forward scan ran 10.3 GCell/s
# while the full kernel ran 2.6 — the walk's Lq+Ls scan steps each issue a
# per-row element gather from the (B, Lq, Ls) pointer tensor (~12 ns each on
# this chip).  The fix is algorithmic: the forward scan additionally tracks,
# per cell and per matrix, (a) the length of the op RUN ending at that cell
# and (b) the matrix the run was entered FROM (the pointer at the run's
# start cell), packed into one uint32 plane:
#
#   bits 0-5   src_m | src_i<<2 | src_d<<4   (2-bit next-matrix after a jump)
#   bits 8-31  em | ei<<8 | ed<<16           (8-bit run lengths, saturating)
#
# M/I runs are diagonal/vertical recurrences carried across scan rows; the
# D run (within-row) comes closed-form from one packed cummax (value
# j*4+dp monotone in j, so the cummax IS the latest non-extend cell and
# carries its pointer in the low bits).  The traceback then emits one RLE
# run per step — a handful of steps and ONE gather each instead of one per
# alignment column.  Saturated runs (>=255) jump 254 cells and continue in
# the same matrix, emitting split runs that the merge pass re-joins.
# ---------------------------------------------------------------------------


def _walk_runs_for(Lq: int) -> int:
    """Static walk-step budget: any alignment acceptable under the tier-3
    10% mismatch cap has <= 0.1*Lq + 3 runs (each internal gap run costs 2
    mismatches); the +8 margin covers boundary runs and saturation splits.
    Rows needing more steps are flagged (walk_ok=False) and carry a huge
    mismatch count — their exact mismatch count provably exceeds the accept
    threshold, so accept/reject behavior is unchanged."""
    return Lq // 8 + 8


@partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "open_gap", "ext_gap",
        "free_start1", "free_end1", "free_start2", "free_end2",
        "walk_runs", "_stage",
    ),
)
def affine_gap_align_runs(
    query: jnp.ndarray,  # (B, Lq) int8 codes, padded
    qlen: jnp.ndarray,  # (B,) int32
    subject: jnp.ndarray,  # (B, Ls) int8 codes, padded
    slen: jnp.ndarray,  # (B,) int32
    match: int = 1,
    mismatch: int = 1,
    open_gap: int = 3,
    ext_gap: int = 1,
    free_start1: bool = False,
    free_end1: bool = False,
    free_start2: bool = True,
    free_end2: bool = True,
    walk_runs: int | None = None,
    _stage: str = "all",
):
    """Gotoh alignment emitting CIGAR RUNS directly (run-jump traceback).

    Same scores/tie-breaking as affine_gap_align_batch (ref:
    PairwiseAlignerAffineGap.java:29-292).  Returns dict with:
      score    (B,) int32
      rop      (B, R) int32 — op per run (OP_MATCH/OP_INS/OP_DEL), forward order
      rlen     (B, R) int32 — run lengths (adjacent same-op runs merged)
      n_runs   (B,) int32
      n_ops    (B,) int32 — total alignment columns
      start_j  (B,) int32
      end_j    (B,) int32
      end_i    (B,) int32
      walk_ok  (B,) bool — False when the run budget was exhausted; such a
               row's exact mismatch count exceeds any 10%-of-length accept
               threshold (>= 2 per emitted gap run already), so callers
               reject it without needing the ops.
    """
    assert not (free_end1 and free_end2), "free_end1 with free_end2 unsupported"
    B, Lq = query.shape
    _, Ls = subject.shape
    R = walk_runs if walk_runs is not None else _walk_runs_for(Lq)

    # Pallas forward (VMEM-resident carries) when the backend and shapes
    # allow; the run-jump walk below consumes the same plane either way
    use_pallas = (
        not free_start1
        and not free_end1
        and _pallas_available()
        and B % 256 == 0
        and Ls % 128 == 0
    )
    if use_pallas:
        from .pairwise_pallas import gotoh_forward_plane_pallas

        plane, score, end_j, start_k = gotoh_forward_plane_pallas(
            query, qlen, subject, slen,
            match=match, mismatch=mismatch,
            open_gap=open_gap, ext_gap=ext_gap,
            free_start2=free_start2, free_end2=free_end2,
        )
        end_i = qlen
        return _runs_from_plane(
            plane, score, end_i, end_j, start_k, B, R, free_start2, _stage
        )

    jj = jnp.arange(Ls + 1, dtype=jnp.int32)

    m0 = jnp.broadcast_to(
        jnp.where(jj == 0, 0, NEG).astype(jnp.int32), (B, Ls + 1)
    )
    i0 = m0
    if free_start2:
        d0 = jnp.zeros((Ls + 1,), jnp.int32)
    else:
        d0 = jnp.where(jj == 0, 0, -open_gap - ext_gap * (jj - 1)).astype(
            jnp.int32
        )
    d0 = jnp.broadcast_to(d0, (B, Ls + 1))
    zrow = jnp.zeros((B, Ls + 1), jnp.int32)

    ext_j = ext_gap * jj

    def row_step(carry, qi):
        m_prev, i_prev, d_prev, em_prev, ei_prev, sm_prev, si_prev = carry
        q_char, row_i = qi

        sub = jnp.where(subject == q_char[:, None], match, -mismatch).astype(
            jnp.int32
        )
        best_prev_diag = jnp.maximum(jnp.maximum(m_prev, i_prev), d_prev)[:, :-1]
        m_inner = best_prev_diag + sub
        mp = jnp.where(
            m_prev[:, :-1] >= jnp.maximum(i_prev[:, :-1], d_prev[:, :-1]),
            0,
            jnp.where(i_prev[:, :-1] >= d_prev[:, :-1], 1, 2),
        ).astype(jnp.int32)
        m_bound = jnp.full((B, 1), NEG, jnp.int32)
        m_row = jnp.concatenate([m_bound, m_inner], axis=1)
        # M-run length + run-start pointer (diagonal recurrences)
        em_inner = 1 + jnp.where(mp == 0, em_prev[:, :-1], 0)
        em_row = jnp.concatenate([zrow[:, :1], jnp.minimum(em_inner, 255)], axis=1)
        sm_inner = jnp.where(mp != 0, mp, sm_prev[:, :-1])
        sm_row = jnp.concatenate([zrow[:, :1], sm_inner], axis=1)

        i_cand_m = m_prev - open_gap
        i_cand_i = i_prev - ext_gap
        i_cand_d = d_prev - open_gap
        i_row = jnp.maximum(jnp.maximum(i_cand_m, i_cand_i), i_cand_d)
        ip = jnp.where(
            i_cand_m >= jnp.maximum(i_cand_i, i_cand_d),
            0,
            jnp.where(i_cand_i >= i_cand_d, 1, 2),
        ).astype(jnp.int32)
        if free_start1:
            i_row = i_row.at[:, 0].set(0)
        else:
            i_bound = (-open_gap - ext_gap * (row_i - 1)).astype(jnp.int32)
            i_row = i_row.at[:, 0].set(i_bound)
        # I-run length + run-start pointer (vertical recurrences)
        ei_row = jnp.minimum(1 + jnp.where(ip == 1, ei_prev, 0), 255)
        si_row = jnp.where(ip != 1, ip, si_prev)

        a_m = m_row - open_gap
        a_i = i_row - open_gap
        a = jnp.maximum(a_m, a_i)
        shifted = (a + ext_j)[:, :-1]
        run = jax.lax.cummax(shifted, axis=1)
        d_inner = run - ext_j[1:][None, :] + ext_gap
        d_bound = jnp.full((B, 1), NEG, jnp.int32)
        d_row = jnp.concatenate([d_bound, d_inner], axis=1)
        opened = a[:, :-1] >= (d_row[:, :-1] - ext_gap)
        dp_open_from_m = a_m[:, :-1] >= a_i[:, :-1]
        dp = jnp.where(opened, jnp.where(dp_open_from_m, 0, 1), 2).astype(
            jnp.int32
        )
        dp = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), dp], axis=1)
        # D-run length + source via ONE packed cummax: j*4+dp is monotone in
        # j, so the running max is the latest non-extend cell and its low
        # bits are that cell's pointer — no gather
        open_val = jnp.where(dp != 2, jj[None, :] * 4 + dp, -1)
        open_run = jax.lax.cummax(open_val, axis=1)
        open_pos = open_run >> 2
        sd_row = open_run & 3
        ed_row = jnp.minimum(jj[None, :] - open_pos + 1, 255)

        active = row_i <= qlen
        m_row = jnp.where(active[:, None], m_row, m_prev)
        i_row = jnp.where(active[:, None], i_row, i_prev)
        d_row = jnp.where(active[:, None], d_row, d_prev)
        em_row = jnp.where(active[:, None], em_row, em_prev)
        ei_row = jnp.where(active[:, None], ei_row, ei_prev)
        sm_row = jnp.where(active[:, None], sm_row, sm_prev)
        si_row = jnp.where(active[:, None], si_row, si_prev)

        plane = (
            sm_row[:, 1:]
            | (si_row[:, 1:] << 2)
            | (sd_row[:, 1:] << 4)
            | (em_row[:, 1:] << 8)
            | (ei_row[:, 1:] << 16)
            | (ed_row[:, 1:] << 24)
        ).astype(jnp.uint32)
        m_at_slen = jnp.where(
            row_i <= qlen,
            jnp.take_along_axis(m_row, slen[:, None], axis=1)[:, 0],
            NEG,
        )
        return (
            (m_row, i_row, d_row, em_row, ei_row, sm_row, si_row),
            (plane, m_at_slen),
        )

    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    (m_fin, i_fin, d_fin, _, _, _, _), (plane, m_cols) = jax.lax.scan(
        row_step, (m0, i0, d0, zrow, zrow, zrow, zrow), (query.T, rows)
    )
    # plane stays in scan-native (Lq, B, Ls) layout: the walk indexes it as
    # plane[i-1, b, j-1] — one fancy gather per step, no transpose (a
    # vmapped per-row scalar index lowered to a ~540us/step gather here)

    cols = jnp.arange(Ls + 1, dtype=jnp.int32)[None, :]
    col_valid = cols <= slen[:, None]
    m_last = m_fin
    m_corner = jnp.take_along_axis(m_last, slen[:, None], axis=1)[:, 0]
    i_corner = jnp.take_along_axis(i_fin, slen[:, None], axis=1)[:, 0]
    d_corner = jnp.take_along_axis(d_fin, slen[:, None], axis=1)[:, 0]
    if free_end2:
        masked = jnp.where(col_valid, m_last, NEG)
        best = jnp.max(masked, axis=1)
        rev_hit = (masked == best[:, None])[:, ::-1]
        end_j = (Ls - jnp.argmax(rev_hit, axis=1)).astype(jnp.int32)
        score = best
        start_k = jnp.zeros((B,), jnp.int32)
        end_i = qlen
    elif free_end1:
        h0 = jnp.where(slen == 0, 0, NEG).astype(jnp.int32)[None, :]
        mstack = jnp.concatenate([h0, m_cols], axis=0)
        best = jnp.max(mstack, axis=0)
        rev_hit = (mstack == best[None, :])[::-1]
        end_i = (Lq - jnp.argmax(rev_hit, axis=0)).astype(jnp.int32)
        score = best
        start_k = jnp.zeros((B,), jnp.int32)
        end_j = slen
    else:
        score = m_corner
        start_k = jnp.zeros((B,), jnp.int32)
        score = jnp.where(i_corner > score, i_corner, score)
        start_k = jnp.where(i_corner > m_corner, 1, start_k)
        score = jnp.where(d_corner > score, d_corner, score)
        start_k = jnp.where(d_corner > jnp.maximum(m_corner, i_corner), 2, start_k)
        end_j = slen
        end_i = qlen

    if _stage == "score":
        return {"score": score}
    if _stage == "plane":
        return {"score": score, "_p": plane.sum()}

    return _runs_from_plane(
        plane, score, end_i, end_j, start_k, B, R, free_start2, _stage
    )


def _pallas_available() -> bool:
    """True when the active backend can run the Pallas TPU kernel."""
    try:
        import jax as _jax

        return _jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _runs_from_plane(plane, score, end_i, end_j, start_k, B, R, free_start2, _stage):
    """Run-jump traceback + merge over a (Lq, B, Ls) pointer/run plane
    (shared by the XLA-scan and Pallas forward passes)."""
    emit_lead_del = not free_start2
    bb = jnp.arange(B, dtype=jnp.int32)

    def walk_step(state, _):
        i, j, k, done = state  # (B,) int32 cursors, (B,) bool
        in_aln = (i > 0) & (j > 0) & ~done
        w = plane[
            jnp.maximum(i - 1, 0), bb, jnp.maximum(j - 1, 0)
        ].astype(jnp.uint32)
        ku = k.astype(jnp.uint32)
        src = ((w >> (2 * ku)) & 3).astype(jnp.int32)
        run = ((w >> (8 * ku + 8)) & 255).astype(jnp.int32)
        sat = run == 255
        r = jnp.where(sat, 254, run)
        only_i = (i > 0) & (j == 0) & ~done
        only_j = jnp.logical_and((i == 0) & (j > 0) & ~done, emit_lead_del)
        op = jnp.where(
            in_aln,
            k + 1,
            jnp.where(only_i, OP_INS, jnp.where(only_j, OP_DEL, OP_NONE)),
        )
        ln = jnp.where(in_aln, r, jnp.where(only_i, i, jnp.where(only_j, j, 0)))
        di = jnp.where(
            in_aln & ((k == 0) | (k == 1)), r, jnp.where(only_i, i, 0)
        )
        dj = jnp.where(
            in_aln & ((k == 0) | (k == 2)), r, jnp.where(only_j, j, 0)
        )
        new_k = jnp.where(in_aln & ~sat, src, k)
        new_done = done | (~in_aln & ~only_i & ~only_j)
        return (i - di, j - dj, new_k, new_done), (ln, op)

    (fi, fj, fk, _), (rlen_rev, rop_rev) = jax.lax.scan(
        walk_step,
        (
            end_i.astype(jnp.int32),
            end_j.astype(jnp.int32),
            start_k.astype(jnp.int32),
            jnp.zeros((B,), bool),
        ),
        None,
        length=R,
    )
    rlen_rev = rlen_rev.T  # (B, R)
    rop_rev = rop_rev.T
    start_j = fj
    walk_ok = (fi == 0) & ((fj == 0) | (not emit_lead_del))
    if _stage == "walk":
        return {"score": score, "_w": rlen_rev.sum() + rop_rev.sum()}

    # reverse the emitted prefix into forward order
    n_raw = jnp.sum(rlen_rev > 0, axis=1).astype(jnp.int32)
    idx = jnp.arange(R, dtype=jnp.int32)[None, :]
    src_idx = jnp.maximum(n_raw[:, None] - 1 - idx, 0)
    rlen_f = jnp.where(
        idx < n_raw[:, None],
        jnp.take_along_axis(rlen_rev, src_idx, axis=1),
        0,
    )
    rop_f = jnp.where(
        idx < n_raw[:, None],
        jnp.take_along_axis(rop_rev, src_idx, axis=1),
        0,
    )
    # merge adjacent same-op runs (saturation splits, boundary joins)
    prev_op = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), rop_f[:, :-1]], axis=1
    )
    is_new = (rlen_f > 0) & (rop_f != prev_op)
    rank = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1
    onehot = rank[:, :, None] == jnp.arange(R, dtype=jnp.int32)[None, None, :]
    rlen = jnp.sum(
        jnp.where(onehot, rlen_f[:, :, None], 0), axis=1, dtype=jnp.int32
    )
    rop = jnp.sum(
        jnp.where(onehot & is_new[:, :, None], rop_f[:, :, None], 0),
        axis=1,
        dtype=jnp.int32,
    )
    n_runs = jnp.sum(is_new, axis=1, dtype=jnp.int32)
    n_ops = jnp.sum(rlen_f, axis=1, dtype=jnp.int32)

    return {
        "score": score,
        "rop": rop,
        "rlen": rlen,
        "n_runs": n_runs,
        "n_ops": n_ops,
        "start_j": start_j,
        "end_j": end_j,
        "end_i": end_i,
        "walk_ok": walk_ok,
    }


@jax.jit
def dp_stats_runs(out: dict, query: jnp.ndarray, subject: jnp.ndarray):
    """Tier-3 stats from run-jump traceback output — replaces the ops-tensor
    reductions of dp_stats_pack (the ops tensor no longer exists).

    Same outputs consumed by the aligner: mism (+1 per substitution, +2 per
    internal gap run, ShortReadsUngappedSearchHitsClusterAligner.java:140-156),
    has_gap, device-left-aligned rle (int16, op | len<<2), n_runs, n_ops,
    start_j, la_fallback.  Rows whose walk exhausted the run budget
    (walk_ok=False) report mism=32000 — their exact mismatch count is >= 2
    per emitted gap run and already exceeds any 10%-of-length accept
    threshold, so accept/reject behavior is identical to the exact path."""
    rop, rlen = out["rop"], out["rlen"]
    n_runs, n_ops = out["n_runs"], out["n_ops"]
    score, start_j = out["score"], out["start_j"]
    B, R = rop.shape
    slot = jnp.arange(R, dtype=jnp.int32)[None, :]
    valid = slot < n_runs[:, None]
    is_m = (rop == OP_MATCH) & valid
    is_gap = ((rop == OP_INS) | (rop == OP_DEL)) & valid
    m_cnt = jnp.sum(jnp.where(is_m, rlen, 0), axis=1, dtype=jnp.int32)
    gap_len = jnp.sum(jnp.where(is_gap, rlen, 0), axis=1, dtype=jnp.int32)
    k_all = jnp.sum(is_gap, axis=1, dtype=jnp.int32)
    # substitutions from the score decomposition (see dp_stats_pack doc):
    # score = eq - neq - sum over gap runs (open + ext*len) with the tier-3
    # defaults open=2+ext — neq = (#M - score - 2*K - gap_len) / 2
    sub_mm = (m_cnt - score - 2 * k_all - gap_len) >> 1
    prev_is_m = jnp.concatenate(
        [jnp.zeros((B, 1), bool), is_m[:, :-1]], axis=1
    )
    k_runs = jnp.sum(is_gap & prev_is_m, axis=1, dtype=jnp.int32)
    last_op = jnp.take_along_axis(
        rop, jnp.maximum(n_runs - 1, 0)[:, None], axis=1
    )[:, 0]
    ends_gap = (n_runs > 0) & ((last_op == OP_INS) | (last_op == OP_DEL))
    mism = sub_mm + 2 * k_runs - 2 * ends_gap.astype(jnp.int32)
    mism = jnp.where(out["walk_ok"], mism, 32000)
    has_gap = (k_all > 0).astype(jnp.int8)
    rlen_la, la_fallback = _left_align_rle(
        rop, rlen, n_runs, start_j, query, subject
    )
    rle = jnp.where(valid, rop | (rlen_la << 2), 0).astype(jnp.int16)
    return {
        "mism": mism,
        "has_gap": has_gap,
        "rle": rle,
        "n_runs": n_runs,
        "n_ops": n_ops,
        "start_j": start_j,
        "la_fallback": la_fallback,
    }


@jax.jit
def dp_stats_runs_hamming(out: dict):
    """Long-read segment stats from run-jump traceback output.

    The long-read chain walk counts mismatches Hamming-style — +1 per
    mismatched pair AND +1 per gap COLUMN (the reference's
    HammingSequenceDistanceMeasure over aligned fragments,
    LongReadsUngappedSearchHitsClusterAligner.java:127-156) — unlike the
    tier-3 statistic's +2 per gap run.  mism = substitutions (score
    decomposition, tier-3 default scores assumed) + total gap columns.
    Returns rle (int16, op | len<<2), n_runs, mism, start_j, end_j,
    walk_ok."""
    rop, rlen = out["rop"], out["rlen"]
    n_runs = out["n_runs"]
    score = out["score"]
    B, R = rop.shape
    slot = jnp.arange(R, dtype=jnp.int32)[None, :]
    valid = slot < n_runs[:, None]
    is_m = (rop == OP_MATCH) & valid
    is_gap = ((rop == OP_INS) | (rop == OP_DEL)) & valid
    m_cnt = jnp.sum(jnp.where(is_m, rlen, 0), axis=1, dtype=jnp.int32)
    gap_len = jnp.sum(jnp.where(is_gap, rlen, 0), axis=1, dtype=jnp.int32)
    k_all = jnp.sum(is_gap, axis=1, dtype=jnp.int32)
    sub_mm = (m_cnt - score - 2 * k_all - gap_len) >> 1
    mism = jnp.where(out["walk_ok"], sub_mm + gap_len, 30000)
    rle = jnp.where(valid, rop | (rlen << 2), 0).astype(jnp.int16)
    return {
        "rle": rle,
        "n_runs": n_runs,
        "mism": mism,
        "start_j": out["start_j"],
        "end_j": out["end_j"],
        "walk_ok": out["walk_ok"],
    }


@partial(
    jax.jit,
    static_argnames=("CH", "Lq", "Ls", "n_chunks", "fs2", "fe2"),
)
def dp_run_segments(
    readmat,  # (R, Lp) int8 packed batch read rows (fwd + rev)
    concat,  # (G,) int8 concatenated genome codes
    rows,  # (B,) int32 read row per segment job
    q0,  # (B,) int32 query slice start within the row
    qlen,  # (B,) int32 query slice length
    sfirst,  # (B,) int32 subject window start (concat coords)
    slen,  # (B,) int32 subject window length
    *,
    CH: int,
    Lq: int,
    Ls: int,
    n_chunks: int,
    fs2: bool,
    fe2: bool,
):
    """Long-read segment sweep: the ENTIRE bucket of inter-anchor segment
    alignments as one device program (lax.map over fixed CH-row chunks),
    query/subject slices gathered ON DEVICE from the resident batch read
    matrix and genome.  Replaces the former per-64-row launches with host
    packing + full ops fetches (233 launches and 17 s of 22 s for a
    200-read batch); jobs cross the link as ~20 bytes each and results as
    a ~150-byte RLE row."""
    import jax.lax as lax

    def one(off):
        r = lax.dynamic_slice_in_dim(rows, off, CH, 0)
        qs = lax.dynamic_slice_in_dim(q0, off, CH, 0)
        ql = lax.dynamic_slice_in_dim(qlen, off, CH, 0)
        f = lax.dynamic_slice_in_dim(sfirst, off, CH, 0)
        sl = lax.dynamic_slice_in_dim(slen, off, CH, 0)
        sub = jnp.take(readmat, r, axis=0)  # (CH, Lp)
        Lp = sub.shape[1]
        j = jnp.arange(Lq, dtype=jnp.int32)[None, :]
        idx = jnp.clip(qs[:, None] + j, 0, Lp - 1)
        qc = jnp.where(
            j < ql[:, None],
            jnp.take_along_axis(sub, idx, axis=1),
            jnp.int8(4),
        )
        js = jnp.arange(Ls, dtype=jnp.int32)[None, :]
        sidx = jnp.clip(f[:, None] + js, 0, concat.shape[0] - 1)
        sc = jnp.where(js < sl[:, None], jnp.take(concat, sidx), jnp.int8(4))
        out = affine_gap_align_runs(
            qc, ql, sc, sl, free_start2=fs2, free_end2=fe2
        )
        return dp_stats_runs_hamming(out)

    offs = jnp.arange(n_chunks, dtype=jnp.int32) * CH
    return lax.map(one, offs)


@partial(jax.jit, static_argnames=("Lq", "Ls"))
def dp_gather_inputs(
    bigpq,  # (R, Lp) uint8 packed code|qual<<3, run-wide read matrix
    lengths,  # (R,) int32 read lengths
    concat,  # (G,) int8 concatenated genome codes
    rows,  # (B,) int32 global read row per DP job
    strand,  # (B,) int32 1 = align the reverse complement
    firsts,  # (B,) int32 subject window start (concat coords)
    slen,  # (B,) int32 subject window length
    *,
    Lq: int,
    Ls: int,
):
    """Build the DP query/subject matrices ON DEVICE from the already
    uploaded packed reads and genome.

    The predecessor packed qc/sc on the host and uploaded ~1 KB per job
    per chunk (~80 MB per bench run through the host link); job specs are
    ~20 bytes each instead.  Reverse queries are derived by flip+complement
    here (the reverse rows never exist host-side)."""
    B = rows.shape[0]
    sub = (jnp.take(bigpq, rows, axis=0) & 7).astype(jnp.int8)  # (B, Lp)
    ln = jnp.take(lengths, rows)
    Lp = sub.shape[1]
    j = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    rev = (strand == 1)[:, None]
    idx = jnp.where(rev, ln[:, None] - 1 - j, j)
    g = jnp.take_along_axis(sub, jnp.clip(idx, 0, Lp - 1), axis=1)
    g = jnp.where(rev & (g < 4), 3 - g, g)
    qc = jnp.where(j < ln[:, None], g, jnp.int8(4))
    js = jnp.arange(Ls, dtype=jnp.int32)[None, :]
    sidx = firsts[:, None] + js
    sc_raw = jnp.take(concat, jnp.clip(sidx, 0, concat.shape[0] - 1))
    sc = jnp.where(js < slen[:, None], sc_raw, jnp.int8(4))
    return qc, ln, sc


@partial(jax.jit, static_argnames=("CH", "Lq", "Ls", "n_chunks"))
def dp_run_all(
    bigpq, lengths, concat, rows, strand, firsts, slen,
    *, CH: int, Lq: int, Ls: int, n_chunks: int,
):
    """The ENTIRE tier-3 sweep as one device program: a lax.map over
    fixed-size chunks of the job arrays, each iteration gathering its
    query/subject matrices (dp_gather_inputs), running the Gotoh DP and
    the stats/RLE post-pass.  One dispatch and one result fetch replace
    3 programs + ~4 small uploads per chunk — per-program round-trip
    latency on link-attached chips (~tens of ms each) dominated tier-3
    wall clock at ~90 chunks per run."""
    import jax.lax as lax

    def one(off):
        r = lax.dynamic_slice_in_dim(rows, off, CH, 0)
        st = lax.dynamic_slice_in_dim(strand, off, CH, 0)
        f = lax.dynamic_slice_in_dim(firsts, off, CH, 0)
        sln = lax.dynamic_slice_in_dim(slen, off, CH, 0)
        qc, ln, sc = dp_gather_inputs(
            bigpq, lengths, concat, r, st, f, sln, Lq=Lq, Ls=Ls
        )
        out = affine_gap_align_runs(
            qc, ln, sc, sln, free_start2=True, free_end2=True
        )
        return dp_stats_runs(out, qc, sc)

    offs = jnp.arange(n_chunks, dtype=jnp.int32) * CH
    return lax.map(one, offs)


RLE_MAX = 16  # CIGAR runs per row in the fetched RLE (mism<=0.1*len caps
# gap runs at ~7, so 16 covers every acceptable alignment; n_runs reports
# overflow and the decode falls back to the packed ops for that row)


@jax.jit
def dp_stats_pack(ops, n_ops, start_j, score, query, subject):
    """Device post-pass over affine_gap_align_batch output.

    Computes per row: the tier-3 mismatch statistic (+1 per mismatched
    pair, +2 per internal gap run, -2 when the alignment ends in a gap —
    ShortReadsUngappedSearchHitsClusterAligner.java:140-156), a gap flag,
    the ops 2-bit-packed 16-per-uint32, and an RLE of the op runs
    ((op | len<<2) as int16, RLE_MAX slots).  Callers fetch the ~50-byte
    per-row summary (incl. the RLE, which IS the CIGAR) and leave the
    packed ops on device — the ops fetch dominated tier-3 wall-clock on
    link-attached chips (~22 MB/run at bench scale).

    The substitution count comes from the score decomposition instead of
    a per-base comparison: with match=+1 mismatch=-1 open=3 ext=1 (the
    tier-3 defaults this pass assumes), score = eq - neq - sum over gap
    runs of (2 + run_len), and eq + neq = #M ops, so
    neq = (#M - score - 2*K_runs - gap_len) / 2 exactly — two cumsums
    and two lane-axis gathers (the slowest op class on this chip) drop
    out of the hot pass."""
    B, S = ops.shape
    col = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = col < n_ops[:, None]
    m = (ops == OP_MATCH) & valid
    ins = (ops == OP_INS) & valid
    dele = (ops == OP_DEL) & valid
    g = ins | dele
    z = jnp.zeros((B, 1), bool)
    run_start = g & ~jnp.concatenate([z, g[:, :-1]], axis=1)
    m_cnt = jnp.sum(m, axis=1, dtype=jnp.int32)
    gap_len = jnp.sum(g, axis=1, dtype=jnp.int32)
    k_all = jnp.sum(run_start, axis=1, dtype=jnp.int32)
    sub_mm = (m_cnt - score - 2 * k_all - gap_len) >> 1
    after_m = jnp.concatenate([z, m[:, :-1]], axis=1)
    k_runs = jnp.sum(run_start & after_m, axis=1, dtype=jnp.int32)
    last_op = jnp.take_along_axis(
        ops, jnp.maximum(n_ops - 1, 0)[:, None], axis=1
    )[:, 0]
    ends_gap = (n_ops > 0) & ((last_op == OP_INS) | (last_op == OP_DEL))
    mism = sub_mm + 2 * k_runs - 2 * ends_gap.astype(jnp.int32)
    # int8, not bool: bool device->host copies cost ~85ms each over the
    # link tunnel (per-element widening); int8 is ~20x cheaper
    has_gap = g.any(axis=1).astype(jnp.int8)
    pad = (-S) % 16
    o = ops
    if pad:
        o = jnp.concatenate(
            [o, jnp.zeros((B, pad), o.dtype)], axis=1
        )
    o = o.astype(jnp.uint32).reshape(B, -1, 16)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    packed = jnp.bitwise_or.reduce(o << sh, axis=2)
    # run-length encoding of the op runs.  Run starts land in their rank
    # slot via RLE_MAX masked-min reductions — a (B, S) scatter here ran
    # ~60ms/chunk (TPU scatters serialize); the reduction loop is pure
    # VPU work
    prev = jnp.concatenate(
        [jnp.full((B, 1), 255, ops.dtype), ops[:, :-1]], axis=1
    )
    is_start = valid & (ops != prev)
    rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    n_runs = jnp.sum(is_start, axis=1, dtype=jnp.int32)
    col_b = jnp.broadcast_to(col, (B, S))
    starts = jnp.stack(
        [
            jnp.min(
                jnp.where(is_start & (rank == k), col_b, S), axis=1
            )
            for k in range(RLE_MAX)
        ],
        axis=1,
    ).astype(jnp.int32)
    starts = jnp.where(starts == S, 0, starts)
    slot = jnp.arange(RLE_MAX, dtype=jnp.int32)[None, :]
    nxt = jnp.concatenate(
        [starts[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    end = jnp.where(slot + 1 < n_runs[:, None], nxt, n_ops[:, None])
    rlen = jnp.where(slot < n_runs[:, None], end - starts, 0)
    rop = jnp.take_along_axis(
        ops, jnp.minimum(starts, S - 1), axis=1
    ).astype(jnp.int32)
    rlen, la_fallback = _left_align_rle(
        rop, rlen, n_runs, start_j, query, subject
    )
    rle = jnp.where(
        slot < n_runs[:, None], rop | (rlen << 2), 0
    ).astype(jnp.int16)
    return {
        "mism": mism,
        "has_gap": has_gap,
        "packed": packed,
        "rle": rle,
        "n_runs": n_runs,
        "n_ops": n_ops,
        "start_j": start_j,
        "la_fallback": la_fallback,
    }


LA_LMAX = 16  # max indel length left-aligned on device; longer runs (and
# RLE overflows) raise la_fallback and the host runs the exact pass


def _left_align_rle(rop, rlen, n_runs, start_j, query, subject):
    """Shift I/D runs in the device RLE to their leftmost equivalent
    placement — the same normalization read_alignment.left_align_indels
    applies on host (ref: IndelRealignerPileupListener.moveIndelStarts:274),
    moved on device so gapped rows need no host query fetch or per-row pass.

    A gap run of length l at cursor p (in the consumed sequence: query for
    I, subject for D) shifts k steps iff x[p-1-j] == x[p+l-1-j] for all
    j < k, bounded by the preceding M run.  The first mismatching j is the
    backward run length of eq_l[t] = (x[t] == x[t+l]) ending at t = p-1 —
    computed for every position and every lag 1..LA_LMAX as pure VPU work
    (compare + cummax), then read with ONE take_along_axis per side.  The
    only sequential piece is the 16-slot pass (earlier shifts grow the M
    run that bounds the next gap), a statically unrolled loop of (B,)
    vector updates.

    Cursor positions are invariant under the shifts (a shift moves k bases
    from the preceding M to the following M; total consumption before any
    later run is unchanged), so they are precomputed from the original RLE.

    Returns (new_rlen, la_fallback) where la_fallback flags rows whose
    exact normalization needs the host pass: a gap run longer than
    LA_LMAX, more runs than RLE_MAX, or a shift whose following run is
    not M (the host pass inserts an M run there; slots are fixed here).
    """
    B, R = rop.shape
    slot = jnp.arange(R, dtype=jnp.int32)[None, :]
    valid_slot = slot < n_runs[:, None]
    is_m = rop == OP_MATCH
    is_i = rop == OP_INS
    is_d = rop == OP_DEL
    gap = (is_i | is_d) & valid_slot
    qcons = jnp.where(is_i | is_m, rlen, 0)
    scons = jnp.where(is_d | is_m, rlen, 0)
    pq = jnp.cumsum(qcons, axis=1) - qcons  # query offset at slot start
    ps = start_j[:, None] + jnp.cumsum(scons, axis=1) - scons

    def brl_tables(x):
        # (B, LA_LMAX * L): for lag l (block l-1), the count of consecutive
        # t' <= t with x[t'] == x[t'+l], evaluated at every t
        Bx, L = x.shape
        idxs = jnp.arange(L, dtype=jnp.int32)[None, :]
        tabs = []
        for l in range(1, LA_LMAX + 1):
            eq = jnp.concatenate(
                [x[:, l:] == x[:, : L - l], jnp.zeros((Bx, l), bool)],
                axis=1,
            )
            nf = jnp.where(eq, jnp.int32(-1), idxs)
            tabs.append(idxs - jax.lax.cummax(nf, axis=1))
        return jnp.concatenate(tabs, axis=1)

    Lq = query.shape[1]
    Ls = subject.shape[1]
    lidx = jnp.clip(rlen, 1, LA_LMAX) - 1
    kq = jnp.take_along_axis(
        brl_tables(query), lidx * Lq + jnp.clip(pq - 1, 0, Lq - 1), axis=1
    )
    kd = jnp.take_along_axis(
        brl_tables(subject), lidx * Ls + jnp.clip(ps - 1, 0, Ls - 1), axis=1
    )
    k_raw = jnp.where(is_i, kq, kd)
    k_raw = jnp.where(gap & (rlen >= 1) & (rlen <= LA_LMAX), k_raw, 0)
    fallback = jnp.any(gap & (rlen > LA_LMAX), axis=1) | (n_runs > R)

    lens = rlen
    for t in range(1, R):
        next_m = (
            is_m[:, t + 1] & (n_runs > t + 1)
            if t + 1 < R
            else jnp.zeros((B,), bool)
        )
        can = gap[:, t] & is_m[:, t - 1]
        p_t = jnp.where(is_i[:, t], pq[:, t], ps[:, t])
        k = jnp.minimum(k_raw[:, t], jnp.minimum(lens[:, t - 1], p_t))
        k = jnp.where(can, k, 0)
        fallback = fallback | ((k > 0) & ~next_m)
        k = jnp.where(next_m, k, 0)
        lens = lens.at[:, t - 1].add(-k)
        if t + 1 < R:
            lens = lens.at[:, t + 1].add(k)
    return lens, fallback.astype(jnp.int8)

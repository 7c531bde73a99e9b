"""Batched simple-gap (linear) and static-banded pairwise alignment.

Ref: src/ngsep/alignments/PairwiseAlignerSimpleGap.java:29-273 — single-matrix
NW with linear gap cost `openGap`, forceStart/forceEnd flags (free ends score
0 at the boundary and search the last column/row), `local` mode (clamp at 0,
traceback from the global max until a 0 cell), and traceback preference
diagonal > up (seq1 consumed) > left.
Ref: src/ngsep/alignments/PairwiseAlignerStaticBanded.java:8-160 — global NW
restricted to a diagonal band of half-width k (requires |L1-L2| <= k), linear
gap `indel`, same traceback preference.

TPU redesign (same scheme as kernels/pairwise.py): one `lax.scan` over query
rows, each row vectorized over subject positions and the batch.  The in-row
left-move chain has linear cost, so it collapses to a closed-form cumulative
max:  S[i][j] = max_{e<=j}(cand[e] - gap*(j-e)) = cummax(cand + gap*e) - gap*j
(the local-mode clamp at 0 cannot be improved by a left move out of a clamped
cell, so the closed form survives clamping).  The banded kernel stores rows in
band coordinates d = j - i + k, making each row O(2k+1) vector work: diagonal
moves keep d, up-moves read d+1, left-moves chain along d with the same
cummax trick — O(Lq*(2k+1)) total instead of O(Lq*Ls).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import NEG, OP_DEL, OP_INS, OP_MATCH, OP_NONE

# traceback pointer codes
PTR_DIAG = 0
PTR_UP = 1  # seq1 (query) consumed: OP_INS
PTR_LEFT = 2  # seq2 (subject) consumed: OP_DEL
PTR_START = 3  # local-mode zero cell: alignment starts here


@partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap",
        "force_start1", "force_start2", "force_end1", "force_end2", "local",
    ),
)
def simple_gap_align_batch(
    query: jnp.ndarray,  # (B, Lq) int8 codes, padded
    qlen: jnp.ndarray,  # (B,) int32
    subject: jnp.ndarray,  # (B, Ls) int8 codes, padded
    slen: jnp.ndarray,  # (B,) int32
    match: int = 1,
    mismatch: int = 1,
    gap: int = 2,
    force_start1: bool = True,
    force_start2: bool = True,
    force_end1: bool = True,
    force_end2: bool = True,
    local: bool = False,
):
    """Batch linear-gap alignment of query[i] vs subject[i].

    Mirrors PairwiseAlignerSimpleGap semantics exactly (boundary rows
    :137-151, free-end search :196-221, tail emission :223-232, traceback
    order :236-255, local max = last (i,j) in row-major order :188-201).

    Returns dict: score (B,), ops (B, Lq+Ls) uint8 forward order, n_ops (B,),
    start_i/start_j (B,) 0-based alignment starts (local mode), end_i/end_j.
    """
    B, Lq = query.shape
    _, Ls = subject.shape
    jj = jnp.arange(Ls + 1, dtype=jnp.int32)

    if force_start2:
        s0 = jnp.where(jj <= slen[:, None], -gap * jj, NEG).astype(jnp.int32)
    else:
        s0 = jnp.where(jj <= slen[:, None], 0, NEG).astype(jnp.int32)
    gap_j = gap * jj

    def row_step(carry, qi):
        s_prev, best, bi, bj = carry  # (B, Ls+1), (B,), (B,), (B,)
        q_char, row_i = qi
        sub = jnp.where(subject == q_char[:, None], match, -mismatch).astype(jnp.int32)
        diag_inner = s_prev[:, :-1] + sub  # (B, Ls) for j=1..Ls
        up_inner = s_prev[:, 1:] - gap
        c0 = jnp.where(force_start1, -gap * row_i, 0).astype(jnp.int32)
        c0 = jnp.broadcast_to(c0[None], (B,))
        cand = jnp.maximum(diag_inner, up_inner)
        if local:
            cand = jnp.maximum(cand, 0)
        a = jnp.concatenate([c0[:, None], cand], axis=1)  # (B, Ls+1)
        run = jax.lax.cummax(a + gap_j[None, :], axis=1)
        s_row = run - gap_j[None, :]
        if local:
            s_row = jnp.maximum(s_row, 0)
        s_row = s_row.at[:, 0].set(c0)
        # mask out-of-range subject columns
        s_row = jnp.where(jj[None, :] <= slen[:, None], s_row, NEG)

        diag_cand = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), diag_inner], axis=1
        )
        up_cand = jnp.concatenate([jnp.full((B, 1), NEG, jnp.int32), up_inner], axis=1)
        left_cand = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), s_row[:, :-1] - gap], axis=1
        )
        # diag > up > left preference (ref :240-254); in local mode any
        # zero-valued cell is an alignment start (ref :239 breaks BEFORE
        # testing candidates)
        ptr = jnp.where(
            s_row == diag_cand,
            PTR_DIAG,
            jnp.where(
                s_row == up_cand,
                PTR_UP,
                jnp.where(s_row == left_cand, PTR_LEFT, PTR_START),
            ),
        )
        if local:
            ptr = jnp.where(s_row == 0, PTR_START, ptr)
        ptr = ptr.astype(jnp.uint8)

        # running interior max: ref scans i ascending / j ascending updating
        # on equality, so the LAST (largest i, then largest j) tie wins
        valid = (jj[None, :] >= 1) & (jj[None, :] <= slen[:, None])
        masked = jnp.where(valid, s_row, NEG)
        row_best = jnp.max(masked, axis=1)
        rev_hit = (masked == row_best[:, None])[:, ::-1]
        row_bj = (Ls - jnp.argmax(rev_hit, axis=1)).astype(jnp.int32)
        take = (row_i <= qlen) & (row_best >= best)
        best = jnp.where(take, row_best, best)
        bi = jnp.where(take, row_i, bi)
        bj = jnp.where(take, row_bj, bj)

        active = row_i <= qlen
        s_row = jnp.where(active[:, None], s_row, s_prev)
        # last-column value per row for the free_end1 search
        s_at_slen = jnp.where(
            active,
            jnp.take_along_axis(s_row, slen[:, None], axis=1)[:, 0],
            NEG,
        )
        return (s_row, best, bi, bj), (ptr[:, 1:], s_at_slen)

    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    best0 = jnp.zeros((B,), jnp.int32)
    (s_fin, best, bi, bj), (ptr_rows, s_cols) = jax.lax.scan(
        row_step, (s0, best0, best0, best0), (query.T, rows)
    )
    ptrs = jnp.transpose(ptr_rows, (1, 0, 2))  # (B, Lq, Ls)

    corner = jnp.take_along_axis(s_fin, slen[:, None], axis=1)[:, 0]
    if local:
        score = best
        end_i, end_j = bi, bj
    elif not force_end1:
        # best over last column, ties at the largest row (ref :196-204)
        h0 = jnp.where(slen == 0, 0, jnp.where(force_start2, -gap * slen, 0))
        h0 = h0.astype(jnp.int32)[None, :]
        stack = jnp.concatenate([h0, s_cols], axis=0)  # (Lq+1, B)
        lmask = jnp.arange(Lq + 1)[:, None] <= qlen[None, :]
        stack = jnp.where(lmask, stack, NEG)
        score = jnp.max(stack, axis=0)
        rev_hit = (stack == score[None, :])[::-1]
        end_i = (Lq - jnp.argmax(rev_hit, axis=0)).astype(jnp.int32)
        end_j = slen
    elif not force_end2:
        masked = jnp.where(jj[None, :] <= slen[:, None], s_fin, NEG)
        score = jnp.max(masked, axis=1)
        rev_hit = (masked == score[:, None])[:, ::-1]
        end_j = (Ls - jnp.argmax(rev_hit, axis=1)).astype(jnp.int32)
        end_i = qlen
    else:
        score = corner
        end_i, end_j = qlen, slen

    # --- traceback: tails first (ref :223-232), then pointer walk ---------
    max_steps = Lq + Ls
    emit_tails = not local

    def walk(ptr_one, ei, ej, ql, sl):
        def step(state, _):
            i, j, done, n, ops, si, sj = state
            # unaligned tails (non-local): query tail as INS then subject
            # tail as DEL, emitted back-to-front so they land AFTER the
            # core alignment in forward order (ref append order :223-232)
            tail1 = jnp.bool_(emit_tails) & (i > ei)
            tail2 = jnp.bool_(emit_tails) & (i == ei) & (j > ej)
            in_core = (~tail1) & (~tail2) & (~done)
            p = ptr_one[jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0)].astype(jnp.int32)
            both = (i > 0) & (j > 0)
            if local:
                core_op = jnp.where(
                    both & (p != PTR_START),
                    jnp.where(p == PTR_DIAG, OP_MATCH,
                              jnp.where(p == PTR_UP, OP_INS, OP_DEL)),
                    OP_NONE,
                )
            else:
                core_op = jnp.where(
                    both,
                    jnp.where(p == PTR_DIAG, OP_MATCH,
                              jnp.where(p == PTR_UP, OP_INS, OP_DEL)),
                    jnp.where(i > 0, OP_INS, jnp.where(j > 0, OP_DEL, OP_NONE)),
                )
            op = jnp.where(
                tail1, OP_INS,
                jnp.where(tail2, OP_DEL, jnp.where(in_core, core_op, OP_NONE)),
            )
            done = done | (in_core & (core_op == OP_NONE))
            di = jnp.where((op == OP_MATCH) | (op == OP_INS), 1, 0)
            dj = jnp.where((op == OP_MATCH) | (op == OP_DEL), 1, 0)
            ops = ops.at[n].set(op.astype(jnp.uint8))
            n = n + jnp.where(op != OP_NONE, 1, 0)
            emitted = (op != OP_NONE) & in_core
            si = jnp.where(emitted, i - di, si)
            sj = jnp.where(emitted, j - dj, sj)
            return (i - di, j - dj, done, n, ops, si, sj), None

        ops0 = jnp.zeros((max_steps,), jnp.uint8)
        i0_, j0_ = (ql, sl) if emit_tails else (ei, ej)
        state0 = (i0_, j0_, jnp.bool_(False), jnp.int32(0), ops0, ei, ej)
        (fi, fj, _, n, ops, si, sj), _ = jax.lax.scan(
            step, state0, None, length=max_steps
        )
        return ops, n, si, sj

    ops_rev, n_ops, start_i, start_j = jax.vmap(walk)(
        ptrs, end_i, end_j, qlen, slen
    )
    idx = jnp.arange(max_steps, dtype=jnp.int32)[None, :]
    src = n_ops[:, None] - 1 - idx
    ops_fwd = jnp.where(
        src >= 0, jnp.take_along_axis(ops_rev, jnp.maximum(src, 0), axis=1), OP_NONE
    ).astype(jnp.uint8)
    return {
        "score": score,
        "ops": ops_fwd,
        "n_ops": n_ops,
        "start_i": start_i,
        "start_j": start_j,
        "end_i": end_i,
        "end_j": end_j,
    }


@partial(jax.jit, static_argnames=("k", "match", "mismatch", "indel"))
def banded_align_batch(
    query: jnp.ndarray,  # (B, Lq) int8, padded
    qlen: jnp.ndarray,  # (B,) int32
    subject: jnp.ndarray,  # (B, Ls) int8, padded
    slen: jnp.ndarray,  # (B,) int32
    k: int = 3,
    match: int = 1,
    mismatch: int = 1,
    indel: int = 2,
):
    """Batch static-banded global alignment (band half-width k).

    Rows live in band coordinates d = j - i + k in [0, 2k].  Requires
    |slen - qlen| <= k per pair (caller-checked, ref checkminK).  Returns
    dict: score (B,), ops (B, Lq+Ls) uint8 forward, n_ops (B,).
    """
    B, Lq = query.shape
    _, Ls = subject.shape
    W = 2 * k + 1
    dd = jnp.arange(W, dtype=jnp.int32)

    # row 0: cell (0, j=d-k) = -indel*j for 0<=j<=min(k, slen)
    j0 = dd[None, :] - k
    band0 = jnp.where(
        (j0 >= 0) & (j0 <= slen[:, None]), -indel * j0, NEG
    ).astype(jnp.int32)

    gap_d = indel * dd

    def row_step(carry, qi):
        b_prev = carry  # (B, W)
        q_char, row_i = qi
        j_row = dd[None, :] + (row_i - k)  # subject col per band slot
        valid = (j_row >= 0) & (j_row <= slen[:, None])
        # subject char at j_row-1 (for j_row>=1)
        s_char = jnp.take_along_axis(
            subject, jnp.clip(j_row - 1, 0, Ls - 1), axis=1
        )
        sub = jnp.where(s_char == q_char[:, None], match, -mismatch).astype(jnp.int32)
        diag = b_prev + sub  # same d
        up = jnp.concatenate(
            [b_prev[:, 1:], jnp.full((B, 1), NEG, jnp.int32)], axis=1
        ) - indel
        cand = jnp.maximum(diag, up)
        # j == 0 boundary cell: -indel * i (pure up chain)
        is_j0 = j_row == 0
        cand = jnp.where(is_j0, -indel * row_i, cand)
        run = jax.lax.cummax(cand + gap_d[None, :], axis=1)
        b_row = run - gap_d[None, :]
        b_row = jnp.where(valid, b_row, NEG)

        left_cand = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), b_row[:, :-1] - indel], axis=1
        )
        ptr = jnp.where(
            is_j0,
            PTR_UP,
            jnp.where(
                b_row == diag, PTR_DIAG, jnp.where(b_row == up, PTR_UP, PTR_LEFT)
            ),
        ).astype(jnp.uint8)

        active = row_i <= qlen
        b_row = jnp.where(active[:, None], b_row, b_prev)
        return b_row, ptr

    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    b_fin, ptr_rows = jax.lax.scan(row_step, band0, (query.T, rows))
    ptrs = jnp.transpose(ptr_rows, (1, 0, 2))  # (B, Lq, W)

    d_fin = jnp.clip(slen - qlen + k, 0, W - 1)
    score = jnp.take_along_axis(b_fin, d_fin[:, None], axis=1)[:, 0]

    max_steps = Lq + Ls

    def walk(ptr_one, ei, dj):
        # state: (i, d) band coords; j = d + i - k
        def step(state, _):
            i, d, n, ops = state
            j = d + i - k
            at_origin = (i <= 0) & (j <= 0)
            p = ptr_one[jnp.maximum(i - 1, 0), jnp.clip(d, 0, W - 1)].astype(jnp.int32)
            # boundary rows: i==0 -> left moves; j==0 handled by PTR_UP cells
            op = jnp.where(
                at_origin,
                OP_NONE,
                jnp.where(
                    i == 0,
                    OP_DEL,
                    jnp.where(p == PTR_DIAG, OP_MATCH, jnp.where(p == PTR_UP, OP_INS, OP_DEL)),
                ),
            )
            di = jnp.where((op == OP_MATCH) | (op == OP_INS), 1, 0)
            # band coord update: diag keeps d; up: d+1; left: d-1
            nd = jnp.where(op == OP_MATCH, d, jnp.where(op == OP_INS, d + 1, d - 1))
            nd = jnp.where(op == OP_NONE, d, nd)
            ops = ops.at[n].set(op.astype(jnp.uint8))
            n = n + jnp.where(op != OP_NONE, 1, 0)
            return (i - di, nd, n, ops), None

        ops0 = jnp.zeros((max_steps,), jnp.uint8)
        (fi, fd, n, ops), _ = jax.lax.scan(
            step, (ei, dj, jnp.int32(0), ops0), None, length=max_steps
        )
        return ops, n

    ops_rev, n_ops = jax.vmap(walk)(ptrs, qlen, d_fin)
    idx = jnp.arange(max_steps, dtype=jnp.int32)[None, :]
    src = n_ops[:, None] - 1 - idx
    ops_fwd = jnp.where(
        src >= 0, jnp.take_along_axis(ops_rev, jnp.maximum(src, 0), axis=1), OP_NONE
    ).astype(jnp.uint8)
    return {"score": score, "ops": ops_fwd, "n_ops": n_ops}


def ops_to_strings(
    ops: np.ndarray,
    n_ops: int,
    q: str,
    s: str,
    start_i: int = 0,
    start_j: int = 0,
) -> tuple[str, str]:
    """Host: ops -> gapped aligned strings (reference calculateAlignment)."""
    a1, a2 = [], []
    i, j = start_i, start_j
    for op in ops[:n_ops]:
        if op == OP_MATCH:
            a1.append(q[i]); a2.append(s[j]); i += 1; j += 1
        elif op == OP_INS:
            a1.append(q[i]); a2.append("-"); i += 1
        elif op == OP_DEL:
            a1.append("-"); a2.append(s[j]); j += 1
    return "".join(a1), "".join(a2)

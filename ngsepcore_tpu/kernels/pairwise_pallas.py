"""Pallas wavefront Gotoh forward pass with VMEM-resident carries.

Ref semantics: PairwiseAlignerAffineGap.java:29-292 (scores, tie order
M>I>D) — identical to kernels/pairwise.affine_gap_align_runs's XLA scan;
this kernel replaces only the FORWARD pass (score rows + the packed
run/pointer plane), keeping the run-jump traceback in XLA.

Why Pallas: the XLA scan's per-row op graph (shifts, concats, masked
cummax, pack) re-materializes every (B, Ls) intermediate through HBM-able
buffers and pays scan bookkeeping per row; here the three score rows and
the four run/pointer carries live in VMEM scratch across a (batch-tile,
row) grid — TPU Pallas executes the grid serially per core, so scratch
persists and each row is pure VPU work over resident data.

Layout: grid = (B / B_TILE, Lq), row-major so rows iterate innermost.
Per-cell outputs go to the SAME (Lq, B, Ls) uint32 plane layout the
run-jump walk consumes (bits 0-5 run-start pointers, 8-31 saturating run
lengths; see pairwise.py).  Scope: free_start1/free_end1 unsupported
(the tier-2 STR aligners keep the XLA path); all tier-3 and long-read
segment configurations are covered.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 7)

B_TILE = 256


def _shift_right(x, s, fill):
    """Shift lanes right by static s, filling with `fill` (roll + mask)."""
    rolled = pltpu.roll(x, s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= s, rolled, fill)


def _cummax_lanes(x, Ls):
    run = x
    s = 1
    while s < Ls:
        run = jnp.maximum(run, _shift_right(run, s, jnp.int32(NEG)))
        s *= 2
    return run


def _gotoh_kernel_factory(
    Lq, Ls, match, mismatch, open_gap, ext_gap, free_start2, free_end2
):
    def kernel(
        q_ref, s_ref, qlen_ref, slen_ref, plane_ref, fin_ref,
        m_s, i_s, d_s, em_s, ei_s, sm_s, si_s, mb_s,
    ):
        j = pl.program_id(1)  # row index 0..Lq-1 == query row j+1
        col1 = jax.lax.broadcasted_iota(jnp.int32, (B_TILE, Ls), 1) + 1

        @pl.when(j == 0)
        def _init():
            # row 0 boundary state over cols 1..Ls
            m_s[:] = jnp.full((B_TILE, Ls), NEG, jnp.int32)
            i_s[:] = jnp.full((B_TILE, Ls), NEG, jnp.int32)
            if free_start2:
                d_s[:] = jnp.zeros((B_TILE, Ls), jnp.int32)
            else:
                d_s[:] = -open_gap - ext_gap * (col1 - 1)
            em_s[:] = jnp.zeros((B_TILE, Ls), jnp.int32)
            ei_s[:] = jnp.zeros((B_TILE, Ls), jnp.int32)
            sm_s[:] = jnp.zeros((B_TILE, Ls), jnp.int32)
            si_s[:] = jnp.zeros((B_TILE, Ls), jnp.int32)
            # boundary col (j=0) carries: slots 0/1/2 = m/i/d at col 0 of
            # the PREVIOUS row (row 0 has m=i=d=0), slots 3/4 = em/sm at
            # the boundary (always 0)
            mb_s[:] = jnp.zeros((B_TILE, 8), jnp.int32)

        row = j + 1  # 1-based DP row
        qlen = qlen_ref[:, 0]  # (B_TILE,)
        slen = slen_ref[:, 0]
        active = (row <= qlen)[:, None]  # (B_TILE, 1)

        q = q_ref[0, 0, :][:, None]  # (B_TILE, 1) int32, this row's chars
        sub = jnp.where(
            s_ref[:].astype(jnp.int32) == q, match, -mismatch
        )  # (B_TILE, Ls)

        m_prev = m_s[:]
        i_prev = i_s[:]
        d_prev = d_s[:]
        em_prev = em_s[:]
        ei_prev = ei_s[:]
        sm_prev = sm_s[:]
        si_prev = si_s[:]
        mb1 = mb_s[:, 0]
        ib1 = mb_s[:, 1]
        db1 = mb_s[:, 2]
        mb = mb1[:, None]
        ib = ib1[:, None]
        db = db1[:, None]
        emb = mb_s[:, 3][:, None]
        smb = mb_s[:, 4][:, None]

        # shifted previous row (col t-1 for col t; boundary scalars at t=1)
        def shl(x, bound):
            r = _shift_right(x, 1, jnp.int32(0))
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(col == 0, bound, r)

        mp_d = shl(m_prev, mb)
        ip_d = shl(i_prev, ib)
        dp_d = shl(d_prev, db)
        best_diag = jnp.maximum(jnp.maximum(mp_d, ip_d), dp_d)
        m_row = best_diag + sub
        mp = jnp.where(
            mp_d >= jnp.maximum(ip_d, dp_d),
            0,
            jnp.where(ip_d >= dp_d, 1, 2),
        )
        em_row = jnp.minimum(
            1 + jnp.where(mp == 0, shl(em_prev, emb), 0), 255
        )
        sm_row = jnp.where(mp != 0, mp, shl(sm_prev, smb))

        i_cand_m = m_prev - open_gap
        i_cand_i = i_prev - ext_gap
        i_cand_d = d_prev - open_gap
        i_row = jnp.maximum(jnp.maximum(i_cand_m, i_cand_i), i_cand_d)
        ip = jnp.where(
            i_cand_m >= jnp.maximum(i_cand_i, i_cand_d),
            0,
            jnp.where(i_cand_i >= i_cand_d, 1, 2),
        )
        ei_row = jnp.minimum(1 + jnp.where(ip == 1, ei_prev, 0), 255)
        si_row = jnp.where(ip != 1, ip, si_prev)
        # boundary col values of THIS row
        mb_new = jnp.full((B_TILE, 1), NEG, jnp.int32)
        ib_new = jnp.full((B_TILE, 1), -open_gap, jnp.int32) - ext_gap * (
            row - 1
        )

        a_m = m_row - open_gap
        a_i = i_row - open_gap
        a = jnp.maximum(a_m, a_i)
        a_b = jnp.maximum(mb_new, ib_new) - open_gap  # boundary A
        # D via lane cummax of (A[h] + ext*h) over h <= t-1 (h=0 boundary)
        ext_h = ext_gap * col1  # h == col index for the SHIFTED array
        sh_a = shl(a, a_b)  # A at h = t-1 for col t
        run = _cummax_lanes(sh_a + ext_gap * (col1 - 1), Ls)
        d_row = run - ext_gap * (col1 - 1) + 0  # == cummax - ext*(t-1)
        # open/extend pointers: opened iff A[t-1] >= D[t-1] - ext
        d_sh = shl(d_row, jnp.full((B_TILE, 1), NEG, jnp.int32))
        opened = sh_a >= (d_sh - ext_gap)
        open_from_m = shl(a_m, jnp.full((B_TILE, 1), NEG, jnp.int32)) >= shl(
            a_i, ib_new - open_gap
        )
        dp = jnp.where(opened, jnp.where(open_from_m, 0, 1), 2)
        # D runs/source via packed cummax of (t*4+dp | boundary 0)
        ov = jnp.where(dp != 2, col1 * 4 + dp, -1)
        orun = jnp.maximum(_cummax_lanes(ov, Ls), 0)
        sd_row = orun & 3
        ed_row = jnp.minimum(col1 - (orun >> 2) + 1, 255)

        # freeze rows past qlen
        m_row = jnp.where(active, m_row, m_prev)
        i_row = jnp.where(active, i_row, i_prev)
        d_row = jnp.where(active, d_row, d_prev)
        em_row = jnp.where(active, em_row, em_prev)
        ei_row = jnp.where(active, ei_row, ei_prev)
        sm_row = jnp.where(active, sm_row, sm_prev)
        si_row = jnp.where(active, si_row, si_prev)

        m_s[:] = m_row
        i_s[:] = i_row
        d_s[:] = d_row
        em_s[:] = em_row
        ei_s[:] = ei_row
        sm_s[:] = sm_row
        si_s[:] = si_row
        act1 = active[:, 0]
        mb_s[:, 0] = jnp.where(act1, mb_new[:, 0], mb1)
        mb_s[:, 1] = jnp.where(act1, ib_new[:, 0], ib1)
        mb_s[:, 2] = jnp.where(act1, jnp.full_like(db1, NEG), db1)
        # em/sm boundary stay 0

        plane_ref[0] = (
            sm_row
            | (si_row << 2)
            | (sd_row << 4)
            | (em_row << 8)
            | (ei_row << 16)
            | (ed_row << 24)
        ).astype(jnp.uint32)

        @pl.when(j == Lq - 1)
        def _final():
            col_ok = col1 <= slen[:, None]
            masked = jnp.where(col_ok, m_s[:], NEG)
            if free_end2:
                best = jnp.max(masked, axis=1)
                endj = jnp.max(
                    jnp.where(
                        col_ok & (masked == best[:, None]), col1, 0
                    ),
                    axis=1,
                )
                score = best
                start_k = jnp.zeros((B_TILE,), jnp.int32)
            else:
                at = col1 == slen[:, None]
                mc = jnp.max(jnp.where(at, m_s[:], NEG), axis=1)
                ic = jnp.max(jnp.where(at, i_s[:], NEG), axis=1)
                dc = jnp.max(jnp.where(at, d_s[:], NEG), axis=1)
                # slen == 0 corner: boundary col values
                z = slen == 0
                mc = jnp.where(z, mb_s[:, 0], mc)
                ic = jnp.where(z, mb_s[:, 1], ic)
                dc = jnp.where(z, mb_s[:, 2], dc)
                score = mc
                start_k = jnp.zeros((B_TILE,), jnp.int32)
                score = jnp.where(ic > score, ic, score)
                start_k = jnp.where(ic > mc, 1, start_k)
                score = jnp.where(dc > score, dc, score)
                start_k = jnp.where(dc > jnp.maximum(mc, ic), 2, start_k)
                endj = slen
            fin_ref[:, 0] = score
            fin_ref[:, 1] = endj
            fin_ref[:, 2] = start_k

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "open_gap", "ext_gap",
        "free_start2", "free_end2", "interpret",
    ),
)
def gotoh_forward_plane_pallas(
    query, qlen, subject, slen,
    match=1, mismatch=1, open_gap=3, ext_gap=1,
    free_start2=True, free_end2=True,
    interpret=False,
):
    """Forward Gotoh via the Pallas kernel.  Returns
    (plane (Lq, B, Ls) uint32, score (B,), end_j (B,), start_k (B,)).
    Requires B % B_TILE == 0 and Ls % 128 == 0 (callers pad)."""
    B, Lq = query.shape
    _, Ls = subject.shape
    assert B % B_TILE == 0, B
    assert Ls % 128 == 0 and Ls >= 128, Ls
    kernel = _gotoh_kernel_factory(
        Lq, Ls, match, mismatch, open_gap, ext_gap, free_start2, free_end2
    )
    nb = B // B_TILE
    # trace with x64 OFF: under jax_enable_x64 the Python-int constants
    # and roll shifts trace as weak int64, which (a) sends an i64 operand
    # into tpu.dynamic_rotate (Mosaic verification error) and (b) trips an
    # infinite recursion in the abstract-eval cache-key walk of this jax
    # version.  Every dtype here is explicit int8/int32/uint32, so the
    # narrowed promotion rules change nothing else.
    with jax.enable_x64(False):
        return _call_kernel(
            kernel, query, qlen, subject, slen, nb, Lq, Ls, interpret
        )


def _call_kernel(kernel, query, qlen, subject, slen, nb, Lq, Ls, interpret=False):
    B = query.shape[0]
    plane, fin = pl.pallas_call(
        kernel,
        grid=(nb, Lq),
        in_specs=[
            # query transposed to (Lq, 1, B): the row's chars arrive via
            # block indexing (Mosaic rejects dynamic lane slices that are
            # not 128-aligned)
            pl.BlockSpec(
                (1, 1, B_TILE), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B_TILE, Ls), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, B_TILE, Ls), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B_TILE, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lq, B, Ls), jnp.uint32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B_TILE, Ls), jnp.int32) for _ in range(7)
        ] + [pltpu.VMEM((B_TILE, 8), jnp.int32)],
        interpret=interpret,
    )(
        query.T.astype(jnp.int32)[:, None, :],
        subject,
        qlen[:, None].astype(jnp.int32),
        slen[:, None].astype(jnp.int32),
    )
    return plane, fin[:, 0], fin[:, 1], fin[:, 2]

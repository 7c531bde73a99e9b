"""Scatter-free pileup accumulation: shear + per-position histogram.

Ref behavior being replaced: AlignmentsPileupGenerator.java:377-403 walks
one alignment at a time and SingleSampleVariantPileupListener counts each
base call into per-position allele/quality tallies.  The first TPU port
expressed that as one scatter-add lane per base (kernels/genotyping.py
_span_scatter_counts), but TPU scatter serializes per update lane
(~36M lanes/s measured on v5e-class hardware): at 160 lanes/read it cost
~140ms per 1 Mbp window and dominated the whole pipeline.

Scatter-free formulation.  Reads are compacted once per run into
genome-oriented "col byte" rows (ngsepcore_tpu/call/fused_pipeline.py):

    colg[r, o] = col | (strand << 7)        (uint8)

where o indexes GENOME offsets from the read's predicted start (reverse
reads are flipped and complemented at compaction), and col is the count
column: al*nq + qbin for a usable SNV base call, COL_N for N bases,
COL_LOW for base quality <= 3 (CountsHelper.java:214-218), 127 for lanes
outside the aligned span.  nq is the number of DISTINCT base qualities in
the run (qualities are clamped to 0..30 first, CountsHelper.java:217-218),
so the column space is adaptive: counting per distinct quality is exact
while keeping the histogram narrow (nq=1 for constant-quality data vs the
31 fixed bins of the dense layout).

Rank-0 rows (first read at each start position) are row-scattered into a
position-indexed stage and transposed once per genome chunk:

    stage_T[o, HALO + s - chunk0] = colg[row starting at s][o]   else 0xFF

Then the per-position histogram is a SHEAR: position p receives lane o of
the read starting at p - o, i.e. column p of output = histogram over
{stage_T[o, p - o] : o in [0, Lp)} — 160 statically-shifted row slices, no
data-dependent indexing at all.  The Pallas kernel below walks those
slices with the accumulator resident in VMEM laid out (bins, T) so the
one-hot compare-adds span full 8x128 vector registers.

Reads beyond rank 0 at a start position (rare: same predicted start) and
host-path packed calls are added afterwards with small bounded scatters.
"""
from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from contextlib import contextmanager


@contextmanager
def _deep_trace():
    """Temporarily raise the recursion limit around kernel tracing: the
    shear kernel statically unrolls one slice per read lane (160+) and
    JAX/Pallas trace bookkeeping recurses deeper than CPython's default
    1000 frames.  Scoped here (not at import) so the bump is not a
    process-global side effect."""
    old = sys.getrecursionlimit()
    if old < 500_000:
        sys.setrecursionlimit(500_000)
    try:
        yield
    finally:
        if sys.getrecursionlimit() > old:
            sys.setrecursionlimit(old)

# combined output layout (W, 128): count columns first, strand counts last
STRAND_COL0 = 120  # strand counts at cols 120..127: al*2 + strand
COL_INVALID = 127  # col bits of an empty stage byte (0xFF & 127)


def col_layout(nq: int) -> tuple[int, int, int]:
    """(COL_N, COL_LOW, n_count_cols) for an nq-bin column space."""
    return 4 * nq, 4 * nq + 1, 4 * nq + 2


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _halo(lanes: int) -> int:
    """Left halo, rounded to the 128-lane tile so every kernel buffer shape
    is tile-aligned (Mosaic's uint8->int32 conversion recurses forever on
    unaligned 2-D shapes)."""
    return -(-lanes // 128) * 128


def _hist_kernel(w0s_ref, stage_ref, out_ref, buf, sem, *, T, Lp, nq, bins_t):
    """One output tile of T positions: shear slices -> (bins_t, T) one-hot
    accumulate -> transposed write into the (T, 128) combined block."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = _halo(Lp)
    i = pl.program_id(0)
    # stage col of this tile's first position, minus halo; callers pass w0s
    # that is a multiple of 128 (window sizes and the halo both are), which
    # Mosaic cannot prove for a runtime scalar — assert it
    c0 = pl.multiple_of(w0s_ref[0] + i * T - H, 128)
    dma = pltpu.make_async_copy(
        stage_ref.at[:, pl.ds(c0, T + H)], buf, sem
    )
    dma.start()
    dma.wait()

    col_n, col_low, ncnt = col_layout(nq)
    # field extraction vectorized over the whole (Lp, T+Lp) buffer ONCE;
    # the o-loop then only slices values (ref loads per-o recurse in
    # pallas' transform wrapping and blow the Python stack at 160 lanes)
    # all scalars below are explicit int32: a weak Python-int literal inside
    # jnp.where becomes int64 under x64 and Mosaic's int64->int32 convert
    # lowering recurses forever
    B = buf[:, :].astype(jnp.int32)
    col = B & jnp.int32(127)
    # allele index without division: col < 4*nq lanes are SNV calls
    al = (
        (col >= jnp.int32(nq)).astype(jnp.int32)
        + (col >= jnp.int32(2 * nq)).astype(jnp.int32)
        + (col >= jnp.int32(3 * nq)).astype(jnp.int32)
    )
    snv = col < jnp.int32(4 * nq)
    sentinel = jnp.int32(bins_t + 1)
    scol_all = jnp.where(
        snv,
        jnp.int32(ncnt) + al * jnp.int32(2) + (B >> jnp.int32(7)),
        sentinel,
    )
    ccol_all = jnp.where(col < jnp.int32(ncnt), col, sentinel)
    rows = lax.broadcasted_iota(jnp.int32, (bins_t, T), 0)
    acc = jnp.zeros((bins_t, T), jnp.int32)
    group = jnp.zeros((bins_t, T), jnp.int32)
    for o in range(Lp):
        cvec = lax.slice(ccol_all, (o, H - o), (o + 1, H - o + T))
        svec = lax.slice(scol_all, (o, H - o), (o + 1, H - o + T))
        group = (
            group
            + (rows == cvec).astype(jnp.int32)
            + (rows == svec).astype(jnp.int32)
        )
        if (o & 7) == 7 or o == Lp - 1:
            acc = acc + group
            group = jnp.zeros((bins_t, T), jnp.int32)
    at = acc.T  # (T, bins_t)
    out_ref[:, :ncnt] = at[:, :ncnt]
    out_ref[:, ncnt:STRAND_COL0] = jnp.zeros(
        (T, STRAND_COL0 - ncnt), jnp.int32
    )
    out_ref[:, STRAND_COL0:] = at[:, ncnt : ncnt + 8]


def _shear_hist_xla(stage_t, w0s, *, window, nq, lanes):
    """Pure-XLA reference/CPU implementation of the shear histogram (same
    semantics as the Pallas kernel, used off-TPU where Mosaic is absent)."""
    import jax.lax as lax

    col_n, col_low, ncnt = col_layout(nq)
    bins_t = -(-(ncnt + 8) // 8) * 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (bins_t, window), 0)
    acc = jnp.zeros((bins_t, window), jnp.int32)
    for o in range(lanes):
        v = lax.dynamic_slice(
            stage_t,
            (jnp.int32(o), jnp.asarray(w0s, jnp.int32) - jnp.int32(o)),
            (1, window),
        )[0].astype(jnp.int32)
        col = v & 127
        al = (col >= nq).astype(jnp.int32) + (col >= 2 * nq) + (col >= 3 * nq)
        snv = col < 4 * nq
        scol = jnp.where(snv, ncnt + al * 2 + (v >> 7), bins_t + 1)
        ccol = jnp.where(col < ncnt, col, bins_t + 1)
        acc = acc + (rows == ccol[None, :]) + (rows == scol[None, :])
    at = acc.T
    out = jnp.zeros((window, 128), jnp.int32)
    out = out.at[:, :ncnt].set(at[:, :ncnt])
    out = out.at[:, STRAND_COL0:].set(at[:, ncnt : ncnt + 8])
    return out


def shear_hist(stage_t, w0s, *, window, nq, lanes):
    """Combined (window, 128) count tensor: cols [0, 4*nq+2) are
    allele-by-quality-bin counts (+N +low), cols 120..127 strand counts.
    Plain wrapper so the deep Pallas trace runs under _deep_trace."""
    with _deep_trace():
        return _shear_hist_jit(
            stage_t, w0s, window=window, nq=nq, lanes=lanes
        )


@partial(jax.jit, static_argnames=("window", "nq", "lanes"))
def _shear_hist_jit(
    stage_t: jnp.ndarray,  # (Lp, S) uint8 transposed stage, 0xFF where empty
    w0s: jnp.ndarray,  # scalar int32: stage col of the window's position 0
    *,
    window: int,
    nq: int,
    lanes: int,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if _interpret():
        return _shear_hist_xla(stage_t, w0s, window=window, nq=nq, lanes=lanes)
    T = min(2048, window)
    assert window % T == 0
    ncnt = 4 * nq + 2
    bins_t = -(-(ncnt + 8) // 8) * 8
    kernel = partial(
        _hist_kernel, T=T, Lp=lanes, nq=nq, bins_t=bins_t
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(window // T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            # the literal block index must be int32: under jax_enable_x64 a
            # bare Python 0 traces as int64, which Mosaic cannot legalize
            (T, 128), lambda i, s: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((lanes, T + _halo(lanes)), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((window, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.reshape(w0s, (1,)).astype(jnp.int32), stage_t)


MIN_BASE_QS_SP = 3  # CountsHelper.java:214-216 (mirrors genotyping.MIN_BASE_QS)


@partial(jax.jit, static_argnames=("lanes",))
def concat_reads(*parts, lanes: int):
    """Concatenate per-batch packed-read matrices, trimmed/padded to a
    common lane width (module-level jit: one compile per shape set)."""
    padded = []
    for p in parts:
        p = p[:, :lanes]
        if p.shape[1] < lanes:
            p = jnp.pad(p, ((0, 0), (0, lanes - p.shape[1])))
        padded.append(p)
    return jnp.concatenate(padded, axis=0)


@partial(jax.jit, static_argnames=("nq", "lanes"))
def build_colg(
    pq: jnp.ndarray,  # (R, >=lanes) uint8 packed code|qual<<3, READ orientation
    rev: jnp.ndarray,  # (R,) uint8 1 = reverse strand
    alo: jnp.ndarray,  # (R,) int32 valid genome-offset lane range [alo, ahi)
    ahi: jnp.ndarray,  # (R,) int32 (0,0 marks rows that never contribute)
    thresholds: jnp.ndarray,  # (nq,) int32 sorted distinct clamped qualities
    *,
    nq: int,
    lanes: int,
) -> jnp.ndarray:
    """Genome-oriented col bytes for every read row, all elementwise.

    Reverse reads are complemented and flipped with ONE static full-width
    reverse: lane a of the flipped row holds genome offset a - (lanes-len),
    which callers absorb into the adjusted start pred' = pred - (lanes-len)
    — no per-row dynamic shift (TPU minor-axis gathers are ~25x slower than
    the whole pileup budget).  Bounds are therefore expressed in flipped
    array space: fwd (cs, len-ce), rev (lanes-len+ce, lanes-cs)."""
    b = pq[:, :lanes]
    c = (b & 7).astype(jnp.int32)
    q = (b >> 3).astype(jnp.int32)
    rv = (rev > 0)[:, None]
    al = jnp.where(rv & (c < 4), 3 - c, c)
    qbin = jnp.zeros_like(q)
    for k in range(1, nq):
        qbin = qbin + (q >= thresholds[k])
    low = q <= MIN_BASE_QS_SP
    col_n, col_low, ncnt = col_layout(nq)
    col = jnp.where(low, col_low, jnp.where(c < 4, al * nq + qbin, col_n))
    byte = col.astype(jnp.uint8) | (rev[:, None] << 7)
    byte = jnp.where(rv, byte[:, ::-1], byte)
    a = jnp.arange(lanes, dtype=jnp.int32)[None, :]
    ok = (a >= alo[:, None]) & (a < ahi[:, None])
    return jnp.where(ok, byte, jnp.uint8(255))


@partial(jax.jit, static_argnames=("s_cols",))
def build_stage(
    colg: jnp.ndarray,  # (R, Lp) uint8 col bytes
    rows: jnp.ndarray,  # (Rb,) int32 rank-0 row indices (pad lanes -> row 0)
    pos: jnp.ndarray,  # (Rb,) int32 stage row = pred' - chunk0 + Lp
    # (pad lanes -> s_cols-1, a trash row past every readable column)
    *,
    s_cols: int,
) -> jnp.ndarray:
    """Position-indexed stage, transposed to (Lp, s_cols) so the shear
    kernel's slices are lane-contiguous.  Row-granular scatter: cost scales
    with the number of reads, not genome length."""
    stage = jnp.full((s_cols, colg.shape[1]), 255, jnp.uint8)
    stage = stage.at[pos].set(jnp.take(colg, rows, axis=0))
    return stage.T


def hist_residual_scatter(
    hist: jnp.ndarray,  # (W, 128) combined counts
    colg_rows: jnp.ndarray,  # (R, Lp) uint8 residual reads, genome-oriented
    pred_rel: jnp.ndarray,  # (R,) int32 start relative to window (may be <0)
    valid: jnp.ndarray,  # (R,) bool
    nq: int,
) -> jnp.ndarray:
    """Rank>=1 reads (same predicted start as an earlier read): bounded
    scatter onto the combined tensor.  R is a small fixed bucket, so the
    serialized scatter lanes stay negligible."""
    W = hist.shape[0]
    col_n, col_low, ncnt = col_layout(nq)
    v = colg_rows.astype(jnp.int32)
    col = v & 127
    o = jnp.arange(colg_rows.shape[1], dtype=jnp.int32)[None, :]
    pos = pred_rel[:, None] + o
    ok = valid[:, None] & (col != COL_INVALID) & (pos >= 0) & (pos < W)
    pos = jnp.where(ok, pos, 0)
    al = (col >= nq).astype(jnp.int32) + (col >= 2 * nq) + (col >= 3 * nq)
    snv = ok & (col < 4 * nq)
    ccol = jnp.where(col < ncnt, col, 0)
    hist = hist.at[pos, ccol].add(ok.astype(jnp.int32))
    scol = STRAND_COL0 + al * 2 + (v >> 7)
    hist = hist.at[pos, jnp.where(snv, scol, 0)].add(snv.astype(jnp.int32))
    return hist


def hist_packed_scatter(
    hist: jnp.ndarray,  # (W, 128) combined counts
    packed: jnp.ndarray,  # (N,) int32 packed host calls (-1 = skip):
    # bits 0-19 pos, 20-24 qual (clamped 0..30), 25-27 allele, 28 strand
    qual_bin: jnp.ndarray,  # (31,) int32 quality -> bin map
    nq: int,
    min_base_q: int,
) -> jnp.ndarray:
    """Host-path allele calls onto the combined tensor (same packing as
    genotyping._span_packed_scatter, columns remapped to the binned layout)."""
    col_n, col_low, ncnt = col_layout(nq)
    ok = packed >= 0
    rel = packed & 0xFFFFF
    q = (packed >> 20) & 31
    al = (packed >> 25) & 7
    st = (packed >> 28) & 1
    low = q <= min_base_q
    qb = jnp.take(qual_bin, jnp.clip(q, 0, 30))
    pos = jnp.where(ok, rel, 0)
    col = jnp.where(low, col_low, jnp.where(al < 4, al * nq + qb, col_n))
    hist = hist.at[pos, col].add(ok.astype(jnp.int32))
    snv = ok & ~low & (al < 4)
    scol = STRAND_COL0 + jnp.minimum(al, 3) * 2 + st
    hist = hist.at[pos, jnp.where(snv, scol, 0)].add(snv.astype(jnp.int32))
    return hist

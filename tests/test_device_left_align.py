"""Device-side RLE left-align (kernels/pairwise._left_align_rle) must match
the host left_align_indels pass on DP output from random gapped reads."""
import numpy as np

from ngsepcore_tpu.align.read_alignment import left_align_indels
from ngsepcore_tpu.kernels.pairwise import (
    OP_DEL,
    OP_INS,
    OP_MATCH,
    RLE_MAX,
    affine_gap_align_batch,
    dp_stats_pack,
)

MID = "MID"


def _decode_rle(row, nr):
    runs = []
    for u in range(nr):
        v = int(row[u])
        ln = v >> 2
        if ln == 0:
            continue
        op = MID[(v & 3) - 1]
        if runs and runs[-1][1] == op:
            runs[-1] = (runs[-1][0] + ln, op)
        else:
            runs.append((ln, op))
    return runs


def _raw_runs(ops_row, n_ops):
    o = np.asarray(ops_row)[:n_ops]
    if not len(o):
        return []
    b = np.flatnonzero(o[1:] != o[:-1]) + 1
    bounds = np.concatenate([[0], b, [len(o)]])
    return [
        (int(bounds[t + 1] - bounds[t]), MID[int(o[bounds[t]]) - 1])
        for t in range(len(bounds) - 1)
    ]


def _simulate(rng, n, Lq=64, Ls=96):
    """Reads = mutated windows of a low-entropy subject (homopolymer-rich
    so indels shift), subject = the window."""
    qc = np.full((n, Lq), 4, np.int8)
    sc = np.full((n, Ls), 4, np.int8)
    ql = np.zeros(n, np.int32)
    sl = np.zeros(n, np.int32)
    for i in range(n):
        slen = int(rng.integers(70, Ls))
        # low-entropy: runs of repeated symbols
        s = []
        while len(s) < slen:
            s.extend([int(rng.integers(0, 4))] * int(rng.integers(1, 6)))
        s = np.array(s[:slen], np.int8)
        off = int(rng.integers(0, 8))
        read = list(s[off : off + 52])
        # inject 0-3 indels + some substitutions
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(1, max(2, len(read) - 2)))
            ln = int(rng.integers(1, 5))
            if rng.random() < 0.5:
                read[p:p] = [int(rng.integers(0, 4))] * ln  # insertion
            else:
                del read[p : p + ln]
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, len(read)))
            read[p] = int(rng.integers(0, 4))
        read = read[:Lq]
        qc[i, : len(read)] = read
        ql[i] = len(read)
        sc[i, :slen] = s
        sl[i] = slen
    return qc, ql, sc, sl


def test_device_left_align_matches_host():
    rng = np.random.default_rng(5)
    qc, ql, sc, sl = _simulate(rng, 256)
    out = affine_gap_align_batch(qc, ql, sc, sl, free_start2=True, free_end2=True)
    stats = dp_stats_pack(
        out["ops"], out["n_ops"], out["start_j"], out["score"], qc, sc
    )
    rle = np.asarray(stats["rle"])
    n_runs = np.asarray(stats["n_runs"])
    has_gap = np.asarray(stats["has_gap"]).astype(bool)
    fb = np.asarray(stats["la_fallback"]).astype(bool)
    start_j = np.asarray(stats["start_j"])
    ops = np.asarray(out["ops"])
    n_ops = np.asarray(out["n_ops"])
    checked = 0
    for i in range(len(ql)):
        if not has_gap[i] or n_runs[i] > RLE_MAX:
            continue
        raw = _raw_runs(ops[i], int(n_ops[i]))
        want = left_align_indels(
            [list(r) for r in raw], qc[i, : ql[i]], sc[i], int(start_j[i])
        )
        got = _decode_rle(rle[i], int(n_runs[i]))
        if fb[i]:
            # fallback rows re-run the host pass in production; the device
            # RLE only needs to be a VALID (possibly unshifted) encoding
            assert sum(l for l, op in got if op != "D") == sum(
                l for l, op in want if op != "D"
            )
            continue
        assert got == want, (i, raw, got, want)
        checked += 1
    assert checked > 100  # the simulation must actually produce gapped rows


def test_device_left_align_fallback_rare():
    rng = np.random.default_rng(17)
    qc, ql, sc, sl = _simulate(rng, 256)
    out = affine_gap_align_batch(qc, ql, sc, sl, free_start2=True, free_end2=True)
    stats = dp_stats_pack(
        out["ops"], out["n_ops"], out["start_j"], out["score"], qc, sc
    )
    fb = np.asarray(stats["la_fallback"]).astype(bool)
    has_gap = np.asarray(stats["has_gap"]).astype(bool)
    ng = max(int(has_gap.sum()), 1)
    assert fb.sum() <= 0.05 * ng

"""Run-jump traceback parity: affine_gap_align_runs must reproduce the
legacy per-cell walk (affine_gap_align_batch) exactly — scores, cursors,
and the full op sequence — across every free-end configuration, plus the
saturation split (runs > 255) and the run-budget overflow flag."""
import numpy as np
import pytest

from ngsepcore_tpu.kernels.pairwise import (
    affine_gap_align_batch,
    affine_gap_align_runs,
    dp_stats_pack,
    dp_stats_runs,
)


def _expand(new, b):
    ops = []
    for t in range(int(new["n_runs"][b])):
        ops += [int(new["rop"][b, t])] * int(new["rlen"][b, t])
    return ops


def _noisy_pair(rng, B, Lq, Ls):
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    s = rng.integers(0, 4, (B, Ls)).astype(np.int8)
    for b in range(B):
        off = int(rng.integers(0, max(1, Ls - Lq - 5)))
        piece = list(q[b][: Lq - 6])
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(1, len(piece) - 1))
            if rng.random() < 0.5:
                piece.insert(p, int(rng.integers(0, 4)))
            else:
                del piece[p]
        piece = np.array(piece[: Ls - off], np.int8)
        s[b, off : off + len(piece)] = piece
    ql = rng.integers(Lq // 2, Lq + 1, B).astype(np.int32)
    sl = rng.integers(int(Ls * 0.7), Ls + 1, B).astype(np.int32)
    return q, ql, s, sl


@pytest.mark.parametrize(
    "cfg",
    [
        dict(free_start2=True, free_end2=True),
        dict(free_start2=False, free_end2=False),
        dict(free_start1=True, free_start2=False, free_end2=True),
        dict(free_start2=False, free_end1=True, free_end2=False),
    ],
)
def test_runs_match_legacy_ops(cfg):
    rng = np.random.default_rng(11)
    q, ql, s, sl = _noisy_pair(rng, 32, 96, 160)
    old = {k: np.asarray(v) for k, v in affine_gap_align_batch(q, ql, s, sl, **cfg).items()}
    new = {k: np.asarray(v) for k, v in affine_gap_align_runs(q, ql, s, sl, **cfg).items()}
    for k in ("score", "start_j", "end_j", "end_i", "n_ops"):
        assert np.array_equal(old[k], new[k]), k
    assert new["walk_ok"].all()
    for b in range(q.shape[0]):
        assert _expand(new, b) == list(old["ops"][b][: old["n_ops"][b]]), b


def test_saturated_run_split_merges():
    """A perfect 384bp match saturates the 8-bit run counter; the jump
    splits it into 254+130 and the merge pass re-joins them."""
    rng = np.random.default_rng(3)
    B, Lq, Ls = 4, 384, 512
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    s = np.full((B, Ls), 4, np.int8)
    for b in range(B):
        s[b, 30 : 30 + Lq] = q[b]
    ql = np.full(B, Lq, np.int32)
    sl = np.full(B, Ls, np.int32)
    new = {
        k: np.asarray(v)
        for k, v in affine_gap_align_runs(
            q, ql, s, sl, free_start2=True, free_end2=True
        ).items()
    }
    assert new["walk_ok"].all()
    assert (new["n_runs"] == 1).all()
    assert (new["rlen"][:, 0] == Lq).all()
    assert (new["score"] == Lq).all()


def test_stats_parity_with_legacy():
    rng = np.random.default_rng(5)
    q, ql, s, sl = _noisy_pair(rng, 32, 96, 160)
    old = affine_gap_align_batch(q, ql, s, sl, free_start2=True, free_end2=True)
    so = {
        k: np.asarray(v)
        for k, v in dp_stats_pack(
            old["ops"], old["n_ops"], old["start_j"], old["score"], q, s
        ).items()
    }
    new = affine_gap_align_runs(q, ql, s, sl, free_start2=True, free_end2=True)
    sn = {k: np.asarray(v) for k, v in dp_stats_runs(new, q, s).items()}
    for k in ("mism", "has_gap", "n_runs", "n_ops", "start_j", "la_fallback"):
        assert np.array_equal(so[k], sn[k]), k
    R_old = so["rle"].shape[1]
    assert np.array_equal(so["rle"], sn["rle"][:, :R_old])


def test_walk_budget_overflow_flags_row():
    """With a tiny run budget the walk cannot terminate; the row must come
    back walk_ok=False and dp_stats_runs must assign it a huge mismatch
    count so the accept test rejects it."""
    rng = np.random.default_rng(9)
    q, ql, s, sl = _noisy_pair(rng, 8, 96, 160)
    out = affine_gap_align_runs(
        q, ql, s, sl, free_start2=True, free_end2=True, walk_runs=2
    )
    ok = np.asarray(out["walk_ok"])
    assert not ok.all()
    stats = dp_stats_runs(out, q, s)
    mism = np.asarray(stats["mism"])
    assert (mism[~ok] >= 32000).all()

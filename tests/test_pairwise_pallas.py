"""Pallas wavefront Gotoh parity vs the XLA scan — interpret mode so the
check runs on the CPU test mesh; the compiled kernel runs the identical
trace on real TPUs (where affine_gap_align_runs auto-selects it)."""
import numpy as np
import pytest

from ngsepcore_tpu.kernels.pairwise import affine_gap_align_batch
from ngsepcore_tpu.kernels.pairwise_pallas import gotoh_forward_plane_pallas


def _noisy(rng, B, Lq, Ls):
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
    sl = rng.integers(int(Ls * 0.8), Ls + 1, B).astype(np.int32)
    return q, ql, s, sl


@pytest.mark.parametrize(
    "cfg",
    [
        dict(free_start2=True, free_end2=True),
        dict(free_start2=False, free_end2=False),
        dict(free_start2=True, free_end2=False),
    ],
)
def test_pallas_forward_matches_xla(cfg):
    rng = np.random.default_rng(13)
    q, ql, s, sl = _noisy(rng, 256, 48, 128)
    ref = affine_gap_align_batch(q, ql, s, sl, **cfg)
    plane, score, end_j, start_k = gotoh_forward_plane_pallas(
        q, ql, s, sl, interpret=True, **cfg
    )
    assert np.array_equal(np.asarray(score), np.asarray(ref["score"]))
    assert np.array_equal(np.asarray(end_j), np.asarray(ref["end_j"]))
    # full traceback through the shared run-jump walk: op sequences must
    # reproduce the legacy per-cell walk exactly
    from ngsepcore_tpu.kernels.pairwise import _runs_from_plane, _walk_runs_for
    import jax.numpy as jnp

    out = _runs_from_plane(
        jnp.asarray(plane), score, jnp.asarray(ql.astype(np.int32)),
        end_j, start_k, 256, _walk_runs_for(48), cfg["free_start2"], "all",
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    ok = out["walk_ok"]
    # short queries against much longer subjects in global mode can
    # exhaust the (Lq-scaled) run budget legitimately; terminated rows
    # must match the legacy walk exactly
    assert ok.mean() > 0.9
    assert np.array_equal(out["start_j"][ok], np.asarray(ref["start_j"])[ok])
    assert np.array_equal(out["n_ops"][ok], np.asarray(ref["n_ops"])[ok])
    ref_ops = np.asarray(ref["ops"])
    ref_nops = np.asarray(ref["n_ops"])
    for b in np.nonzero(ok)[0]:
        ops = []
        for t in range(int(out["n_runs"][b])):
            ops += [int(out["rop"][b, t])] * int(out["rlen"][b, t])
        assert ops == list(ref_ops[b][: ref_nops[b]]), b

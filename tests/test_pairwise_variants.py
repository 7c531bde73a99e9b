"""Simple-gap / static-banded / naive pairwise aligners vs a numpy mirror
of the reference DP (PairwiseAlignerSimpleGap.java:137-273,
PairwiseAlignerStaticBanded.java:49-160)."""
import numpy as np
import pytest

from ngsepcore_tpu.align.pairwise_aligners import (
    PairwiseAlignerNaive,
    PairwiseAlignerSimpleGap,
    PairwiseAlignerStaticBanded,
)

BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def _mirror_simple(s1, s2, match=1, mismatch=1, gap=2,
                   fs1=True, fs2=True, fe1=True, fe2=True, local=False):
    """Direct mirror of the reference's matrix fill + end-cell selection."""
    n1, n2 = len(s1), len(s2)
    S = np.zeros((n1 + 1, n2 + 1), np.int64)
    for i in range(1, n1 + 1):
        S[i][0] = -gap * i if fs1 else 0
    for j in range(1, n2 + 1):
        S[0][j] = -gap * j if fs2 else 0
    max_score = 0
    for i in range(1, n1 + 1):
        for j in range(1, n2 + 1):
            mm = match if s1[i - 1] == s2[j - 1] else -mismatch
            S[i][j] = max(S[i - 1][j - 1] + mm, S[i - 1][j] - gap, S[i][j - 1] - gap)
            if local:
                S[i][j] = max(S[i][j], 0)
            max_score = max(max_score, S[i][j])
    if local:
        return max_score
    val = S[n1][n2]
    if not fe1:
        val = max(val, S[: n1 + 1, n2].max())
    elif not fe2:
        val = max(val, S[n1, : n2 + 1].max())
    return val


@pytest.mark.parametrize("flags", [
    dict(),
    dict(fe2=False),
    dict(fe1=False),
    dict(fs1=False),
    dict(fs2=False),
    dict(fs2=False, fe2=False),
])
def test_simple_gap_scores_match_mirror(flags):
    rng = np.random.default_rng(3)
    for trial in range(6):
        s1 = _rand_seq(rng, int(rng.integers(5, 40)))
        s2 = _rand_seq(rng, int(rng.integers(5, 40)))
        al = PairwiseAlignerSimpleGap()
        al.force_start1 = flags.get("fs1", True)
        al.force_start2 = flags.get("fs2", True)
        al.force_end1 = flags.get("fe1", True)
        al.force_end2 = flags.get("fe2", True)
        a1, a2 = al.calculate_alignment(s1, s2)
        want = _mirror_simple(s1, s2, **flags)
        assert al.max_score == want, (s1, s2, flags)
        # alignment well-formed: strips back to the inputs
        assert a1.replace("-", "") == s1
        assert a2.replace("-", "") == s2
        assert len(a1) == len(a2)


def test_simple_gap_local():
    rng = np.random.default_rng(5)
    for trial in range(8):
        s1 = _rand_seq(rng, int(rng.integers(8, 50)))
        s2 = _rand_seq(rng, int(rng.integers(8, 50)))
        al = PairwiseAlignerSimpleGap()
        al.set_local(True)
        a1, a2 = al.calculate_alignment(s1, s2)
        want = _mirror_simple(s1, s2, fs1=False, fs2=False,
                              fe1=False, fe2=False, local=True)
        assert al.max_score == want
        # local alignment is a contiguous segment pair scoring max_score
        assert len(a1) == len(a2)
        sc = sum(
            (1 if c1 == c2 else -1) if (c1 != "-" and c2 != "-") else -2
            for c1, c2 in zip(a1, a2)
        )
        assert sc == want
        assert a1.replace("-", "") in s1
        assert a2.replace("-", "") in s2


def test_simple_gap_exact_known():
    al = PairwiseAlignerSimpleGap()
    a1, a2 = al.calculate_alignment("ACGT", "ACGT")
    assert (a1, a2) == ("ACGT", "ACGT") and al.max_score == 4
    a1, a2 = al.calculate_alignment("ACGT", "AGT")
    assert al.max_score == 1  # 3 matches - 2 gap
    assert a1.replace("-", "") == "ACGT" and a2.replace("-", "") == "AGT"


def _mirror_banded(s1, s2, k, match=1, mismatch=1, indel=2):
    n1, n2 = len(s1), len(s2)
    INF = -(10 ** 9)
    S = np.full((n1 + 1, n2 + 1), INF, np.int64)
    S[0][0] = 0
    for i in range(n1 + 1):
        for j in range(max(0, i - k), min(i + k, n2) + 1):
            if i == 0 and j == 0:
                continue
            best = INF
            if i > 0 and j > 0 and S[i - 1][j - 1] > INF:
                mm = match if s1[i - 1] == s2[j - 1] else -mismatch
                best = max(best, S[i - 1][j - 1] + mm)
            if i > 0 and abs(j - (i - 1)) <= k and S[i - 1][j] > INF:
                best = max(best, S[i - 1][j] - indel)
            if j > 0 and abs((j - 1) - i) <= k and S[i][j - 1] > INF:
                best = max(best, S[i][j - 1] - indel)
            S[i][j] = best
    return S[n1][n2]


@pytest.mark.parametrize("k", [2, 3, 6])
def test_banded_scores_match_mirror(k):
    rng = np.random.default_rng(11)
    for trial in range(6):
        n1 = int(rng.integers(10, 50))
        n2 = n1 + int(rng.integers(-k, k + 1))
        s1 = _rand_seq(rng, n1)
        # mutate a copy so the band path is interesting
        s2 = list(_rand_seq(rng, n2)) if trial % 2 == 0 else list(s1[:n2])
        if trial % 2:
            for _ in range(3):
                p = int(rng.integers(0, len(s2)))
                s2[p] = BASES[int(rng.integers(0, 4))]
        s2 = "".join(s2)
        al = PairwiseAlignerStaticBanded(k=k)
        a1, a2 = al.calculate_alignment(s1, s2)
        assert al.max_score == _mirror_banded(s1, s2, k)
        assert a1.replace("-", "") == s1
        assert a2.replace("-", "") == s2
        # the gapped alignment's plain score equals the reported max
        sc = sum(
            (1 if c1 == c2 else -1) if (c1 != "-" and c2 != "-") else -2
            for c1, c2 in zip(a1, a2)
        )
        assert sc == al.max_score


def test_banded_k_check():
    al = PairwiseAlignerStaticBanded(k=2)
    with pytest.raises(ValueError):
        al.calculate_alignment("ACGTACGT", "ACG")


def test_banded_equals_full_nw_when_band_covers():
    rng = np.random.default_rng(17)
    s1 = _rand_seq(rng, 20)
    s2 = _rand_seq(rng, 18)
    al = PairwiseAlignerStaticBanded(k=25)
    al.get_max_score(s1, s2)
    want = _mirror_simple(s1, s2)  # full global NW, same costs
    assert al.max_score == want


def test_naive():
    al = PairwiseAlignerNaive(gaps_left=True)
    assert al.calculate_alignment("ACGT", "AC") == ("ACGT", "--AC")
    al = PairwiseAlignerNaive(gaps_left=False)
    assert al.calculate_alignment("AC", "ACGT") == ("AC--", "ACGT")

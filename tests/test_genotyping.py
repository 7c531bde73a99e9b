import numpy as np

from ngsepcore_tpu.kernels.genotyping import (
    HET_RATE_DIPLOID,
    decide_genotypes_discovery,
    genotype_posteriors,
    scatter_allele_counts,
    snv_contribution_table,
)
from tests.reference_counts_helper import CountsHelperMirror

BASES = "ACGT"


def _run_kernel(calls_per_pos, het_rate=HET_RATE_DIPLOID):
    """calls_per_pos: list over positions of list[(allele_idx, qual)]."""
    P = len(calls_per_pos)
    pos, al, q, st = [], [], [], []
    for p, calls in enumerate(calls_per_pos):
        for a, qq in calls:
            pos.append(p)
            al.append(a)
            q.append(qq)
            st.append(0)
    counts, strand_counts, low_qual, total = scatter_allele_counts(
        np.array(pos, np.int32),
        np.array(al, np.int8),
        np.array(q, np.int8),
        np.array(st, np.int8),
        out_size=P,
    )
    C = snv_contribution_table(4, 0.5)
    post, logcond = genotype_posteriors(counts, C, het_rate)
    return np.asarray(post), np.asarray(logcond), np.asarray(total), np.asarray(low_qual)


def test_logcond_matches_counts_helper_mirror():
    rng = np.random.default_rng(4)
    cases = []
    for _ in range(20):
        n_calls = int(rng.integers(1, 40))
        calls = [
            (int(rng.integers(0, 4)), int(rng.integers(2, 41))) for _ in range(n_calls)
        ]
        cases.append(calls)
    post, logcond, total, low_qual = _run_kernel(cases)
    for p, calls in enumerate(cases):
        mirror = CountsHelperMirror(list(BASES))
        for a, q in calls:
            mirror.update(BASES[a], q)
        assert np.allclose(logcond[p], mirror.log_cond, atol=1e-9), f"case {p}"
        assert np.allclose(post[p], mirror.posteriors(HET_RATE_DIPLOID), atol=1e-12)
        assert total[p] == mirror.total
        assert low_qual[p] == mirror.low_qual


def test_homozygous_alt_call():
    # 20 clean C reads at ref A
    calls = [[(1, 30)] * 20]
    post, logcond, _, _ = _run_kernel(calls)
    bi, bj, best, gq, ref_prob = decide_genotypes_discovery(post, np.array([0]))
    assert bi[0] == 1 and bj[0] == 1
    assert gq[0] > 50
    assert ref_prob[0] < 1e-10


def test_heterozygous_call():
    calls = [[(0, 30)] * 10 + [(2, 30)] * 10]
    post, _, _, _ = _run_kernel(calls)
    bi, bj, best, gq, _ = decide_genotypes_discovery(post, np.array([0]))
    assert (bi[0], bj[0]) == (0, 2)
    assert gq[0] > 30


def test_homoref_is_default():
    calls = [[(3, 30)] * 15]
    post, _, _, _ = _run_kernel(calls)
    bi, bj, best, gq, _ = decide_genotypes_discovery(post, np.array([3]))
    assert bi[0] == 3 and bj[0] == 3


def test_low_quality_calls_excluded():
    # quality 3 and below must not affect likelihoods (ref :214-216)
    calls = [[(1, 3)] * 50 + [(0, 30)] * 5]
    post, _, total, low_qual = _run_kernel(calls)
    bi, bj, _, _, _ = decide_genotypes_discovery(post, np.array([0]))
    assert bi[0] == 0 and bj[0] == 0
    assert total[0] == 55 and low_qual[0] == 50


def test_quality_clamped_at_30():
    a = _run_kernel([[(1, 30)] * 8])
    b = _run_kernel([[(1, 60)] * 8])
    assert np.allclose(a[1][0], b[1][0])


def test_window_genotype_snv_compaction():
    """The fused kernel's on-device site selection must flag exactly the
    decided non-homoref sites above the quality threshold."""
    import numpy as np
    from ngsepcore_tpu.kernels.genotyping import window_genotype_snv

    W = 1024
    # position 10: hom alt (20x C on ref A); position 50: het (10 A + 10 G on ref A);
    # position 100: homoref (20x T on ref T) -> not flagged
    pos, al, q, st = [], [], [], []
    for p, a, cnt in [(10, 1, 20), (50, 0, 10), (50, 2, 10), (100, 3, 20)]:
        pos += [p] * cnt
        al += [a] * cnt
        q += [30] * cnt
        st += [0] * cnt
    cap = 1024
    n = len(pos)
    rel = np.full(cap, -1, np.int32); rel[:n] = pos
    alleles = np.full(cap, -1, np.int8); alleles[:n] = al
    quals = np.zeros(cap, np.int8); quals[:n] = q
    strands = np.zeros(cap, np.int8)
    ref = np.zeros(W, np.int8)
    ref[100] = 3
    from ngsepcore_tpu.kernels.genotyping import snv_contribution_table

    res = window_genotype_snv(
        rel, alleles, quals, strands, ref, snv_contribution_table(4, 0.5),
        np.float64(0.001), np.int32(40), out_size=W,
    )
    k = int(res["n_sites"])
    sites = sorted(int(x) for x in np.asarray(res["site_idx"][:k]))
    assert sites == [10, 50]
    i10 = list(np.asarray(res["site_idx"][:k])).index(10)
    i50 = list(np.asarray(res["site_idx"][:k])).index(50)
    assert (int(res["bi"][i10]), int(res["bj"][i10])) == (1, 1)
    assert (int(res["bi"][i50]), int(res["bj"][i50])) == (0, 2)
    assert int(res["total"][i10]) == 20

import io

import numpy as np
import pytest

from ngsepcore_tpu.align.read_alignment import ReadAlignment
from ngsepcore_tpu.benchmark.gold_standard import VCFGoldStandardComparator
from ngsepcore_tpu.haplotyping.sih import (
    RefhapSIHAlgorithm,
    SingleIndividualHaplotyper,
    build_fragment_matrix,
)
from ngsepcore_tpu.variants.model import CalledGenomicVariant
from ngsepcore_tpu.vcf.io import VCFRecord


def _rec(pos, alleles, idxs, gq=60, seq="chr1"):
    c = CalledGenomicVariant(
        sequence_name=seq, first=pos, alleles=list(alleles),
        indexes_called_alleles=list(idxs), genotype_quality=gq, sample_id="s",
    )
    return VCFRecord(variant=c, calls=[c])


# ---- gold standard comparator --------------------------------------------

def test_gold_standard_comparator():
    gold = [
        _rec(10, "AC", [0, 1]),
        _rec(20, "AG", [1, 1]),
        _rec(30, "AT", [0, 1]),
    ]
    test = [
        _rec(10, "AC", [0, 1], gq=80),   # TP het
        _rec(20, "AG", [0, 1], gq=70),   # genotype error (het vs hom)
        _rec(40, "AC", [1, 1], gq=90),   # FP
    ]
    comp = VCFGoldStandardComparator()
    c = comp.compare(gold, test)
    s = c.stats_at(0)
    assert s["tp"] == 1
    assert s["fp"] == 2  # genotype error at 20 + unmatched call at 40
    assert s["fn"] == 1  # gold site 30 never called
    assert c.genotype_errors == 1


def test_gold_standard_quality_binning():
    gold = [_rec(10, "AC", [0, 1])]
    test = [_rec(10, "AC", [0, 1], gq=30)]
    comp = VCFGoldStandardComparator()
    comp.compare(gold, test)
    assert comp.counts.stats_at(0)["tp"] == 1
    s40 = comp.counts.stats_at(40)
    assert s40["tp"] == 0 and s40["fn"] == 1  # low-quality TP becomes FN
    buf = io.StringIO()
    comp.print_report(buf)
    assert "MinGQ" in buf.getvalue()


# ---- haplotyping -----------------------------------------------------------

def _simulate_fragments(hap, n_frags, span, error_rate, rng):
    V = len(hap)
    frags = np.full((n_frags, V), -1, np.int8)
    for i in range(n_frags):
        s = int(rng.integers(0, max(1, V - span)))
        side = rng.random() < 0.5
        h = hap if not side else 1 - hap
        calls = h[s : s + span].copy()
        errs = rng.random(len(calls)) < error_rate
        calls = np.where(errs, 1 - calls, calls)
        frags[i, s : s + len(calls)] = calls
    return frags


def test_refhap_recovers_haplotype():
    rng = np.random.default_rng(42)
    hap = rng.integers(0, 2, size=40).astype(np.int8)
    frags = _simulate_fragments(hap, 200, 6, 0.02, rng)
    algo = RefhapSIHAlgorithm(seed=3)
    phased, mec = algo.phase(frags)
    agree = np.mean(phased == hap)
    assert agree > 0.95 or agree < 0.05  # phase or its complement
    assert mec < 0.05 * (frags >= 0).sum()


def test_sih_end_to_end_blocks():
    # 4 het SNVs at 100,200,300,400; reads covering pairs
    records = [_rec(p, "AC", [0, 1]) for p in (100, 200, 300, 400)]
    hap = [0, 1, 1, 0]  # haplotype0 alleles (0=A, 1=C)
    alns = []
    positions = [100, 200, 300, 400]
    for i in range(60):
        vi = i % 3  # covers variants vi, vi+1
        side = (i // 3) % 2
        first = positions[vi]
        span = positions[vi + 1] - first + 1
        chars = []
        for p in range(first, first + span):
            if p in positions:
                j = positions.index(p)
                a = hap[j] if side == 0 else 1 - hap[j]
                chars.append("AC"[a])
            else:
                chars.append("G")
        alns.append(
            ReadAlignment(
                "chr1", first, [(span, "M")], read_chars="".join(chars),
                read_name=f"f{i}",
            )
        )
    sih = SingleIndividualHaplotyper()
    blocks = sih.phase(records, alns)
    assert len(blocks) == 1
    b = blocks[0]
    assert sorted(b.var_indices) == [0, 1, 2, 3]
    h = list(b.haplotype)
    assert h == hap or h == [1 - x for x in hap]
    assert b.mec == 0
    assert all(r.calls[0].phased for r in records)


def test_all_sih_algorithms_phase_correctly():
    """Every registered algorithm recovers the planted phase on clean data."""
    import numpy as np
    from ngsepcore_tpu.haplotyping.sih import SIH_ALGORITHMS

    rng = np.random.default_rng(9)
    V, F = 20, 60
    truth = rng.integers(0, 2, size=V).astype(np.int8)
    frags = np.full((F, V), -1, np.int8)
    for i in range(F):
        a = rng.integers(0, V - 4)
        b = a + rng.integers(3, 8)
        side = rng.integers(0, 2)
        row = truth[a:min(b, V)] if side == 0 else 1 - truth[a:min(b, V)]
        frags[i, a:min(b, V)] = row
    # sprinkle 2% errors
    noise = rng.random((F, V)) < 0.02
    frags = np.where((frags >= 0) & noise, 1 - frags, frags)
    for name, cls in SIH_ALGORITHMS.items():
        hap, mec = cls().phase(frags)
        match = max((hap == truth).mean(), (hap == 1 - truth).mean())
        assert match >= 0.9, f"{name}: phase accuracy {match}"
        assert mec < 0.1 * (frags >= 0).sum(), f"{name}: mec {mec}"


# ---- max-cut construction + MEC comparison (VERDICT r1 #9) ----------------

def _simulated_fragments(V=40, F=120, cov_len=8, err=0.03, seed=5):
    """Planted two-haplotype fragment matrix + truth."""
    rng = np.random.default_rng(seed)
    truth = rng.integers(0, 2, V).astype(np.int8)
    frags = np.full((F, V), -1, np.int8)
    for i in range(F):
        start = int(rng.integers(0, V - cov_len))
        side = int(rng.integers(0, 2))
        row = truth[start : start + cov_len] if side == 0 else 1 - truth[
            start : start + cov_len
        ]
        noise = rng.random(cov_len) < err
        frags[i, start : start + cov_len] = np.where(noise, 1 - row, row)
    n_err = 0  # count planted errors for the MEC lower-bound check
    return frags, truth


def test_fragments_cut_builder_weights_and_cut():
    from ngsepcore_tpu.haplotyping.sih import FragmentsCutBuilder

    # two conflicting fragment families over 4 variants
    frags = np.array(
        [
            [0, 0, 0, 0],
            [0, 0, 0, -1],
            [1, 1, 1, 1],
            [-1, 1, 1, 1],
        ],
        np.int8,
    )
    b = FragmentsCutBuilder(frags)
    # hamming2: fragments 0,1 agree on 3 columns -> weight -3
    assert b.W[0, 1] == -3
    # fragments 0,2 disagree on all 4 -> +4
    assert b.W[0, 2] == 4
    cut = b.calculate_max_cut()
    # the cut separates the two families
    assert cut[0] == cut[1]
    assert cut[2] == cut[3]
    assert cut[0] != cut[2]


def test_mec_comparison_across_algorithms():
    """RefHap's real max-cut must reach planted-noise-level MEC; all
    algorithms phase the same matrix and report comparable MEC (ref test
    strategy: benchmark/ accuracy comparison tooling)."""
    from ngsepcore_tpu.haplotyping.sih import SIH_ALGORITHMS

    frags, truth = _simulated_fragments()
    covered = frags >= 0
    # MEC of the TRUTH haplotype = planted noise errors
    truth_mec = 0
    for i in range(len(frags)):
        row = frags[i]
        cov = covered[i]
        d_same = int(((row != truth) & cov).sum())
        d_flip = int(((row != (1 - truth)) & cov).sum())
        truth_mec += min(d_same, d_flip)
    mecs = {}
    for name, cls in SIH_ALGORITHMS.items():
        hap, mec = cls().phase(frags.copy())
        assert hap.shape == truth.shape
        mecs[name] = mec
    # RefHap (real max-cut) matches the planted noise closely
    assert mecs["Refhap"] <= truth_mec * 1.3 + 2, (mecs, truth_mec)
    # GenHap's GA lands in the same regime
    assert mecs["GenHap"] <= truth_mec * 2 + 4, (mecs, truth_mec)
    # every algorithm produces a finite, sane MEC
    total_calls = int(covered.sum())
    for name, mec in mecs.items():
        assert 0 <= mec <= total_calls // 2, (name, mec)

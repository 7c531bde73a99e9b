import numpy as np

from ngsepcore_tpu.variants.model import CalledGenomicVariant
from ngsepcore_tpu.vcf.io import VCFRecord
from ngsepcore_tpu.vcf.popgen import (
    allele_sharing_stats,
    introgression_analysis,
    ld_matrix,
    relative_allele_counts,
)


def _rec(pos, genotypes, samples=None):
    calls = []
    for i, g in enumerate(genotypes):
        idxs = [] if g is None else ([0, 0] if g == 0 else [0, 1] if g == 1 else [1, 1])
        calls.append(
            CalledGenomicVariant(
                sequence_name="chr1", first=pos, alleles=["A", "C"],
                sample_id=(samples[i] if samples else f"s{i}"),
                indexes_called_alleles=idxs, genotype_quality=60,
            )
        )
    return VCFRecord(variant=calls[0], calls=calls)


def test_ld_perfect_and_none():
    # sites 1&2 perfectly correlated; site 3 independent
    g1 = [0, 0, 2, 2, 0, 2, 0, 2]
    g2 = g1
    g3 = [0, 2, 2, 0, 0, 2, 2, 0]  # orthogonal to g1
    recs = [_rec(100, g1), _rec(200, g2), _rec(300, g3)]
    r2, positions = ld_matrix(recs)
    assert abs(r2[0, 1] - 1.0) < 1e-9
    assert r2[0, 2] < 0.2


def test_allele_sharing_groups():
    samples = ["a1", "a2", "b1", "b2"]
    groups = {"a1": "A", "a2": "A", "b1": "B", "b2": "B"}
    # group A all ref, group B all alt -> between >> within
    recs = [_rec(1000 * i, [0, 0, 2, 2], samples) for i in range(1, 11)]
    stats = allele_sharing_stats(recs, groups)
    assert stats
    s = stats[0]
    assert s["between"] > 0.9
    assert s["within_a"] < 0.1 and s["within_b"] < 0.1


def test_introgression_detects_migrant_window():
    samples = ["a1", "a2", "a3", "b1", "b2", "b3"]
    groups = {s: ("A" if s.startswith("a") else "B") for s in samples}
    recs = []
    # windows 1: a's ref, b's alt (diagnostic). a3 carries B alleles -> introgressed
    for i in range(1, 21):
        recs.append(_rec(i * 1000, [0, 0, 2, 2, 2, 2], samples))
    # the migrant pulls its own group AF toward B, so lower the diagnostic
    # threshold (group A AF = 1/3 with the migrant included)
    hits = introgression_analysis(recs, groups, window=100000, min_diff_af=0.6)
    names = {h["sample"] for h in hits}
    assert "a3" in names
    assert "a1" not in names and "b1" not in names


def test_relative_allele_counts():
    hist = relative_allele_counts([(10, 10), (15, 5), (20, 0), (9, 11)])
    assert hist[10] == 1  # (10,10) at 0.5
    assert hist[9] == 1   # (9,11) -> 0.45
    assert hist[5] == 1   # (15,5) -> 0.25
    assert hist[0] == 1   # (20,0) monomorphic

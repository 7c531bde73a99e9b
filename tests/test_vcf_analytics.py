import io

import numpy as np
import pytest

from ngsepcore_tpu.clustering.trees import neighbor_joining, upgma
from ngsepcore_tpu.variants.model import CalledGenomicVariant
from ngsepcore_tpu.vcf.analytics import (
    VCFFilter,
    VCFSummaryStatisticsCalculator,
    compare_vcfs,
    distance_matrix,
    dosage_matrix,
    load_distance_matrix,
    merge_vcfs,
    site_diversity,
    variant_density,
    write_distance_matrix,
)
from ngsepcore_tpu.vcf.io import VCFRecord


def _rec(pos, genotypes, alleles=("A", "C"), gq=60, seq="chr1", vtype="SNV", qual=100):
    calls = []
    for i, g in enumerate(genotypes):
        idxs = [] if g is None else ([0, 0] if g == 0 else [0, 1] if g == 1 else [1, 1])
        calls.append(
            CalledGenomicVariant(
                sequence_name=seq,
                first=pos,
                alleles=list(alleles),
                variant_type=vtype,
                quality=qual,
                sample_id=f"s{i}",
                indexes_called_alleles=idxs,
                genotype_quality=gq if g is not None else 0,
                total_read_depth=20,
            )
        )
    v = calls[0]
    return VCFRecord(variant=v, calls=calls)


def test_dosage_matrix():
    recs = [_rec(10, [0, 1, 2, None])]
    dos, samples = dosage_matrix(recs)
    assert list(dos[0]) == [0, 1, 2, -1]
    assert samples == ["s0", "s1", "s2", "s3"]


def test_site_diversity():
    d = site_diversity(_rec(10, [0, 1, 1, 2]))
    assert d.genotyped == 4
    assert abs(d.maf - 0.5) < 1e-12
    assert abs(d.observed_het - 0.5) < 1e-12
    assert abs(d.expected_het - 0.5) < 1e-12
    assert abs(d.f) < 1e-12


def test_filter_by_maf_and_quality():
    recs = [
        _rec(10, [0, 0, 0, 1]),   # maf 1/8
        _rec(20, [1, 1, 1, 1]),   # maf 0.5
        _rec(30, [0, 0, 0, 0], qual=5),  # low site quality
    ]
    f = VCFFilter(min_maf=0.2, min_quality=40)
    kept = f.apply(recs)
    assert [r.variant.first for r in kept] == [20]


def test_summary_stats():
    calc = VCFSummaryStatisticsCalculator()
    calc.process(_rec(10, [0, 1], alleles=("A", "G")))  # transition
    calc.process(_rec(20, [2, 2], alleles=("A", "T")))  # transversion
    buf = io.StringIO()
    calc.print_report(buf)
    text = buf.getvalue()
    assert "SNV\t2" in text
    assert "Ts/Tv\t1.0000" in text


def test_variant_density():
    recs = [_rec(10, [1]), _rec(99999, [1]), _rec(100001, [1])]
    dens = variant_density(recs, window=100000)
    assert dens == [("chr1", 1, 2), ("chr1", 100001, 1)]


def test_distance_matrix_and_trees():
    recs = [
        _rec(10, [0, 0, 2, 2]),
        _rec(20, [0, 0, 2, 2]),
        _rec(30, [0, 1, 1, 2]),
        _rec(40, [0, 0, 2, 2]),
    ]
    dist, samples = distance_matrix(recs)
    assert dist.shape == (4, 4)
    assert dist[0, 1] < dist[0, 2]  # s0,s1 similar; s0,s2 distant
    assert np.allclose(dist, dist.T)
    buf = io.StringIO()
    write_distance_matrix(dist, samples, buf)
    buf.seek(0)
    d2, names2 = load_distance_matrix(buf)
    assert np.allclose(d2, dist, atol=1e-6)
    nwk = neighbor_joining(dist, samples).to_newick()
    assert nwk.endswith(";") and all(s in nwk for s in samples)
    nwk2 = upgma(dist, samples).to_newick()
    assert all(s in nwk2 for s in samples)


def test_nj_recovers_clades():
    # two clear pairs: (a,b) and (c,d)
    dist = np.array(
        [
            [0.0, 0.1, 1.0, 1.0],
            [0.1, 0.0, 1.0, 1.0],
            [1.0, 1.0, 0.0, 0.1],
            [1.0, 1.0, 0.1, 0.0],
        ]
    )
    nwk = neighbor_joining(dist, ["a", "b", "c", "d"]).to_newick()
    assert ("a" in nwk.split("c")[0]) or ("(a" in nwk and "b" in nwk)
    # a and b must be siblings
    import re

    pair = re.findall(r"\(([a-d]):[\d.]+,([a-d]):[\d.]+\)", nwk)
    assert ("a", "b") in pair or ("b", "a") in pair or ("c", "d") in pair or ("d", "c") in pair


def test_compare_vcfs():
    a = [_rec(10, [0, 1]), _rec(20, [2, 2])]
    b = [_rec(10, [0, 1]), _rec(20, [2, 1]), _rec(30, [1, 1])]
    res = compare_vcfs(a, b)
    assert res.both_genotyped == 4
    assert res.concordant == 3
    assert res.only_second >= 1


def test_merge_vcfs():
    a = [_rec(10, [1]), _rec(20, [2])]
    b = [_rec(20, [0]), _rec(30, [1])]
    merged = merge_vcfs([a, b], ["sampleA", "sampleB"])
    assert [r.variant.first for r in merged] == [10, 20, 30]
    r10 = merged[0]
    assert len(r10.calls) == 2
    assert not r10.calls[0].is_undecided
    assert r10.calls[1].is_undecided

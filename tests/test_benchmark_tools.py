"""Benchmark-package long tail: family stats, SV comparison, builders."""
import io

import numpy as np

from ngsepcore_tpu.benchmark.quality_stats import (
    KmerBasedSwitchErrorsFinder,
    QualityStatisticsAlignmentSimulatedReads,
    QualityStatisticsInbredBiparentalFamilies,
    QualityStatisticsOutbredF1Families,
    VCFAddADGTField,
)
from ngsepcore_tpu.benchmark.sv_comparison import (
    AssembliesAlignedTranscriptStatistics,
    BiparentalHaploidGoldStandardBuilder,
    VCFDirectSVComparison,
)
from ngsepcore_tpu.variants.model import CalledGenomicVariant, TYPE_BIALLELIC_SNV
from ngsepcore_tpu.vcf.io import VCFRecord


def _call(gt, alleles=("A", "T")):
    c = CalledGenomicVariant(
        sequence_name="chr1", first=100, alleles=list(alleles),
        variant_type=TYPE_BIALLELIC_SNV, genotype_quality=60,
    )
    if gt is None:
        c.indexes_called_alleles = []
    elif gt == 0:
        c.indexes_called_alleles = [0]
    elif gt == 1:
        c.indexes_called_alleles = [0, 1]
    else:
        c.indexes_called_alleles = [1]
    return c


def _rec(genos, first=100):
    calls = [_call(g) for g in genos]
    v = CalledGenomicVariant(
        sequence_name="chr1", first=first, alleles=["A", "T"],
        variant_type=TYPE_BIALLELIC_SNV,
    )
    return VCFRecord(variant=v, calls=calls)


def test_inbred_family_stats():
    samples = ["P1", "P2", "F1", "F2", "F3", "F4"]
    # homozygous contrast site: parents 0 and 2, inbred progeny split 0/2
    recs = [_rec([0, 2, 0, 0, 2, 2]), _rec([0, 2, 0, 1, 2, 2], first=200)]
    q = QualityStatisticsInbredBiparentalFamilies()
    q.process(recs, samples, "P1", "P2")
    assert q.total_vars == 2
    # record 1: oh=0 -> homozygous-contrast category; record 2: oh=0.25 -> other
    assert q.vars_per_category[1] == 1
    assert q.vars_per_category[2] == 1
    assert q.progeny_errors[2] == 1  # the het F2 in record 2
    out = io.StringIO()
    q.print_statistics(out)
    assert "SUMMARY COUNTS" in out.getvalue()


def test_outbred_f1_consistency():
    samples = ["P1", "P2", "A", "B"]
    # parents 0x2 -> progeny must be het
    recs = [_rec([0, 2, 1, 1]), _rec([0, 2, 1, 0], first=300)]
    q = QualityStatisticsOutbredF1Families()
    q.process(recs, samples, "P1", "P2")
    assert q.total_datapoints == 4
    assert q.inconsistent_datapoints == 1


def test_tetraploid_f1_maf_dosage_histogram():
    from ngsepcore_tpu.benchmark.quality_stats import (
        QualityStatisticsTetraploidF1Families,
    )

    # 4 samples: hom-major, het, het, hom-minor -> MAF = 4/8 = 0.5
    recs = [_rec([0, 1, 1, 2])]
    q = QualityStatisticsTetraploidF1Families()
    q.process(recs)
    row = q.counts_minor_allele_dosage[50]
    # diploid-derived dosages: hom major -> 0, het -> 2, hom minor -> 4
    assert row[0] == 1 and row[2] == 2 and row[4] == 1
    out = io.StringIO()
    q.print_statistics(out)
    assert out.getvalue().startswith("MAF\tHomozygous major")


def test_readblock_concat_differing_default_quality():
    from ngsepcore_tpu.core.sequences import ReadBlock

    a = ReadBlock(
        np.zeros((2, 4), np.int8), np.array([4, 3], np.int32),
        default_quality=40,
    )
    b = ReadBlock(
        np.ones((1, 4), np.int8), np.array([4], np.int32),
        default_quality=20,
    )
    merged = ReadBlock.concatenate([a, b])
    assert merged.quals is not None
    assert merged[0].qualities == chr(33 + 40) * 4
    assert merged[1].qualities == chr(33 + 40) * 3
    assert merged[2].qualities == chr(33 + 20) * 4


def test_alignment_simulated_stats():
    from ngsepcore_tpu.align.read_alignment import ReadAlignment, cigar_from_string

    alns = [
        ReadAlignment("chr1", 500, cigar_from_string("100M"),
                      read_name="chr1_500_599_0", read_chars="A"*100,
                      alignment_quality=60),
        ReadAlignment("chr1", 777, cigar_from_string("100M"),
                      read_name="chr1_500_599_1", read_chars="A"*100,
                      alignment_quality=60),
    ]
    q = QualityStatisticsAlignmentSimulatedReads(min_alignment_quality=20)
    q.process(alns)
    s = q.stats()
    assert s["aligned"] == 2 and s["correct"] == 1


def test_switch_errors():
    f = KmerBasedSwitchErrorsFinder()
    inferred = np.array([0, 1, 1, 0, 0])
    truth = np.array([0, 1, 0, 1, 1])  # switch after site 1, none after
    sw, comps = f.count_switch_errors(inferred, truth)
    assert comps == 4 and sw == 1


def test_sv_direct_comparison():
    from ngsepcore_tpu.variants.model import TYPE_CNV

    def sv(first, last, t="DEL"):
        return CalledGenomicVariant(
            sequence_name="chr1", first=first, alleles=["N"], variant_type=t,
            last_=last,
        )
    gold = [sv(1000, 2000), sv(5000, 6000), sv(9000, 9500, "INV")]
    test = [sv(1100, 2100), sv(7000, 7500)]
    stats = VCFDirectSVComparison().compare(gold, test)
    assert stats.true_positives == 1
    assert stats.false_positives == 1
    assert stats.false_negatives == 2
    assert 0 < stats.sensitivity < 1


def test_biparental_gold_standard():
    r1 = _rec([2])  # parent1 homo alt
    r2 = _rec([0])  # parent2 homo ref
    b = BiparentalHaploidGoldStandardBuilder()
    truth = b.build([r1], [r2])
    assert len(truth) == 1
    seq, pos, ref, alleles = truth[0]
    assert set(alleles) == {"A", "T"}


def test_assemblies_transcript_stats():
    st = AssembliesAlignedTranscriptStatistics()
    st.process(
        {"t1": [(1, 100)], "t2": [(1, 40), (45, 100)], "t3": []},
        {"t1": 100, "t2": 100, "t3": 100},
    )
    assert st.complete == 1 and st.fragmented == 1 and st.missing == 1


def test_add_ad_field():
    rec = _rec([1])
    rec.calls[0].allele_depths = None
    rec.calls[0].acgt_depths = [5, 0, 0, 7]
    VCFAddADGTField().transform([rec])
    assert rec.calls[0].allele_depths == [5, 7]

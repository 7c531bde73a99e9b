"""VCFRelativeCoordinatesTranslator semantics: refbase reconciliation
(ref/alt swap), strand flips of alleles and ACGT depths, triallelic drop,
statistics (ref: gbs/VCFRelativeCoordinatesTranslator.java:204-448)."""
import numpy as np

from ngsepcore_tpu.align.read_alignment import FLAG_READ_REVERSE, ReadAlignment
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    encode_dna,
)
from ngsepcore_tpu.gbs.translator import reference_position, translate_records
from ngsepcore_tpu.variants.model import CalledGenomicVariant, TYPE_BIALLELIC_SNV
from ngsepcore_tpu.vcf.io import VCFRecord


def _genome(seq: str):
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=encode_dna(seq)))
    return ReferenceGenome(seqs)


def _aln(first, cigar, read, reverse=False):
    a = ReadAlignment(
        sequence_name="chr1", first=first, cigar=cigar, read_chars=read
    )
    if reverse:
        a.flags |= FLAG_READ_REVERSE
    return a


def _snv_record(cluster, pos, ref, alt, called, acgt=None, acn=None):
    call = CalledGenomicVariant(
        sequence_name=cluster,
        first=pos,
        alleles=[ref, alt],
        variant_type=TYPE_BIALLELIC_SNV,
        sample_id="s1",
        indexes_called_alleles=called,
        genotype_quality=60,
        total_read_depth=10,
        acgt_depths=acgt or [],
        allele_copy_numbers=acn or [1, 1],
        copy_number=2,
    )
    v = CalledGenomicVariant(
        sequence_name=cluster,
        first=pos,
        alleles=[ref, alt],
        variant_type=TYPE_BIALLELIC_SNV,
        quality=90,
    )
    return VCFRecord(variant=v, calls=[call])


def test_reference_position_forward_and_reverse():
    a = _aln(11, [(3, "M"), (2, "D"), (4, "M")], "AAACCCC")
    assert reference_position(a, 0) == 11
    assert reference_position(a, 2) == 13
    assert reference_position(a, 3) == 16  # deletion skipped
    assert reference_position(a, 6) == 19
    # reverse: consensus position p = aligned position len-1-p
    r = _aln(11, [(7, "M")], "AAACCCC", reverse=True)
    assert reference_position(r, 0) == 17
    assert reference_position(r, 6) == 11


def test_forward_translation_keeps_ref():
    # genome base at pos 13 is G; consensus carries G>T
    genome = _genome("AAAAAAAAAAAAG" + "C" * 10)
    aln = _aln(11, [(5, "M")], "AAGCC")
    rec = _snv_record("c0", 3, "G", "T", [0, 1])
    out, stats = translate_records([rec], {"c0": aln}, genome=genome)
    assert stats.translated == 1 and stats.biallelic == 1
    v = out[0].variant
    assert (v.sequence_name, v.first, v.alleles) == ("chr1", 13, ["G", "T"])
    assert out[0].calls[0].indexes_called_alleles == [0, 1]
    assert out[0].info["DENOVOCLUSTER"] == "c0"


def test_refbase_swap_when_consensus_carries_alt():
    # genome base is T, consensus called ref=G alt=T: translated alleles
    # become [T, G] and a hom-"ref"(G) call becomes hom-ALT
    genome = _genome("AAAAAAAAAAAAT" + "C" * 10)
    aln = _aln(11, [(5, "M")], "AAGCC")
    rec = _snv_record("c0", 3, "G", "T", [0], acn=[2, 0])
    out, stats = translate_records([rec], {"c0": aln}, genome=genome)
    assert stats.translated == 1
    v = out[0].variant
    assert v.alleles == ["T", "G"]
    c = out[0].calls[0]
    assert c.indexes_called_alleles == [1]  # G is now the alternative
    assert c.allele_copy_numbers == [0, 2]


def test_reverse_strand_flips_alleles_and_depths():
    # reverse alignment: consensus G>A at consensus pos 3 maps to
    # complemented alleles C>T at genome position last-2
    genome = _genome("AAAAAAAAAAAACCCCCCCCCC")
    read = "GGGGG"  # aligned orientation (revcomp of consensus)
    aln = _aln(11, [(5, "M")], read, reverse=True)
    rec = _snv_record(
        "c0", 3, "G", "A", [0, 1], acgt=[4, 0, 6, 0]  # A=4 G=6
    )
    out, stats = translate_records([rec], {"c0": aln}, genome=genome)
    assert stats.translated == 1
    v = out[0].variant
    # consensus pos 3 (0-based 2) -> aligned pos 5-1-2=2 -> ref 13
    assert v.first == 13
    assert v.alleles == ["C", "T"]
    c = out[0].calls[0]
    # ACGT depths flip A<->T, C<->G
    assert c.acgt_depths == [0, 6, 0, 4]


def test_triallelic_counted_and_dropped():
    genome = _genome("AAAAAAAAAAAAG" + "C" * 10)
    aln = _aln(11, [(5, "M")], "AAGCC")
    call = CalledGenomicVariant(
        sequence_name="c0", first=3, alleles=["A", "T", "C"],
        variant_type="MULTISNV", sample_id="s1",
        indexes_called_alleles=[1, 2], copy_number=2,
        allele_copy_numbers=[0, 1, 1],
    )
    v = CalledGenomicVariant(
        sequence_name="c0", first=3, alleles=["A", "T", "C"],
        variant_type="MULTISNV", quality=50,
    )
    rec = VCFRecord(variant=v, calls=[call])
    out, stats = translate_records([rec], {"c0": aln}, genome=genome)
    assert out == []
    assert stats.triallelic == 1
    assert stats.untranslated == 1


def test_unmapped_and_stats_report():
    genome = _genome("A" * 30)
    rec = _snv_record("c9", 3, "G", "T", [0, 1])
    out, stats = translate_records([rec], {}, genome=genome)
    assert out == [] and stats.record_without_align == 1
    assert "Total number of records in relative VCF: 1" in stats.report()

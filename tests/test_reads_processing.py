import numpy as np
import pytest

from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    RawRead,
)
from ngsepcore_tpu.index.error_correction import ReadsFileErrorsCorrector
from ngsepcore_tpu.sequencing.demultiplex import BarcodeMap, ReadsDemultiplex
from ngsepcore_tpu.sequencing.trimmer import RawReadsTrimmer


def test_error_correction_fixes_single_substitution():
    rng = np.random.default_rng(8)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    # 30x copies of clean reads covering the sequence
    reads = []
    for i in range(0, 4900, 25):
        for _ in range(8):
            reads.append(RawRead(f"r{i}", seq[i : i + 100], "I" * 100))
    c = ReadsFileErrorsCorrector(kmer_length=15, min_kmer_count=4)
    from ngsepcore_tpu.core.sequences import encode_dna

    c.kmers_map = None
    ex_reads = [r.codes for r in reads]
    from ngsepcore_tpu.index.kmers_extractor import KmersExtractor

    ex = KmersExtractor(kmer_length=15)
    ex.process_codes_list(ex_reads)
    c.kmers_map = ex.kmers_map
    # corrupt one read in the middle
    bad = list(seq[1000:1100])
    orig = bad[50]
    bad[50] = {"A": "C", "C": "G", "G": "T", "T": "A"}[orig]
    bad_read = RawRead("bad", "".join(bad), "I" * 100)
    fixed = c.correct_read(bad_read)
    assert fixed.sequence == seq[1000:1100]
    assert c.corrected_errors >= 1


def test_barcode_demultiplex(tmp_path):
    from ngsepcore_tpu.io.fastq import write_fastq, FastqFileReader

    bm = BarcodeMap({"ACGT": "s1", "ACGTTT": "s2", "GGGG": "s3"})
    reads = [
        RawRead("a", "ACGT" + "A" * 50, "I" * 54),     # s1
        RawRead("b", "ACGTTT" + "C" * 50, "I" * 56),   # s2 (longest match wins)
        RawRead("c", "GGGG" + "T" * 50, "I" * 54),     # s3
        RawRead("d", "TTTT" + "G" * 50, "I" * 54),     # unassigned
    ]
    lane = str(tmp_path / "lane.fastq")
    write_fastq(reads, lane)
    d = ReadsDemultiplex(bm, min_read_length=10)
    paths = d.demultiplex_file(lane, str(tmp_path / "out"), gzip_out=False)
    assert d.stats.assigned == 3
    assert set(paths) == {"s1", "s2", "s3"}
    s2_reads = list(FastqFileReader(paths["s2"]))
    assert s2_reads[0].sequence == "C" * 50  # barcode trimmed


def test_trimmer_quality_and_adapter():
    t = RawReadsTrimmer(min_quality=20, min_read_length=10, adapters=["AGATCG"])
    # high quality then junk tail
    r = RawRead("x", "ACGTACGTACGTACGT" + "AAAA", "I" * 16 + "!!!!")
    out = t.trim_read(r)
    assert out.sequence == "ACGTACGTACGTACGT"
    r2 = RawRead("y", "ACGTACGTACGT" + "AGATCG" + "ACGT", "I" * 22)
    out2 = t.trim_read(r2)
    assert out2.sequence == "ACGTACGTACGT"
    r3 = RawRead("z", "ACGT", "!!!!")
    assert t.trim_read(r3) is None


def test_individual_genome_builder():
    from ngsepcore_tpu.genome.builders import build_individual_genome
    from ngsepcore_tpu.variants.model import CalledGenomicVariant
    from ngsepcore_tpu.vcf.io import VCFRecord

    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", "AAAAACCCCC")])
    )
    call = CalledGenomicVariant(
        sequence_name="chr1", first=3, alleles=["A", "G"],
        indexes_called_alleles=[1, 1],
    )
    call2 = CalledGenomicVariant(
        sequence_name="chr1", first=6, alleles=["CC", "C"],
        indexes_called_alleles=[1, 1],
    )
    recs = [VCFRecord(variant=call, calls=[call]), VCFRecord(variant=call2, calls=[call2])]
    seqs = build_individual_genome(g, recs)
    assert seqs[0].characters == "AAGAACCCC".replace("CCCC", "CCCC")
    assert seqs[0].characters == "AAGAACCCC"


def test_genome_mask():
    from ngsepcore_tpu.core.regions import GenomicRegion
    from ngsepcore_tpu.genome.builders import mask_genome_regions

    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", "ACGTACGTAC")])
    )
    masked = mask_genome_regions(g, [GenomicRegion("chr1", 3, 5)])
    assert masked[0].characters == "ACNNNCGTAC"

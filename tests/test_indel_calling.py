import numpy as np
import pytest

from ngsepcore_tpu.call.indels import (
    IndelCountsHelper,
    SpanningCall,
    call_indel,
    cluster_allele_calls,
)
from ngsepcore_tpu.core.sequences import encode_dna


def _mk_calls(alleles_and_counts, qual=35):
    calls = []
    for allele, count in alleles_and_counts:
        for _ in range(count):
            calls.append(
                SpanningCall(
                    codes=encode_dna(allele),
                    qualities=np.full(len(allele), qual, np.int8),
                    negative_strand=False,
                )
            )
    return calls


def test_cluster_allele_calls_reference_first():
    calls = _mk_calls([("ACGT", 10), ("ACT", 8)])
    alleles = cluster_allele_calls(calls, "ACGT")
    assert alleles[0] == "ACGT"
    assert "ACT" in alleles


def test_homozygous_deletion_call():
    # ref allele ACGTA, observed allele ACA (2bp deletion) in all reads
    calls = _mk_calls([("ACA", 20)])
    alleles = cluster_allele_calls(calls, "ACGTA")
    called = call_indel("chr1", 100, calls, alleles, 0.001)
    assert called is not None
    assert called.variant_type == "INDEL"
    assert called.called_alleles() == ["ACA"]
    assert called.is_homozygous
    assert called.genotype_quality > 40


def test_heterozygous_insertion_call():
    calls = _mk_calls([("ACTTG", 12), ("ACG", 12)])
    alleles = cluster_allele_calls(calls, "ACG")
    called = call_indel("chr1", 50, calls, alleles, 0.001)
    assert called is not None
    assert called.is_heterozygous
    assert set(called.called_alleles()) == {"ACG", "ACTTG"}


def test_same_length_alleles_no_indel():
    # all observed alleles have the reference length -> no indel call
    calls = _mk_calls([("ACG", 20)])
    alleles = cluster_allele_calls(calls, "ACG")
    called = call_indel("chr1", 10, calls, alleles, 0.001)
    assert called is None or called.is_homozygous_reference or not called.is_undecided


def test_no_calls_returns_none():
    assert call_indel("chr1", 10, [], ["ACGT"], 0.001) is None


def test_indel_detector_e2e():
    """Simulate a diploid with indels, align, call, compare truth."""
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
    from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    rng = np.random.default_rng(42)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence.from_string(
            "chr1", "".join(rng.choice(list("ACGT"), size=40000))
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.0, indel_rate=0.0005, het_fraction=0.3, seed=9
    )
    sim.simulate()
    assert len(sim.calls) > 5
    reads = []
    for h, hg in enumerate(sim.build_haplotype_genomes()):
        reads.extend(
            SingleReadsSimulator(
                hg, read_length=100, substitution_error_rate=0.001, seed=20 + h
            ).simulate(8000)
        )
    aligner = ReadsAligner(genome)
    alns = []
    for i in range(0, len(reads), 4096):
        for r in aligner.align_batch(reads[i : i + 4096]):
            alns.extend(r)
    det = SingleSampleVariantsDetector(genome, sample_id="sim")
    records = det.find_variants(alns)
    indel_recs = [r for r in records if r.variant.variant_type in ("INDEL", "STR")]
    truth_pos = {c.first for c in sim.calls}
    # indel anchor may differ by a couple bp after realignment
    tp = sum(
        1
        for r in indel_recs
        if any(abs(r.variant.first - t) <= 3 for t in truth_pos)
    )
    recall = tp / len(sim.calls)
    precision = tp / max(1, len(indel_recs))
    assert recall > 0.7, f"recall {recall} ({tp}/{len(sim.calls)})"
    assert precision > 0.7, f"precision {precision} ({tp}/{len(indel_recs)})"


def test_known_str_genotyping(tmp_path):
    """Config #4 surface: genotype an STR region given a known-STRs file."""
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
    from ngsepcore_tpu.io.sam import ReadAlignmentFileWriter
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator
    from ngsepcore_tpu.io.fasta import save_fasta

    rng = np.random.default_rng(19)
    left = "".join(rng.choice(list("ACGT"), size=5000))
    right = "".join(rng.choice(list("ACGT"), size=5000))
    str_unit = "AT"
    ref_seq = left + str_unit * 10 + right  # STR at 5001..5020
    genome = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", ref_seq)])
    )
    # individual has 12 repeats (4bp insertion) homozygous
    indiv_seq = left + str_unit * 12 + right
    indiv = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", indiv_seq)])
    )
    reads = SingleReadsSimulator(
        indiv, read_length=100, substitution_error_rate=0.0, seed=30
    ).simulate(4000)
    aligner = ReadsAligner(genome)
    alns = []
    for i in range(0, len(reads), 4096):
        for r in aligner.align_batch(reads[i : i + 4096]):
            alns.extend(r)
    strs_file = tmp_path / "strs.txt"
    strs_file.write_text("chr1\t5001\t5020\n")
    sam = str(tmp_path / "alns.sam")
    with ReadAlignmentFileWriter(genome.sequences, sam, sample_id="s") as w:
        for a in alns:
            w.write(a)
    det = SingleSampleVariantsDetector(
        genome, sample_id="s", known_strs_file=str(strs_file)
    )
    n = det.run(sam, str(tmp_path / "out.vcf"))
    from ngsepcore_tpu.vcf.io import VCFFileReader

    records = VCFFileReader(str(tmp_path / "out.vcf")).load_all()
    strs = [r for r in records if r.variant.variant_type == "STR"]
    assert strs, "no STR call produced"
    s = strs[0]
    assert 4995 <= s.variant.first <= 5005
    call = s.calls[0]
    assert not call.is_undecided and not call.is_homozygous_reference
    # the called allele should be 4bp longer than the reference allele
    ref_len = len(s.variant.alleles[0])
    alt_lens = {len(a) for a in call.called_alleles()}
    assert any(al - ref_len == 4 for al in alt_lens), (
        s.variant.alleles, call.called_alleles()
    )


def test_update_batch_matches_sequential():
    """IndelCountsHelper.update_batch == sequential update() (same counts,
    strand counts, and logcond to fp tolerance) on randomized sites."""
    import numpy as np

    from ngsepcore_tpu.call.indels import IndelCountsHelper, SpanningCall

    rng = np.random.default_rng(42)
    bases = "ACGT"
    for trial in range(20):
        n_alleles = int(rng.integers(1, 5))
        lengths = rng.integers(3, 9, size=n_alleles)
        alleles = []
        for L in lengths:
            a = "".join(bases[i] for i in rng.integers(0, 4, int(L)))
            if a in alleles:
                a = a[:-1] + bases[(bases.index(a[-1]) + 1) % 4]
            if a not in alleles:
                alleles.append(a)
        calls = []
        for _ in range(int(rng.integers(0, 25))):
            src = alleles[int(rng.integers(0, len(alleles)))]
            codes = list(src)
            for k in range(len(codes)):
                if rng.random() < 0.1:
                    codes[k] = bases[int(rng.integers(0, 4))]
            from ngsepcore_tpu.core.sequences import encode_dna

            calls.append(
                SpanningCall(
                    codes=encode_dna("".join(codes)),
                    qualities=rng.integers(0, 41, size=len(codes)).astype(
                        np.int8
                    ),
                    negative_strand=bool(rng.integers(0, 2)),
                )
            )
        h_seq = IndelCountsHelper(alleles, 0.5)
        for c in calls:
            h_seq.update(c)
        h_bat = IndelCountsHelper(alleles, 0.5)
        h_bat.update_batch(calls)
        assert h_seq.total == h_bat.total
        assert np.array_equal(h_seq.counts, h_bat.counts)
        assert np.array_equal(h_seq.strand_counts, h_bat.strand_counts)
        np.testing.assert_allclose(
            h_seq.logcond, h_bat.logcond, rtol=0, atol=1e-9
        )

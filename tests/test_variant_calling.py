"""End-to-end: simulate individual -> reads -> align -> call -> compare truth.

This mirrors the reference's own QA strategy (SURVEY §4): simulation + truth
comparison via the benchmark comparator concept.
"""
import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator
from ngsepcore_tpu.vcf.io import VCFFileReader, VCFFileWriter


@pytest.fixture(scope="module")
def pipeline_results(tmp_path_factory):
    rng = np.random.default_rng(123)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence.from_string(
            "chr1", "".join(rng.choice(list("ACGT"), size=60000))
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.002, indel_rate=0.0, het_fraction=0.4, seed=5
    )
    sim.simulate()
    haplotypes = sim.build_haplotype_genomes()
    # ~40x coverage split across haplotypes
    reads = []
    for h, hg in enumerate(haplotypes):
        rsim = SingleReadsSimulator(
            hg, read_length=100, substitution_error_rate=0.002, seed=10 + h
        )
        reads.extend(rsim.simulate(12000))
    aligner = ReadsAligner(genome)
    alns = []
    B = 4096
    for i in range(0, len(reads), B):
        for r in aligner.align_batch(reads[i : i + B]):
            alns.extend(r)
    detector = SingleSampleVariantsDetector(genome, sample_id="sim")
    records = detector.find_variants(alns)
    return sim, records


def test_snv_sensitivity_and_precision(pipeline_results):
    sim, records = pipeline_results
    truth = {(c.sequence_name, c.first): c for c in sim.calls}
    called = {(r.variant.sequence_name, r.variant.first): r for r in records}
    tp = sum(1 for k in called if k in truth)
    fp = len(called) - tp
    fn = len(truth) - tp
    sensitivity = tp / max(1, len(truth))
    precision = tp / max(1, len(called))
    assert sensitivity > 0.93, f"sens {sensitivity} (tp={tp} fn={fn})"
    assert precision > 0.95, f"prec {precision} (tp={tp} fp={fp})"


def test_genotype_concordance(pipeline_results):
    sim, records = pipeline_results
    truth = {(c.sequence_name, c.first): c for c in sim.calls}
    checked = concordant = 0
    for r in records:
        k = (r.variant.sequence_name, r.variant.first)
        if k not in truth:
            continue
        t = truth[k]
        call = r.calls[0]
        if call.alleles[1] != t.alleles[1]:
            continue
        checked += 1
        if (call.genotype_state == t.genotype_state) and sorted(
            call.called_alleles()
        ) == sorted(t.called_alleles()):
            concordant += 1
    assert checked > 0
    assert concordant / checked > 0.97, f"{concordant}/{checked}"


def test_vcf_write_read_roundtrip(pipeline_results, tmp_path):
    sim, records = pipeline_results
    p = str(tmp_path / "calls.vcf")
    with VCFFileWriter(p, ["sim"]) as w:
        for r in records:
            w.write(r)
    back = VCFFileReader(p).load_all()
    assert len(back) == len(records)
    for orig, rt in zip(records[:50], back[:50]):
        assert rt.variant.first == orig.variant.first
        assert rt.variant.alleles == orig.variant.alleles
        assert rt.calls[0].indexes_called_alleles == sorted(
            orig.calls[0].indexes_called_alleles
        )
        assert rt.calls[0].genotype_quality == orig.calls[0].genotype_quality
        assert rt.calls[0].total_read_depth == orig.calls[0].total_read_depth


def test_multiple_mapping_regions():
    from ngsepcore_tpu.align.read_alignment import ReadAlignment, cigar_from_string
    from ngsepcore_tpu.call.repeats import MultipleMappingRegionsCalculator

    def mk(first, mq, name):
        return ReadAlignment(
            sequence_name="chr1", first=first, cigar=cigar_from_string("100M"),
            read_chars="A" * 100, read_name=name, alignment_quality=mq,
        )

    alns = [mk(1000 + 10 * i, 0, f"m{i}") for i in range(8)]  # repeat cluster
    alns += [mk(5000 + 50 * i, 60, f"u{i}") for i in range(10)]  # unique
    calc = MultipleMappingRegionsCalculator()
    reps = calc.calculate_multiple_mapping_regions(alns)
    assert len(reps) == 1
    r = reps[0]
    assert r.first == 1000 and r.last == 1169
    assert r.variant_type == "REPEAT"

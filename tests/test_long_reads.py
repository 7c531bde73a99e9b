"""Long-read alignment + long-read SV detection end-to-end.

Mirrors the reference QA style (SURVEY §4): simulated reads with known
placements / planted SVs, checked for recovery.
"""
import numpy as np
import pytest

from ngsepcore_tpu.align.long_reads import (
    LongReadsAligner,
    collapse_complementary_indels,
    is_long_read_platform,
)
from ngsepcore_tpu.call.long_read_sv import LongReadStructuralVariantDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator


def _genome_from_string(s: str) -> ReferenceGenome:
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence.from_string("chr1", s))
    return ReferenceGenome(seqs)


@pytest.fixture(scope="module")
def sv_setup():
    rng = np.random.default_rng(4)
    ref = "".join(rng.choice(list("ACGT"), size=120000))
    ins = "".join(rng.choice(list("ACGT"), size=80))
    # 100bp deletion at 50000 (1-based 50001..50100), 80bp insertion at 20000
    mut = ref[:20000] + ins + ref[20000:50000] + ref[50100:]
    genome = _genome_from_string(ref)
    mg = _genome_from_string(mut)
    sim = SingleReadsSimulator(
        mg,
        read_length=8000,
        substitution_error_rate=0.01,
        indel_error_rate=0.01,
        seed=11,
    )
    reads = sim.simulate(280)
    aligner = LongReadsAligner(genome)
    alns = []
    for group in aligner.align_batch(reads):
        alns.extend(group)
    return genome, reads, aligner, alns


def test_long_reads_map_to_truth(sv_setup):
    genome, reads, aligner, alns = sv_setup
    assert aligner.aligned_reads >= 0.95 * aligner.total_reads
    by_name = {a.read_name: a for a in alns}
    correct = 0
    checked = 0
    for r in reads:
        a = by_name.get(r.name)
        if a is None:
            continue
        parts = r.name.split("_")
        tfirst = int(parts[1])
        trev = parts[2] in ("True", "true", "1")
        checked += 1
        # mutated coords drift vs reference by at most the 80bp insertion
        if abs(a.first - tfirst) < 300 and a.is_negative_strand == trev:
            correct += 1
    assert checked > 0
    assert correct >= 0.9 * checked, f"{correct}/{checked}"


def test_long_read_sv_detection(sv_setup):
    genome, reads, aligner, alns = sv_setup
    det = LongReadStructuralVariantDetector(genome)
    variants = det.find_variants(alns)
    dels = [v for v in variants if v.variant_type == "DEL"]
    inss = [v for v in variants if v.variant_type == "INS"]
    assert any(abs(v.first - 50001) < 150 and 60 <= v.length() <= 140 for v in dels), (
        [(v.first, v.length()) for v in dels]
    )
    assert any(abs(v.first - 20000) < 150 and 50 <= v.length() <= 110 for v in inss), (
        [(v.first, v.length()) for v in inss]
    )
    for v in variants:
        assert v.genotype_quality > 0
        assert not v.is_undecided


def test_sv_detector_scc_and_dbscan(sv_setup):
    genome, reads, aligner, alns = sv_setup
    for algo in ("SCC", "DBSCAN"):
        det = LongReadStructuralVariantDetector(genome, algorithm=algo)
        variants = det.find_variants(alns)
        dels = [v for v in variants if v.variant_type == "DEL"]
        assert any(abs(v.first - 50001) < 200 for v in dels), algo


def test_collapse_complementary_indels():
    # I,M,D sandwich with long indels and short middle match collapses
    runs = [(100, "M"), (20, "I"), (5, "M"), (22, "D"), (100, "M")]
    out, collapsed = collapse_complementary_indels(runs)
    assert collapsed == 20
    assert out == [(100, "M"), (25, "M"), (2, "D"), (100, "M")] or out == [
        (125, "M"),
        (2, "D"),
        (100, "M"),
    ]
    # short indels stay untouched
    runs2 = [(100, "M"), (3, "I"), (5, "M"), (2, "D"), (100, "M")]
    out2, c2 = collapse_complementary_indels(runs2)
    assert c2 == 0 and out2 == runs2


def test_platform_flag():
    assert is_long_read_platform("PACBIO")
    assert is_long_read_platform("ont")
    assert not is_long_read_platform("ILLUMINA")
    assert not is_long_read_platform(None)

import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
)
from ngsepcore_tpu.simulation.reads_simulator import (
    SingleReadsSimulator,
    parse_simulated_read_name,
)


@pytest.fixture(scope="module")
def toy_genome():
    rng = np.random.default_rng(99)
    seqs = QualifiedSequenceList()
    for i, L in enumerate([30000, 20000]):
        s = "".join(rng.choice(list("ACGT"), size=L))
        seqs.add(QualifiedSequence.from_string(f"chr{i+1}", s))
    return ReferenceGenome(seqs)


@pytest.fixture(scope="module")
def aligner(toy_genome):
    return ReadsAligner(toy_genome)


def test_align_perfect_reads(toy_genome, aligner):
    sim = SingleReadsSimulator(
        toy_genome, read_length=120, substitution_error_rate=0.0, seed=3
    )
    reads = sim.simulate(60)
    results = aligner.align_batch(reads)
    correct = 0
    for read, alns in zip(reads, results):
        seq_name, first, reverse = parse_simulated_read_name(read.name)
        assert len(alns) >= 1, f"unaligned read {read.name}"
        a = alns[0]
        if (
            a.sequence_name == seq_name
            and abs(a.first - first) <= 2
            and a.is_negative_strand == reverse
        ):
            correct += 1
        assert a.cigar_string == "120M"
        assert a.num_mismatches == 0
    assert correct == len(reads)


def test_align_reads_with_errors(toy_genome, aligner):
    sim = SingleReadsSimulator(
        toy_genome, read_length=120, substitution_error_rate=0.01, seed=7
    )
    reads = sim.simulate(60)
    results = aligner.align_batch(reads)
    correct = 0
    for read, alns in zip(reads, results):
        seq_name, first, reverse = parse_simulated_read_name(read.name)
        if not alns:
            continue
        a = alns[0]
        # soft-clipped leading bases shift `first`; compare unclipped start
        eff_first = a.first - a.soft_clip_start
        if a.sequence_name == seq_name and abs(eff_first - first) <= 3:
            correct += 1
    assert correct >= 0.95 * len(reads)


def test_align_read_with_deletion(toy_genome, aligner):
    # read sampled from genome with an internal deletion of 4 bases
    g = toy_genome
    start = 5000
    window = g.reference_string("chr1", start + 1, start + 124)
    read_seq = window[:60] + window[64:120]  # 116bp read, 4bp deletion at pos 60
    from ngsepcore_tpu.core.sequences import RawRead

    reads = [RawRead("del_read", read_seq, "I" * len(read_seq))]
    results = aligner.align_batch(reads)
    assert results[0], "deletion read did not align"
    a = results[0][0]
    assert a.sequence_name == "chr1"
    assert a.first == start + 1
    assert "D" in a.cigar_string
    total_q = sum(l for l, op in a.cigar if op in "MIS")
    assert total_q == len(read_seq)


def test_unmappable_read(toy_genome, aligner):
    from ngsepcore_tpu.core.sequences import RawRead

    reads = [RawRead("junk", "N" * 100, "I" * 100)]
    results = aligner.align_batch(reads)
    assert results[0] == []


def test_tier1_vec_matches_scan():
    """Closed-form tier-1 stats must equal the sequential-scan reference."""
    import numpy as np
    from ngsepcore_tpu.kernels.tier1 import tier1_stats, tier1_stats_vec

    rng = np.random.default_rng(3)
    B, L = 64, 96
    q = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    s = q.copy()
    # sprinkle mismatches incl. clustered ends
    mask = rng.random((B, L)) < 0.08
    s[mask] = (s[mask] + 1 + rng.integers(0, 3, size=mask.sum())) % 4
    s[:8, :6] = (q[:8, :6] + 2) % 4  # bad starts
    s[8:16, -7:] = (q[8:16, -7:] + 2) % 4  # bad ends
    qlen = rng.integers(40, L + 1, size=B).astype(np.int32)
    t0, c0, e0 = (np.asarray(x) for x in tier1_stats(q, qlen, s))
    t1, c1, e1 = (np.asarray(x) for x in tier1_stats_vec(q, qlen, s))
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(e0, e1)

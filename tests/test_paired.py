import numpy as np
import pytest

from ngsepcore_tpu.align.paired import PairedReadsAligner
from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    RawRead,
    reverse_complement,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(55)
    seq = "".join(rng.choice(list("ACGT"), size=40000))
    seqs = QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    genome = ReferenceGenome(seqs)
    return genome, seq, ReadsAligner(genome)


def _make_pairs(rng, seq, n, insert=400, read_len=100):
    reads1, reads2, truth = [], [], []
    for i in range(n):
        s = int(rng.integers(0, len(seq) - insert))
        frag = seq[s : s + insert]
        r1 = frag[:read_len]
        r2 = reverse_complement(frag[-read_len:])
        reads1.append(RawRead(f"p{i}/1", r1, "I" * read_len))
        reads2.append(RawRead(f"p{i}/2", r2, "I" * read_len))
        truth.append(s + 1)
    return reads1, reads2, truth


def test_proper_pairs(setup):
    genome, seq, aligner = setup
    rng = np.random.default_rng(9)
    reads1, reads2, truth = _make_pairs(rng, seq, 30)
    pa = PairedReadsAligner(aligner)
    results = pa.align_batch(reads1, reads2)
    assert pa.proper_pairs == 30
    for i, alns in enumerate(results):
        assert len(alns) == 2
        a1, a2 = alns
        assert a1.is_paired and a1.is_proper_pair
        assert a2.is_paired and a2.is_proper_pair
        assert a1.first == truth[i]
        assert not a1.is_negative_strand and a2.is_negative_strand
        assert a1.inferred_insert_size == 400
        assert a2.inferred_insert_size == -400
        assert a1.mate_first == a2.first and a2.mate_first == a1.first


def test_mate_unmapped(setup):
    genome, seq, aligner = setup
    reads1 = [RawRead("x/1", seq[1000:1100], "I" * 100)]
    reads2 = [RawRead("x/2", "N" * 100, "I" * 100)]
    pa = PairedReadsAligner(aligner)
    results = pa.align_batch(reads1, reads2)
    assert len(results[0]) == 1
    a = results[0][0]
    assert a.is_paired and not a.is_proper_pair
    assert a.flags & 8  # mate unmapped
    assert a.alignment_quality <= 50  # halved from 100


def test_distant_mates_not_proper(setup):
    genome, seq, aligner = setup
    r1 = RawRead("d/1", seq[1000:1100], "I" * 100)
    r2 = RawRead("d/2", reverse_complement(seq[20000:20100]), "I" * 100)
    pa = PairedReadsAligner(aligner)
    results = pa.align_batch([r1], [r2])
    alns = results[0]
    assert len(alns) == 2
    assert all(not a.is_proper_pair for a in alns)
    assert all(a.is_paired for a in alns)

import numpy as np
import pytest

from ngsepcore_tpu.align.read_alignment import ReadAlignment
from ngsepcore_tpu.call.read_depth import (
    PoissonHMMReadDepthAlgorithm,
    ReadDepthDistribution,
    cnv_seq_compare,
)
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList


def _genome(L=100000, seed=1):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACGT"), size=L))
    return ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )


def _alns_with_cnv(L, depth=20, dup_region=(40000, 50000), dup_factor=2, seed=2):
    """Uniform coverage `depth`, duplicated segment at dup_factor x."""
    rng = np.random.default_rng(seed)
    alns = []
    n = L * depth // 100
    starts = rng.integers(1, L - 100, size=n)
    for s in starts:
        alns.append(ReadAlignment("chr1", int(s), [(100, "M")], read_chars="A" * 100))
    a, b = dup_region
    n_extra = (b - a) * depth * (dup_factor - 1) // 100
    for s in rng.integers(a, b - 100, size=n_extra):
        alns.append(ReadAlignment("chr1", int(s), [(100, "M")], read_chars="A" * 100))
    return alns


def test_depth_distribution_binning():
    g = _genome(10000)
    alns = [ReadAlignment("chr1", 1, [(100, "M")], read_chars="A" * 100)] * 3
    d = ReadDepthDistribution(g)
    d.process_alignments(alns)
    assert d.bins_per_seq[0][0] == 3
    assert d.bins_per_seq[0][1:].sum() == 0


def test_poisson_hmm_detects_duplication():
    L = 100000
    g = _genome(L)
    alns = _alns_with_cnv(L, dup_region=(40000, 50000), dup_factor=2)
    dist = ReadDepthDistribution(g)
    dist.process_alignments(alns)
    dist.correct_depth_by_gc_content()
    dist.fit()
    algo = PoissonHMMReadDepthAlgorithm()
    cnvs = algo.call_cnvs(dist)
    dups = [c for c in cnvs if c.copy_number > 2]
    assert dups, "duplication not detected"
    best = max(dups, key=lambda c: c.length())
    assert best.copy_number == 4
    assert abs(best.first - 40000) < 2000
    assert abs(best.last - 50000) < 2000


def test_cnvseq_case_control():
    L = 100000
    g = _genome(L)
    control = _alns_with_cnv(L, dup_factor=1, seed=3)  # flat
    case = _alns_with_cnv(L, dup_region=(60000, 70000), dup_factor=3, seed=4)
    cnvs = cnv_seq_compare(g, case, control)
    assert cnvs
    best = max(cnvs, key=lambda c: c.length())
    assert best.copy_number > 2
    assert abs(best.first - 60000) < 3000

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


def _dist_with_event(depth_mean=30.0, del_span=(200, 260), dup_span=(500, 580)):
    """Synthetic distribution: flat depth with one deletion + one duplication."""
    import numpy as np
    from ngsepcore_tpu.call.read_depth import ReadDepthDistribution
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList

    rng = np.random.default_rng(11)
    L = 100_000
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)))
    genome = ReferenceGenome(seqs)
    dist = ReadDepthDistribution(genome)
    nbins = len(dist.bins_per_seq[0])
    depth = rng.poisson(depth_mean, size=nbins).astype(float)
    depth[del_span[0]:del_span[1]] = rng.poisson(depth_mean / 2, size=del_span[1]-del_span[0])
    depth[dup_span[0]:dup_span[1]] = rng.poisson(2 * depth_mean, size=dup_span[1]-dup_span[0])
    dist.bins_per_seq[0] = depth
    dist.fit()
    return dist


def _check_calls(calls, del_span, dup_span, bin_size=100):
    dels = [c for c in calls if c.copy_number < 2]
    dups = [c for c in calls if c.copy_number > 2]
    assert any(abs(c.first - (del_span[0]*bin_size+1)) <= 5*bin_size for c in dels), dels
    assert any(abs(c.first - (dup_span[0]*bin_size+1)) <= 5*bin_size for c in dups), dups


def test_ewt_algorithm():
    from ngsepcore_tpu.call.read_depth import EWTReadDepthAlgorithm

    dist = _dist_with_event()
    calls = EWTReadDepthAlgorithm().call_cnvs(dist)
    _check_calls(calls, (200, 260), (500, 580))


def test_cnvnator_algorithm():
    from ngsepcore_tpu.call.read_depth import CNVnatorReadDepthAlgorithm

    dist = _dist_with_event()
    calls = CNVnatorReadDepthAlgorithm().call_cnvs(dist)
    _check_calls(calls, (200, 260), (500, 580))


def test_maximum_likelihood_algorithm():
    from ngsepcore_tpu.call.read_depth import MaximumLikelihoodReadDepthAlgorithm

    dist = _dist_with_event()
    calls = MaximumLikelihoodReadDepthAlgorithm().call_cnvs(dist)
    _check_calls(calls, (200, 260), (500, 580))


def test_cnv_algorithm_registry_selection():
    from ngsepcore_tpu.call.read_depth import CNV_ALGORITHMS

    assert set(CNV_ALGORITHMS) == {"CNVnator", "EWT", "PoissonHMM", "MAXIMUMLIKELIHOOD"}

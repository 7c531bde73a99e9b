import numpy as np
import pytest

from ngsepcore_tpu.core.sequences import RawRead
from ngsepcore_tpu.gbs.denovo import KmerPrefixReadsClusteringAlgorithm


def _make_gbs_data(seed=4):
    """3 samples; 5 loci of 80bp; sample1 homozygous alt at locus 2 pos 40,
    sample2 het at locus 3 pos 50."""
    rng = np.random.default_rng(seed)
    loci = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(5)]
    def alt(base):
        return {"A": "C", "C": "G", "G": "T", "T": "A"}[base]
    reads_per_sample = [[], [], []]
    for li, locus in enumerate(loci):
        for si in range(3):
            for ri in range(12):
                seq = locus
                if li == 2 and si == 1:
                    seq = seq[:40] + alt(seq[40]) + seq[41:]
                if li == 3 and si == 2 and ri % 2 == 0:
                    seq = seq[:50] + alt(seq[50]) + seq[51:]
                reads_per_sample[si].append(
                    RawRead(f"s{si}_l{li}_{ri}", seq, "I" * len(seq))
                )
    return loci, reads_per_sample


def test_clustering_by_prefix():
    loci, reads = _make_gbs_data()
    algo = KmerPrefixReadsClusteringAlgorithm()
    clusters = algo.cluster_reads(reads)
    assert len(clusters) == 5
    assert all(c.depth == 36 for c in clusters)


def test_cluster_variant_calls():
    loci, reads = _make_gbs_data()
    algo = KmerPrefixReadsClusteringAlgorithm()
    clusters = algo.cluster_reads(reads)
    all_recs = []
    for c in clusters:
        all_recs.extend(algo.call_cluster_variants(c, 3))
    assert len(all_recs) == 2
    by_pos = {r.variant.first: r for r in all_recs}
    assert 41 in by_pos and 51 in by_pos
    r41 = by_pos[41]
    # sample 1 hom alt, others hom ref
    states = [c.genotype_state for c in r41.calls]
    assert states[1] == 2 and states[0] == 0 and states[2] == 0
    r51 = by_pos[51]
    assert r51.calls[2].genotype_state == 1  # het in sample 2


def test_run_writes_vcf(tmp_path):
    from ngsepcore_tpu.io.fastq import write_fastq
    loci, reads = _make_gbs_data()
    paths = []
    for si, rs in enumerate(reads):
        p = str(tmp_path / f"s{si}.fastq")
        write_fastq(rs, p)
        paths.append(p)
    algo = KmerPrefixReadsClusteringAlgorithm()
    n = algo.run(paths, ["s0", "s1", "s2"], str(tmp_path / "gbs"))
    assert n == 2
    text = (tmp_path / "gbs.vcf").read_text()
    assert "Cluster_" in text

import numpy as np
import pytest

from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList


def test_glm_association():
    from ngsepcore_tpu.gwas.glm import GeneralLinearModel
    from ngsepcore_tpu.variants.model import CalledGenomicVariant
    from ngsepcore_tpu.vcf.io import VCFRecord

    rng = np.random.default_rng(11)
    n = 60
    samples = [f"s{i}" for i in range(n)]
    causal = rng.integers(0, 3, size=n)
    neutral = rng.integers(0, 3, size=n)
    pheno = {s: float(2.5 * causal[i] + rng.normal(0, 0.5)) for i, s in enumerate(samples)}

    def rec(pos, dosages):
        calls = []
        for i, g in enumerate(dosages):
            idxs = [0, 0] if g == 0 else [0, 1] if g == 1 else [1, 1]
            calls.append(
                CalledGenomicVariant(
                    sequence_name="chr1", first=pos, alleles=["A", "C"],
                    sample_id=samples[i], indexes_called_alleles=idxs,
                )
            )
        return VCFRecord(variant=calls[0], calls=calls)

    res = GeneralLinearModel().run_association(
        [rec(100, causal), rec(200, neutral)], pheno
    )
    by_pos = {r["position"]: r for r in res}
    assert by_pos[100]["p"] < 1e-8
    assert by_pos[200]["p"] > 0.001
    assert by_pos[100]["beta"] > 1.5


def test_transcriptome_filter_roundtrip(tmp_path):
    from ngsepcore_tpu.transcriptome.gff3 import load_transcriptome_gff3
    from ngsepcore_tpu.transcriptome.tools import (
        filter_transcriptome,
        write_transcriptome_gff3,
    )

    gff = tmp_path / "in.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tx\tgene\t100\t900\t.\t+\t.\tID=gene1\n"
        "chr1\tx\tmRNA\t100\t900\t.\t+\t.\tID=t1;Parent=gene1\n"
        "chr1\tx\tCDS\t100\t400\t.\t+\t0\tID=c1;Parent=t1\n"
        "chr1\tx\tmRNA\t2000\t2100\t.\t-\t.\tID=t2;Parent=gene2\n"
        "chr1\tx\texon\t2000\t2100\t.\t-\t.\tParent=t2\n"
    )
    t = load_transcriptome_gff3(str(gff))
    f = filter_transcriptome(t, only_coding=True)
    assert "t1" in f.transcripts and "t2" not in f.transcripts
    out = tmp_path / "out.gff3"
    write_transcriptome_gff3(f, str(out))
    t2 = load_transcriptome_gff3(str(out))
    assert "t1" in t2.transcripts


def test_mutated_peptides():
    from ngsepcore_tpu.transcriptome.gff3 import load_transcriptome_gff3
    from ngsepcore_tpu.transcriptome.tools import extract_mutated_peptides
    from ngsepcore_tpu.variants.model import GenomicVariant
    import tempfile, os

    # gene 1..30 coding: ATG AAA CCC GGG TTT ...
    seq = "ATGAAACCCGGGTTTACGGATCATTAGAAA"
    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )
    with tempfile.NamedTemporaryFile("w", suffix=".gff3", delete=False) as fh:
        fh.write(
            "##gff-version 3\nchr1\tx\tgene\t1\t27\t.\t+\t.\tID=g1\n"
            "chr1\tx\tmRNA\t1\t27\t.\t+\t.\tID=t1;Parent=g1\n"
            "chr1\tx\tCDS\t1\t27\t.\t+\t0\tParent=t1\n"
        )
        path = fh.name
    t = load_transcriptome_gff3(path)
    os.unlink(path)
    # variant at pos 4 (A->C): codon2 AAA->CAA = K2Q missense
    v = GenomicVariant("chr1", 4, ["A", "C"])
    peps = extract_mutated_peptides(g, t, [v])
    assert len(peps) == 1
    assert peps[0].aa_change == "K2Q"
    assert "Q" in peps[0].peptide


def test_gbs_coordinate_translation():
    from ngsepcore_tpu.align.read_alignment import ReadAlignment
    from ngsepcore_tpu.gbs.translator import translate_records
    from ngsepcore_tpu.variants.model import CalledGenomicVariant
    from ngsepcore_tpu.vcf.io import VCFRecord

    call = CalledGenomicVariant(
        sequence_name="Cluster_1", first=10, alleles=["A", "G"],
        indexes_called_alleles=[0, 1],
    )
    rec = VCFRecord(variant=call, calls=[call])
    aln = ReadAlignment(
        "chr2", 5000, [(80, "M")], read_chars="A" * 80, read_name="Cluster_1"
    )
    out, stats = translate_records([rec], {"Cluster_1": aln})
    assert stats.untranslated == 0 and stats.translated == 1
    assert out[0].variant.sequence_name == "chr2"
    assert out[0].variant.first == 5009  # 5000 + (10-1)


def test_tilling_roundtrip():
    from ngsepcore_tpu.simulation.tilling import (
        TillingPoolsIndividualGenotyper,
        TillingPopulationSimulator,
    )

    rng = np.random.default_rng(2)
    seq = "".join(rng.choice(list("ACGT"), size=20000))
    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )
    sim = TillingPopulationSimulator(g, n_individuals=96, seed=5)
    sim.build_design()
    sim.simulate_mutations(2.0)
    pools = sim.pool_variant_records()
    genotyper = TillingPoolsIndividualGenotyper(sim.design)
    assigned = genotyper.genotype(pools)
    truth = {(ind, pos) for ind, seq_, pos, ref, alt in sim.mutations}
    got = {(ind, r.variant.first) for ind, r in assigned}
    # most unambiguous mutations should be recovered (collisions where two
    # individuals share pools at the same site are expected to be dropped)
    recovered = len(got & truth)
    assert recovered / max(1, len(truth)) > 0.9
    assert not (got - truth), "false assignments"


def test_dbscan_standalone():
    from ngsepcore_tpu.clustering.dbscan import DBSCANClusteringAlgorithm

    # two dense components + one isolated noise point
    adjacency = [
        [1, 2], [0, 2], [0, 1],      # cluster A (0,1,2)
        [4, 5], [3, 5], [3, 4],      # cluster B (3,4,5)
        [],                           # noise (6)
    ]
    alg = DBSCANClusteringAlgorithm()
    clusters = alg.run_dbscan_clustering(list(range(7)), adjacency, min_pts=2)
    assert sorted(map(sorted, clusters)) == [[0, 1, 2], [3, 4, 5]]
    assert alg.noise_points == [6]


def test_best_star_msa():
    from ngsepcore_tpu.clustering.msa import BestStarMultipleSequenceAlignmentAlgorithm

    seqs = [
        "ACGTACGTAC",
        "ACGTACGAC",    # one deletion
        "ACGTTACGTAC",  # one insertion
        "ACGTACGTAC",
    ]
    msa = BestStarMultipleSequenceAlignmentAlgorithm()
    aligned = msa.calculate_multiple_sequence_alignment(seqs)
    assert len(aligned) == 4
    width = len(aligned[0])
    assert all(len(a) == width for a in aligned)
    assert all(a.replace("-", "") == s for a, s in zip(aligned, seqs))


def test_codon_cds_pairwise_alignment():
    """CodonCDSPairwiseAlignment: codon-unit NW, free-start borders,
    match+1/mismatch-1/indel-2 (ref: CodonCDSPairwiseAlignment.java)."""
    from ngsepcore_tpu.transcriptome.codon_alignment import (
        CodonCDSPairwiseAlignment,
    )

    a = CodonCDSPairwiseAlignment()
    # identical CDS
    a.calculate_alignment("ATGAAACCC", "ATGAAACCC")
    assert a.alignment1 == a.alignment2 == "ATGAAACCC"
    assert a.score == 3 and a.pct_identity == 100.0
    # one-codon insertion in cds2: gap must be codon-sized and in frame
    a.calculate_alignment("ATGCCCTTTGGG", "ATGCCCAAATTTGGG")
    assert a.alignment1 == "ATGCCC---TTTGGG"
    assert a.alignment2 == "ATGCCCAAATTTGGG"
    assert a.score == 4 - 2
    assert abs(a.pct_identity - 100.0 * 12 / 15) < 1e-9
    # codon substitution counts one mismatch, never splits frames
    a.calculate_alignment("ATGAAATTT", "ATGCCCTTT")
    assert a.alignment1 == "ATGAAATTT" and a.alignment2 == "ATGCCCTTT"
    assert a.score == 2 - 1


def test_tilling_individual_vcf2pool_vcf(tmp_path):
    """TillingIndividualVCF2PoolVCF: pool ploidy 2x members; alt copies
    1 per het / 2 per hom-alt, summed into every pool of the carrier
    (ref: TillingIndividualVCF2PoolVCF.java:35-111)."""
    from ngsepcore_tpu.simulation.tilling import (
        TillingIndividualVCF2PoolVCF,
        load_pool_configuration,
    )
    from ngsepcore_tpu.variants.model import (
        CalledGenomicVariant,
        TYPE_BIALLELIC_SNV,
    )
    from ngsepcore_tpu.vcf.io import VCFRecord

    desc = tmp_path / "pools.txt"
    desc.write_text(
        "Individual;Pool1;Pool2\nind1;R1;C1\nind2;R1;C2\nind3;R2;C1\n"
    )
    pools = load_pool_configuration(str(desc))
    assert pools == {
        "ind1": ["R1", "C1"], "ind2": ["R1", "C2"], "ind3": ["R2", "C1"],
    }
    conv = TillingIndividualVCF2PoolVCF(pools)
    assert conv.pool_ids == ["C1", "C2", "R1", "R2"]
    assert conv.pool_ploidy == {"C1": 4, "C2": 2, "R1": 4, "R2": 2}

    def call(sample, idxs):
        return CalledGenomicVariant(
            sequence_name="chr1", first=100, alleles=["A", "T"],
            variant_type=TYPE_BIALLELIC_SNV, sample_id=sample,
            indexes_called_alleles=idxs,
        )

    var = call(None, [])
    rec = VCFRecord(
        variant=var,
        calls=[call("ind1", [0, 1]), call("ind2", [0]), call("ind3", [1])],
    )
    out = conv.convert([rec])
    assert len(out) == 1
    by_pool = {c.sample_id: c for c in out[0].calls}
    # ind1 het (+1), ind3 hom alt (+2); ind2 homoref contributes nothing
    assert by_pool["R1"].allele_copy_numbers == [3, 1]  # ind1 het
    assert by_pool["C1"].allele_copy_numbers == [1, 3]  # ind1 + ind3
    assert by_pool["R2"].allele_copy_numbers == [0, 2]  # ind3 hom alt
    assert by_pool["C2"].allele_copy_numbers == [2, 0]  # reference pool
    assert by_pool["C2"].is_homozygous_reference
    assert all(c.genotype_quality == 100 for c in out[0].calls)

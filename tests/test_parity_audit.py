"""The default two-float f32 genotype contraction must decide identical
genotypes + GQ as the bit-exact emulated-f64 path (-parityAudit)."""
import numpy as np

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator


def test_two_float_matches_f64_records():
    rng = np.random.default_rng(21)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence(
            name="chr1", codes=rng.integers(0, 4, size=40000).astype(np.int8)
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.003, indel_rate=0.0005, seed=4
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = []
    for h, hg in enumerate(hap):
        reads.extend(
            SingleReadsSimulator(
                hg, read_length=100, substitution_error_rate=0.004,
                seed=40 + h,
            ).simulate(4000)
        )
    aligner = ReadsAligner(genome)

    def run(audit: bool):
        al = ReadsAligner(genome, table=aligner.table)
        alns = []
        for i in range(0, len(reads), 2048):
            for r in al.align_batch(reads[i : i + 2048]):
                alns.extend(r)
        det = SingleSampleVariantsDetector(
            genome, sample_id="s", parity_audit=audit
        )
        return det.find_variants(alns)

    fast = run(False)
    audit = run(True)
    assert len(fast) > 50

    def key(r):
        v = r.variant
        c = r.calls[0]
        return (
            v.first, tuple(v.alleles), tuple(c.indexes_called_alleles),
            int(c.genotype_quality), int(round(v.quality)),
            tuple(c.acgt_depths or []),
        )

    assert [key(r) for r in fast] == [key(r) for r in audit]

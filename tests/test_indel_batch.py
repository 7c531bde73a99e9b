"""The batched indel-site genotyper (call/indel_batch.py) must emit
records identical to the scalar per-site loop it replaces
(SingleSampleVariantsDetector._call_indels_scalar) through both the
classic two-stage flow and the fused pipeline (which adds array-read
spanning calls)."""
import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator


def _simulate(seed: int, tandem: bool = False):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=40000).astype(np.int8)
    if tandem:
        # short tandem arrays: exercises new-STR sites + the haplotype
        # split path (long same-length groups with depth >= 10)
        for _ in range(25):
            mlen = int(rng.integers(1, 6))
            ncopies = int(rng.integers(6, 30))
            span = mlen * ncopies
            dst = int(rng.integers(0, len(codes) - span))
            codes[dst : dst + span] = np.tile(
                rng.integers(0, 4, size=mlen).astype(np.int8), ncopies
            )
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.002, indel_rate=0.002, seed=seed + 1
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = []
    for h, hg in enumerate(hap):
        reads.extend(
            SingleReadsSimulator(
                hg, read_length=100, substitution_error_rate=0.004,
                seed=seed + 10 + h,
            ).simulate(4000)
        )
    return genome, reads


def _key(rec):
    v = rec.variant
    c = rec.calls[0]
    # phred values saturate at 150 (P(err) < 1e-15): past that point the
    # exact integer depends on float summation order, which legitimately
    # differs between the flat batched reductions and the per-site loop
    # (e.g. 1-best == 0.0 vs 1e-16 -> GQ 255 vs 160); both mean "certain"
    return (
        v.sequence_name, v.first, tuple(v.alleles), v.variant_type,
        tuple(c.indexes_called_alleles),
        min(int(c.genotype_quality), 150),
        min(int(round(v.quality)), 150),
        int(c.total_read_depth),
        tuple(c.allele_depths or []),
    )


def _force_scalar(det):
    det._call_indels = lambda *a, **k: det._call_indels_scalar(*a, **k)


@pytest.mark.parametrize("tandem", [False, True])
def test_batched_equals_scalar_classic(tandem):
    genome, reads = _simulate(5, tandem=tandem)
    aligner = ReadsAligner(genome)

    def align_all():
        out = []
        al = ReadsAligner(genome, table=aligner.table)
        for i in range(0, len(reads), 2048):
            for r in al.align_batch(reads[i : i + 2048]):
                out.extend(r)
        return out

    det_b = SingleSampleVariantsDetector(genome, sample_id="s1")
    batched = det_b.find_variants(align_all())

    det_s = SingleSampleVariantsDetector(genome, sample_id="s1")
    _force_scalar(det_s)
    scalar = det_s.find_variants(align_all())

    n_indel = sum(1 for r in batched if not r.variant.is_snv)
    assert n_indel > 10
    assert [_key(r) for r in batched] == [_key(r) for r in scalar]


def test_batched_equals_scalar_fused():
    genome, reads = _simulate(9, tandem=True)
    table = ReadsAligner(genome).table

    def run(scalar: bool):
        det = SingleSampleVariantsDetector(genome, sample_id="s1")
        if scalar:
            _force_scalar(det)
        pipe = AlignCallPipeline(
            genome,
            aligner=ReadsAligner(genome, table=table),
            detector=det,
            batch_size=2048,
        )
        return pipe.run_reads(reads)

    batched = run(False)
    scalar = run(True)
    n_indel = sum(1 for r in batched if not r.variant.is_snv)
    assert n_indel > 10
    assert [_key(r) for r in batched] == [_key(r) for r in scalar]

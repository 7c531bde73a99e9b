"""Multi-device tests: the PRODUCTION AlignCallPipeline under a mesh.

VERDICT r1 #1: shard read batches across devices, replicate the index,
psum-merge window counts, and prove the emitted VCF record list is
IDENTICAL for n_devices in {1, 2, 8} (conftest provides 8 CPU devices).
"""
import io

import jax
import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    ReadBlock,
)
from ngsepcore_tpu.distribute.mesh import make_reads_mesh
from ngsepcore_tpu.distribute.pipeline import ShardedAlignCallPipeline
from ngsepcore_tpu.simulation.individual_simulator import (
    SingleIndividualSimulator,
)
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator
from ngsepcore_tpu.vcf.io import VCFFileWriter


def _simulated_case(L=60000, n_reads=2500, seed=5):
    rng = np.random.default_rng(seed)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence(
            name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.001, indel_rate=0.0002, seed=3
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = ReadBlock.concatenate(
        [
            SingleReadsSimulator(
                hg, read_length=100, substitution_error_rate=0.003,
                seed=11 + h,
            ).simulate_block(n_reads // 2)
            for h, hg in enumerate(hap)
        ]
    )
    return genome, reads


def _render(records) -> list[str]:
    """Byte-level record lines: the strictest equality surface."""
    buf = io.StringIO()
    w = VCFFileWriter(buf, ["s"])
    for r in records:
        w.write(r)
    return buf.getvalue().splitlines()


@pytest.fixture(scope="module")
def case():
    genome, reads = _simulated_case()
    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome),
        detector=SingleSampleVariantsDetector(genome, sample_id="s"),
    )
    base = _render(pipe.run_reads(reads))
    assert len(base) > 20, "simulation produced too few variant records"
    return genome, reads, base


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_vcf_invariant_to_device_count(case, n_devices):
    genome, reads, base = case
    assert len(jax.devices()) >= n_devices
    mesh = make_reads_mesh(n_devices)
    pipe = ShardedAlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome),
        detector=SingleSampleVariantsDetector(genome, sample_id="s"),
        mesh=mesh,
    )
    got = _render(pipe.run_reads(reads))
    assert got == base


def test_sharded_seeding_runs_spmd(case):
    """The seeding upload is genuinely row-sharded over the mesh (not a
    replicated copy): every device holds 1/n of the batch rows."""
    genome, reads, _ = case
    mesh = make_reads_mesh(4)
    pipe = ShardedAlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome),
        detector=SingleSampleVariantsDetector(genome, sample_id="s"),
        mesh=mesh,
    )
    pq = np.zeros((512, 128), np.uint8)
    dev = pipe._put_reads(pq)
    shard_shapes = {s.data.shape for s in dev.addressable_shards}
    assert shard_shapes == {(128, 128)}

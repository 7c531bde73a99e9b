"""Fine-grained profiling inside the fused pipeline stages (not a test)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

GENOME_MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 300000
READ_LEN = 150
BATCH = 65536

times = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.time()
        r = fn(*a, **k)
        times[name] = times.get(name, 0.0) + time.time() - t0
        return r
    return wrap


def main():
    import jax

    import ngsepcore_tpu.call.fused_pipeline as fp
    import ngsepcore_tpu.call.pileup as pileup_mod
    import ngsepcore_tpu.call.realigner as realigner_mod
    import ngsepcore_tpu.kernels.genotyping as gt
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import (
        QualifiedSequence,
        QualifiedSequenceList,
    )
    from ngsepcore_tpu.core import sequences as seqmod
    from ngsepcore_tpu.simulation.individual_simulator import (
        SingleIndividualSimulator,
    )
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    rng = np.random.default_rng(2024)
    L = int(GENOME_MBP * 1e6)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)))
    genome = ReferenceGenome(seqs)

    sim = SingleIndividualSimulator(genome, snv_rate=0.001, indel_rate=0.0, seed=7)
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    from ngsepcore_tpu.core.sequences import ReadBlock
    reads = ReadBlock.concatenate(
        [
            SingleReadsSimulator(hg, read_length=READ_LEN, substitution_error_rate=0.003, seed=11 + h).simulate_block(N_READS // 2)
            for h, hg in enumerate(hap)
        ]
    )

    aligner = ReadsAligner(genome)
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector, batch_size=BATCH)
    _ = pipe.run_reads(reads)
    aligner.total_reads = aligner.aligned_reads = 0

    # fine instrumentation
    pileup_mod.expand_batch_calls = timed("expand_batch_calls", pileup_mod.expand_batch_calls)
    fp.expand_batch_calls = pileup_mod.expand_batch_calls
    realigner_mod.IndelRealigner.realign = timed("realigner", realigner_mod.IndelRealigner.realign)
    pipe._compact_fused = timed("compact_fused", pipe._compact_fused)
    pipe._seed_batch = timed("seed_dispatch(host)", pipe._seed_batch)
    pipe._classify_batch = timed("classify", pipe._classify_batch)
    pipe._joint_cap = timed("joint_cap", pipe._joint_cap)
    aligner._tier3_run = timed("tier3_dp", aligner._tier3_run)
    seqmod.pack_reads = timed("pack_reads", seqmod.pack_reads)
    fp.pack_reads = seqmod.pack_reads
    gt_span = gt.genotype_window_span
    gt.genotype_window_span = timed("window_dispatch", gt_span)
    gt.genotype_window_span_resolve_batch = timed(
        "window_fetch_batch", gt.genotype_window_span_resolve_batch
    )
    pipe._genotype = timed("genotype_stage", pipe._genotype)
    pipe._call = timed("call_stage", pipe._call)
    import jax as _jax
    _jax.device_get = timed("device_get_all", _jax.device_get)
    import importlib
    # fused_pipeline imports these inside functions, so module-level patch works

    t0 = time.time()
    records = pipe.run_reads(reads)
    total = time.time() - t0
    print(f"TOTAL: {total:.2f}s  ({len(reads)/total:.0f} reads/s)  variants={len(records)}")
    for k, v in sorted(times.items(), key=lambda x: -x[1]):
        print(f"  {k:28s} {v:7.3f}s  {100*v/total:5.1f}%")
    print(f"  (rest = host bits + overlap)")


main()

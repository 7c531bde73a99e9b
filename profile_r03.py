"""Profile the honest bench workload with the in-framework stage ledger.

Mirrors bench.py's workload exactly (repeat genome + indels) at a
configurable read count; prints the stage table that PROFILE_r03.txt
captures.  Usage: python profile_r03.py [n_reads] [genome_mbp]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
GENOME_MBP = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
READ_LEN = 150
BATCH = 65536


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_repeat_genome

    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import (
        QualifiedSequence,
        QualifiedSequenceList,
        ReadBlock,
    )
    from ngsepcore_tpu.simulation.individual_simulator import (
        SingleIndividualSimulator,
    )
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator
    from ngsepcore_tpu.utils import profiling

    t0 = time.time()
    rng = np.random.default_rng(2024)
    L = int(GENOME_MBP * 1e6)
    codes, repeat_iv = build_repeat_genome(rng, L)
    print(f"[prof] genome: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)

    t1 = time.time()
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.001, indel_rate=0.0001, seed=7
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = ReadBlock.concatenate(
        [
            SingleReadsSimulator(
                hg, read_length=READ_LEN, substitution_error_rate=0.003,
                seed=11 + h,
            ).simulate_block(N_READS // 2)
            for h, hg in enumerate(hap)
        ]
    )
    print(f"[prof] sim: {time.time()-t1:.1f}s", file=sys.stderr, flush=True)

    t2 = time.time()
    aligner = ReadsAligner(genome)
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector,
                             batch_size=BATCH)
    print(f"[prof] index: {time.time()-t2:.1f}s", file=sys.stderr, flush=True)

    t3 = time.time()
    records = pipe.run_reads(reads)
    print(f"[prof] warmup: {time.time()-t3:.1f}s  records={len(records)}",
          file=sys.stderr, flush=True)

    profiling.enable(True)
    profiling.reset()
    aligner.total_reads = aligner.aligned_reads = 0
    t4 = time.time()
    records = pipe.run_reads(reads)
    total = time.time() - t4
    print(f"[prof] timed run: {total:.2f}s  ({len(reads)/total:.0f} reads/s)"
          f"  variants={len(records)}", file=sys.stderr, flush=True)
    profiling.report(fh=sys.stdout)


main()

"""cProfile the honest-bench timed run (post-warmup) at reduced scale."""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
GENOME_MBP = 12.0
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

    rng = np.random.default_rng(2024)
    L = int(GENOME_MBP * 1e6)
    codes, repeat_iv = build_repeat_genome(rng, L)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)

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
    print("sim done", file=sys.stderr, flush=True)

    aligner = ReadsAligner(genome)
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector,
                             batch_size=BATCH)
    records = pipe.run_reads(reads)
    print(f"warmup done: {len(records)}", file=sys.stderr, flush=True)

    aligner.total_reads = aligner.aligned_reads = 0
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    records = pipe.run_reads(reads)
    pr.disable()
    total = time.time() - t0
    print(f"timed: {total:.2f}s ({len(reads)/total:.0f} reads/s)",
          file=sys.stderr, flush=True)
    st = pstats.Stats(pr, stream=sys.stdout)
    st.sort_stats("cumulative").print_stats(50)
    st.sort_stats("tottime").print_stats(40)


main()

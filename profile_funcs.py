"""cProfile the bench workload's timed run; print top functions.

Usage: python profile_funcs.py [n_reads]
"""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000


def main():
    import os

    import jax

    from ngsepcore_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    import bench
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector

    genome, repeat_iv, reads, *_ = bench.load_or_simulate()
    if N_READS < len(reads):
        h = len(reads) // 2
        k = N_READS // 2
        idx = np.concatenate([np.arange(k), h + np.arange(N_READS - k)])
        reads = reads[0:0].__class__(
            reads.codes[idx], reads.lengths[idx],
            None if reads.quals is None else reads.quals[idx],
        )
    aligner = ReadsAligner(genome, table=bench.load_or_build_index(genome))
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector,
                             batch_size=bench.BATCH)
    t0 = time.time()
    records = pipe.run_reads(reads)
    print(f"[prof] warmup {time.time()-t0:.1f}s records={len(records)}",
          file=sys.stderr, flush=True)
    aligner.total_reads = aligner.aligned_reads = 0
    pr = cProfile.Profile()
    t1 = time.time()
    pr.enable()
    records = pipe.run_reads(reads)
    pr.disable()
    print(f"[prof] timed {time.time()-t1:.1f}s records={len(records)}",
          file=sys.stderr, flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(60)
    st.sort_stats("tottime").print_stats(50)
    st.print_callers("_methods.py:99")  # np.clip's worker: find big callers
    st.print_callers("read_alignment.py:219")  # indel_calls callers


main()

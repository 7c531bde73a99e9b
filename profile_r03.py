"""Profile the honest bench workload with the in-framework stage ledger.

Reuses bench.py's cached inputs/index; prints the stage table that
PROFILE_r03.txt captures.  Usage: python profile_r03.py [n_reads]
"""
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
    from ngsepcore_tpu.utils import profiling

    t0 = time.time()
    genome, repeat_iv, reads, *_ = bench.load_or_simulate()
    if N_READS < len(reads):
        # keep both haplotypes represented: interleave halves
        h = len(reads) // 2
        k = N_READS // 2
        idx = np.concatenate([np.arange(k), h + np.arange(N_READS - k)])
        reads = reads[0:0].__class__(
            reads.codes[idx], reads.lengths[idx],
            None if reads.quals is None else reads.quals[idx],
        )
    print(f"[prof] inputs: {time.time()-t0:.1f}s ({len(reads)} reads)",
          file=sys.stderr, flush=True)

    t2 = time.time()
    aligner = ReadsAligner(genome, table=bench.load_or_build_index(genome))
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector,
                             batch_size=bench.BATCH)
    print(f"[prof] index: {time.time()-t2:.1f}s", file=sys.stderr, flush=True)

    profiling.enable(True)
    t3 = time.time()
    records = pipe.run_reads(reads)
    print(f"[prof] warmup: {time.time()-t3:.1f}s  records={len(records)}",
          file=sys.stderr, flush=True)
    profiling.report(fh=sys.stderr)

    profiling.reset()
    aligner.total_reads = aligner.aligned_reads = 0
    t4 = time.time()
    records = pipe.run_reads(reads)
    total = time.time() - t4
    print(f"[prof] timed run: {total:.2f}s  ({len(reads)/total:.0f} reads/s)"
          f"  variants={len(records)}", file=sys.stderr, flush=True)
    profiling.report(fh=sys.stdout)


main()

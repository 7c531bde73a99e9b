"""Stage-level profiling of the fused align+call pipeline (not a test)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

GENOME_MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
READ_LEN = 150
BATCH = 32768


def main():
    import jax

    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
    from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    rng = np.random.default_rng(2024)
    L = int(GENOME_MBP * 1e6)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)))
    genome = ReferenceGenome(seqs)

    t = time.time()
    sim = SingleIndividualSimulator(genome, snv_rate=0.001, indel_rate=0.0, seed=7)
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = []
    for h, hg in enumerate(hap):
        reads.extend(SingleReadsSimulator(hg, read_length=READ_LEN, substitution_error_rate=0.003, seed=11 + h).simulate(N_READS // 2))
    print(f"sim: {time.time()-t:.2f}s")

    t = time.time()
    aligner = ReadsAligner(genome)
    pipe = AlignCallPipeline(genome, aligner=aligner,
                             detector=SingleSampleVariantsDetector(genome, sample_id="bench"),
                             batch_size=BATCH)
    _ = pipe.run_reads(reads[: BATCH + 128])
    print(f"warmup(index build + compiles): {time.time()-t:.2f}s")
    aligner.total_reads = aligner.aligned_reads = 0

    # instrumented run: monkeypatch stage boundaries
    import ngsepcore_tpu.call.fused_pipeline as fp

    times = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            times[name] = times.get(name, 0.0) + time.time() - t0
            return r
        return wrap

    pipe._seed_batch = timed("seed_dispatch", pipe._seed_batch)
    pipe._classify_batch = timed("classify(+device_get)", pipe._classify_batch)
    pipe._call = timed("call_total", pipe._call)
    pipe._genotype = timed("genotype", pipe._genotype)
    aligner._tier3_run = timed("tier3_dp", aligner._tier3_run)

    t0 = time.time()
    records = pipe.run_reads(reads)
    total = time.time() - t0
    times["call_total"] -= times.get("genotype", 0)
    print(f"TOTAL: {total:.2f}s  ({len(reads)/total:.0f} reads/s)  variants={len(records)}")
    for k, v in sorted(times.items(), key=lambda x: -x[1]):
        print(f"  {k:28s} {v:7.3f}s  {100*v/total:5.1f}%")
    other = total - sum(v for k, v in times.items() if k != "call_total")
    print(f"  {'(unattributed)':28s} {other:7.3f}s")


main()

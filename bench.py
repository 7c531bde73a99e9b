"""Benchmark: reads aligned + genotyped per second per chip.

Runs the flagship pipeline (simulate yeast-scale data -> minimizer index ->
batched align -> pileup genotyping) on the available accelerator and prints
ONE JSON line.

Baseline note (see BASELINE.md): the reference publishes no numbers and no
JVM exists in this image, so the Java throughput cannot be measured here.
`vs_baseline` is computed against JAVA_BASELINE_READS_PER_S, a documented
assumption standing in for NGSEP 4.3.2 single-node align+genotype
throughput until a measured number replaces it.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

JAVA_BASELINE_READS_PER_S = 5000.0  # assumed Java align+genotype throughput

GENOME_MBP = 12.0  # yeast-genome scale (S. cerevisiae ~12 Mbp)
N_READS = 300000
READ_LEN = 150
BATCH = 65536  # big batches amortize fixed per-program costs (link round
# trips, kernel tails); 64k x 256 intermediates still fit HBM comfortably


def main() -> None:
    import ngsepcore_tpu  # noqa: F401
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
    from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    rng = np.random.default_rng(2024)
    L = int(GENOME_MBP * 1e6)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence(
            name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)
        )
    )
    genome = ReferenceGenome(seqs)

    from ngsepcore_tpu.core.sequences import ReadBlock

    sim = SingleIndividualSimulator(genome, snv_rate=0.001, indel_rate=0.0, seed=7)
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = ReadBlock.concatenate(
        [
            SingleReadsSimulator(
                hg, read_length=READ_LEN, substitution_error_rate=0.003, seed=11 + h
            ).simulate_block(N_READS // 2)
            for h, hg in enumerate(hap)
        ]
    )

    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline

    aligner = ReadsAligner(genome)
    detector = SingleSampleVariantsDetector(genome, sample_id="bench")
    pipe = AlignCallPipeline(genome, aligner=aligner, detector=detector,
                             batch_size=BATCH)

    # warmup: one full identical run compiles every bucketed shape the
    # timed run will hit (row buckets of the window spans depend on the
    # whole read set, so a partial warmup would leave compiles in the
    # timed region)
    _ = pipe.run_reads(reads)
    aligner.total_reads = aligner.aligned_reads = 0

    t0 = time.time()
    records = pipe.run_reads(reads)
    total = time.time() - t0
    rps = len(reads) / total
    result = {
        "metric": "yeast-scale WGS reads aligned+genotyped/s/chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / JAVA_BASELINE_READS_PER_S, 3),
        "detail": {
            "n_reads": len(reads),
            "total_s": round(total, 2),
            "aligned": aligner.aligned_reads,
            "variants_called": len(records),
            "genome_mbp": GENOME_MBP,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

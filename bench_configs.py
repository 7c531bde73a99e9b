"""Per-config perf table (VERDICT r3 #7): BASELINE.json configs #1 and #5.

Times (on the current accelerator):
  #1 KmersExtractor k=15 spectrum over the cached 12 Mbp bench genome
     (both strands), metric = bases counted / s
  #5 Multi-sample joint genotyping + read-depth CNV over 3 pooled
     samples on a 2 Mbp slice, metric = reads aligned+joint-genotyped / s

Prints one JSON line per config; results recorded in PROFILE_r04.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")


def bench_kmers(genome) -> dict:
    from ngsepcore_tpu.index.kmers_extractor import KmersExtractor

    codes = genome.sequences[0].codes
    L = len(codes)

    def run():
        ex = KmersExtractor(kmer_length=15, batch_size=64)
        # feed the genome as 1 Mbp chunks (the extractor packs rows)
        chunk = 1 << 20
        rows = [codes[i : i + chunk] for i in range(0, L, chunk)]
        lens = np.array([len(r) for r in rows], np.int64)
        m = np.full((len(rows), chunk), 4, np.int8)
        for i, r in enumerate(rows):
            m[i, : len(r)] = r
        ex._count_packed(m, lens)
        return ex

    t0 = time.time()
    ex = run()
    warm = time.time() - t0
    t0 = time.time()
    ex = run()
    dt = time.time() - t0
    n_kmers = len(ex.kmers_map)
    return {
        "config": "#1 KmersExtractor k=15 spectrum, 12 Mbp genome (both strands)",
        "wall_s": round(dt, 2),
        "warmup_s": round(warm, 2),
        "bases_per_s": round(L / dt, 0),
        "distinct_kmers": n_kmers,
    }


def bench_multisample(genome_codes) -> dict:
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.multisample import MultisampleVariantsDetector
    from ngsepcore_tpu.call.read_depth import ReadDepthDistribution
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

    L = 1_000_000
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=genome_codes[:L].copy()))
    genome = ReferenceGenome(seqs)
    aligner0 = ReadsAligner(genome)
    n_samples = 3
    cov = 6
    n_reads = L * cov // 150
    sample_reads = []
    for s in range(n_samples):
        sim = SingleIndividualSimulator(
            genome, snv_rate=0.001, indel_rate=0.0001, seed=50 + s
        )
        sim.simulate()
        hap = sim.build_haplotype_genomes()
        sample_reads.append(
            ReadBlock.concatenate(
                [
                    SingleReadsSimulator(
                        hg, read_length=150, substitution_error_rate=0.003,
                        seed=60 + 10 * s + h,
                    ).simulate_block(n_reads // 2)
                    for h, hg in enumerate(hap)
                ]
            )
        )
    total_reads = sum(len(r) for r in sample_reads)

    def run():
        per_sample = []
        for reads in sample_reads:
            al = ReadsAligner(genome, table=aligner0.table)
            alns = []
            for i in range(0, len(reads), 32768):
                for r in al.align_batch(reads[i : i + 32768]):
                    alns.extend(r)
            per_sample.append(alns)
        det = MultisampleVariantsDetector(genome)
        records = det.find_variants(
            per_sample, [f"s{i}" for i in range(n_samples)]
        )
        # read-depth CNV over the pooled alignments (config #5's CNV leg)
        rdd = ReadDepthDistribution(genome)
        for alns in per_sample:
            rdd.process_alignments(alns)
        return records

    t0 = time.time()
    records = run()
    warm = time.time() - t0
    t0 = time.time()
    records = run()
    dt = time.time() - t0
    return {
        "config": f"#5 multi-sample joint genotyping + CNV read depth "
                  f"({n_samples} samples x {cov}x, {L / 1e6:g} Mbp)",
        "wall_s": round(dt, 2),
        "warmup_s": round(warm, 2),
        "reads_per_s": round(total_reads / dt, 0),
        "n_reads": total_reads,
        "variants": len(records),
    }


def main() -> None:
    from ngsepcore_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    import bench

    genome, _, _, *_ = bench.load_or_simulate()
    for fn in (lambda: bench_kmers(genome),
               lambda: bench_multisample(genome.sequences[0].codes)):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()

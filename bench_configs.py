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


def bench_long_reads(genome_codes) -> dict:
    """Long-read alignment at scale (PACBIO error profile): 600 x 10 kb
    reads (~2 Mbp queried) against a 4 Mbp reference."""
    from ngsepcore_tpu.align.long_reads import LongReadsAligner
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import (
        QualifiedSequence,
        QualifiedSequenceList,
    )
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    L = 4_000_000
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=genome_codes[:L].copy()))
    genome = ReferenceGenome(seqs)
    sim = SingleReadsSimulator(
        genome, read_length=10_000, substitution_error_rate=0.01,
        indel_error_rate=0.01, seed=77,
    )
    reads = sim.simulate(600)
    aligner = LongReadsAligner(genome)

    def run():
        al = LongReadsAligner(genome, table=aligner.table)
        alns = []
        for i in range(0, len(reads), 128):
            for group in al.align_batch(reads[i : i + 128]):
                alns.extend(group)
        return al, alns

    t0 = time.time()
    run()
    warm = time.time() - t0
    t0 = time.time()
    al, alns = run()
    dt = time.time() - t0
    bases = sum(len(r.codes) for r in reads)
    return {
        "config": "long reads: 600 x 10 kb PACBIO (1% sub + 1% indel) vs 4 Mbp",
        "wall_s": round(dt, 2),
        "warmup_s": round(warm, 2),
        "reads_per_s": round(len(reads) / dt, 1),
        "query_mbp_per_s": round(bases / dt / 1e6, 2),
        "aligned_frac": round(al.aligned_reads / max(al.total_reads, 1), 4),
    }


def bench_assembler(genome_codes) -> dict:
    """OLC assembly timing; reports genome bases assembled per second and
    N50.  Scale note (r4): 40x/120 kb ran >8 min of warmup on this chip
    — the overlap+layout host path is quadratic-ish in read count and is
    on the round-5 agenda; this config is sized to capture a number, and
    the slowness at scale is the recorded finding."""
    from ngsepcore_tpu.assembly.assembler import Assembler, n_statistics
    from ngsepcore_tpu.core.sequences import reverse_complement_codes

    rng = np.random.default_rng(31)
    L = 30_000
    g = genome_codes[:L]
    n, rl = L * 15 // 2500, 2500
    reads = []
    starts = rng.integers(0, L - rl, size=n)
    flips = rng.random(n) < 0.5
    for s, f in zip(starts, flips):
        codes = g[s : s + rl].copy()
        errs = rng.random(rl) < 0.01
        idx = np.nonzero(errs)[0]
        codes[idx] = (codes[idx] + rng.integers(1, 4, size=len(idx)).astype(np.int8)) % 4
        reads.append(reverse_complement_codes(codes) if f else codes)

    def run():
        return Assembler().assemble(reads)

    t0 = time.time()
    run()
    warm = time.time() - t0
    t0 = time.time()
    contigs = run()
    dt = time.time() - t0
    lens = [len(c) for c in contigs]
    n50 = n_statistics(lens).get("N50", 0) if lens else 0
    return {
        "config": "assembler: 15x of 2.5 kb reads (1% error), 30 kb genome, 1 polish round",
        "wall_s": round(dt, 2),
        "warmup_s": round(warm, 2),
        "genome_bases_per_s": round(L / dt, 0),
        "n_contigs": len(lens),
        "n50": int(n50),
        "longest_frac": round(max(lens) / L, 3) if lens else 0.0,
    }


def main() -> None:
    from ngsepcore_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    import bench

    genome, _, _, *_ = bench.load_or_simulate()
    for fn in (lambda: bench_kmers(genome),
               lambda: bench_multisample(genome.sequences[0].codes),
               lambda: bench_long_reads(genome.sequences[0].codes),
               lambda: bench_assembler(genome.sequences[0].codes)):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()

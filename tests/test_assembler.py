import numpy as np
import pytest

from ngsepcore_tpu.assembly.assembler import Assembler, n_statistics
from ngsepcore_tpu.core.sequences import (
    decode_dna,
    encode_dna,
    reverse_complement_codes,
)


def _simulate_long_reads(genome: str, n, read_len, rng, error_rate=0.0):
    reads = []
    for _ in range(n):
        s = int(rng.integers(0, len(genome) - read_len))
        codes = encode_dna(genome[s : s + read_len]).copy()
        if error_rate > 0:
            errs = rng.random(read_len) < error_rate
            idx = np.nonzero(errs)[0]
            shift = rng.integers(1, 4, size=len(idx)).astype(np.int8)
            codes[idx] = (codes[idx] + shift) % 4
        if rng.random() < 0.5:
            codes = reverse_complement_codes(codes)
        reads.append(codes)
    return reads


def test_assembles_single_contig():
    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=30000))
    reads = _simulate_long_reads(genome, 120, 2500, rng)
    asm = Assembler()
    contigs = asm.assemble(reads)
    assert len(contigs) >= 1
    longest = contigs[0]
    # the longest contig should cover most of the genome
    assert len(longest) > 0.85 * len(genome)
    # and be a faithful reconstruction: sampled 200-mers of the contig must
    # occur in the genome (either strand)
    text = decode_dna(longest.codes)
    from ngsepcore_tpu.core.sequences import reverse_complement

    g2 = genome + "#" + reverse_complement(genome)
    for off in range(0, len(text) - 200, 2000):
        assert text[off : off + 200] in g2, f"contig chunk at {off} not in genome"


def test_embedded_reads_removed():
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGT"), size=12000))
    long_reads = _simulate_long_reads(genome, 40, 3000, rng)
    short_embedded = _simulate_long_reads(genome, 20, 600, rng)
    asm = Assembler()
    graph = asm.build_graph(long_reads + short_embedded)
    # most short reads should be marked embedded in some long read
    emb_short = sum(1 for r in graph.embedded if r >= 40)
    assert emb_short >= 12, f"only {emb_short} short reads embedded"


def test_n_statistics():
    s = n_statistics([100, 200, 300, 400])
    assert s["total"] == 1000
    assert s["N50"] == 300
    assert s["max"] == 400


def test_assembly_with_errors():
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), size=20000))
    reads = _simulate_long_reads(genome, 100, 2000, rng, error_rate=0.005)
    asm = Assembler()
    contigs = asm.assemble(reads)
    stats = n_statistics([len(c) for c in contigs])
    assert stats["max"] > 0.6 * len(genome)

"""Consensus polishing, contig end merging and circularization."""
import numpy as np

from ngsepcore_tpu.assembly.assembler import Assembler
from ngsepcore_tpu.assembly.polishing import (
    circularize,
    detect_end_overlap,
    merge_contig_ends,
    polish_contigs,
)
from ngsepcore_tpu.core.sequences import (
    RawRead,
    decode_dna,
    encode_dna,
    reverse_complement_codes,
)


def _reads_from(genome: str, n, read_len, rng, error_rate=0.0):
    reads = []
    for i in range(n):
        s = int(rng.integers(0, len(genome) - read_len))
        codes = encode_dna(genome[s : s + read_len]).copy()
        if error_rate > 0:
            idx = np.nonzero(rng.random(read_len) < error_rate)[0]
            shift = rng.integers(1, 4, size=len(idx)).astype(np.int8)
            codes[idx] = (codes[idx] + shift) % 4
        if rng.random() < 0.5:
            codes = reverse_complement_codes(codes)
        reads.append(RawRead(name=f"r{i}", sequence=decode_dna(codes)))
    return reads


def test_polish_fixes_draft_errors():
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=15000))
    truth = encode_dna(genome)
    # draft with 1% substitution errors
    draft = truth.copy()
    idx = np.nonzero(rng.random(len(draft)) < 0.01)[0]
    draft[idx] = (draft[idx] + rng.integers(1, 4, len(idx))) % 4
    errs_before = int(np.count_nonzero(draft != truth))
    reads = _reads_from(genome, 120, 2500, rng, error_rate=0.003)
    polished, corrections = polish_contigs([draft], reads, rounds=1)
    assert corrections > 0
    p = polished[0]
    assert len(p) == len(truth)
    errs_after = int(np.count_nonzero(p != truth))
    assert errs_after < 0.1 * errs_before, (errs_before, errs_after)


def test_polish_fixes_draft_indels():
    rng = np.random.default_rng(8)
    genome = "".join(rng.choice(list("ACGT"), size=12000))
    truth = encode_dna(genome)
    # draft with a 2bp deletion and a 1bp spurious insertion
    draft = np.concatenate(
        [truth[:4000], truth[4002:8000], encode_dna("A"), truth[8000:]]
    )
    reads = _reads_from(genome, 150, 2500, rng, error_rate=0.002)
    polished, corrections = polish_contigs([draft], reads, rounds=2)
    p = polished[0]
    assert abs(len(p) - len(truth)) <= 1, (len(p), len(truth))
    # sampled windows of the polished contig must exist in the genome
    text = decode_dna(p)
    for off in range(0, len(text) - 200, 1500):
        assert text[off : off + 200] in genome, off


def test_detect_end_overlap_and_merge():
    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=20000))
    g = encode_dna(genome)
    a, b = g[:12000], g[10500:]
    ov = detect_end_overlap(a, b)
    assert ov is not None and abs(ov - 1500) < 64
    merged = merge_contig_ends([a, b])
    assert len(merged) == 1
    assert abs(len(merged[0]) - len(g)) < 64
    # reverse-orientation merge
    merged2 = merge_contig_ends([a, reverse_complement_codes(b)])
    assert len(merged2) == 1


def test_circularize_trims_duplicated_end():
    rng = np.random.default_rng(10)
    core = rng.integers(0, 4, 30000).astype(np.int8)
    circ = np.concatenate([core, core[:2000]])
    trimmed, was = circularize(circ)
    assert was
    assert abs(len(trimmed) - len(core)) < 64
    lin, was2 = circularize(core)
    assert not was2
    assert len(lin) == len(core)


def test_assembler_with_polish_and_circular():
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), size=25000))
    reads = []
    for i in range(120):
        s = int(rng.integers(0, len(genome) - 2500))
        codes = encode_dna(genome[s : s + 2500]).copy()
        idx = np.nonzero(rng.random(2500) < 0.005)[0]
        codes[idx] = (codes[idx] + rng.integers(1, 4, len(idx))) % 4
        if rng.random() < 0.5:
            codes = reverse_complement_codes(codes)
        reads.append(codes)
    asm = Assembler(polish_rounds=1)
    contigs = asm.assemble(reads)
    text = decode_dna(contigs[0].codes)
    from ngsepcore_tpu.core.sequences import reverse_complement

    g2 = genome + "#" + reverse_complement(genome)
    hits = sum(
        1
        for off in range(0, len(text) - 300, 1000)
        if text[off : off + 300] in g2
    )
    windows = len(range(0, len(text) - 300, 1000))
    assert hits >= 0.9 * windows, f"{hits}/{windows}"


def test_diploid_phased_assembly():
    rng = np.random.default_rng(12)
    hap0 = "".join(rng.choice(list("ACGT"), size=20000))
    h0 = encode_dna(hap0)
    # hap1: ~1 SNV per 300bp
    h1 = h0.copy()
    idx = np.arange(150, len(h1) - 150, 300)
    h1[idx] = (h1[idx] + 1) % 4
    reads = []
    for hap in (h0, h1):
        for _ in range(80):
            s = int(rng.integers(0, len(hap) - 3000))
            codes = hap[s : s + 3000].copy()
            e = np.nonzero(rng.random(3000) < 0.003)[0]
            codes[e] = (codes[e] + rng.integers(1, 4, len(e))) % 4
            if rng.random() < 0.5:
                codes = reverse_complement_codes(codes)
            reads.append(codes)
    asm = Assembler(ploidy=2, polish_rounds=1)
    contigs = asm.assemble(reads)
    names = [s.name for s in contigs]
    assert any("hap0" in n for n in names) and any("hap1" in n for n in names)

    from ngsepcore_tpu.core.sequences import reverse_complement

    t0 = hap0 + "#" + reverse_complement(hap0)
    hap1_text = decode_dna(h1)
    t1 = hap1_text + "#" + reverse_complement(hap1_text)

    def window_hits(codes, text):
        s = decode_dna(codes)
        wins = range(0, max(1, len(s) - 300), 400)
        return sum(1 for off in wins if s[off : off + 300] in text), len(wins)

    # each haplotype assembly's largest contig should match one haplotype
    # clearly better than the other (every 300bp window spans >=1 het SNV)
    seen_pref = set()
    for h in (0, 1):
        cs = [s.codes for s in contigs if f"hap{h}" in s.name]
        assert cs, f"no contigs for hap{h}"
        big = max(cs, key=len)
        assert len(big) > 0.6 * len(h0)
        n0, w = window_hits(big, t0)
        n1, _ = window_hits(big, t1)
        assert max(n0, n1) >= 0.7 * w, (n0, n1, w)
        assert max(n0, n1) > 2 * min(n0, n1), (n0, n1)
        seen_pref.add(0 if n0 > n1 else 1)
    assert seen_pref == {0, 1}, seen_pref

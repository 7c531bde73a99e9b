"""Assembler depth (VERDICT r1 #5): MST KruskalPath layout, relationship
scoring/filtering, chimera-read removal, assembly-graph serialization."""
import numpy as np
import pytest

from ngsepcore_tpu.assembly.assembler import Assembler
from ngsepcore_tpu.assembly.graph import AssemblyGraph
from ngsepcore_tpu.assembly.layout import (
    LayoutBuilderGreedy,
    LayoutBuilderKruskalPath,
)
from ngsepcore_tpu.core.sequences import (
    decode_dna,
    reverse_complement,
    reverse_complement_codes,
)


def _repeat_genome(seed=42, L=40000, rep_len=2000):
    """Backbone with one 2kb repeat implanted at two distant loci at ~97%
    identity — the classic misassembly trap for greedy layouts."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, L).astype(np.int8)
    rep = codes[8000 : 8000 + rep_len].copy()
    cp = rep.copy()
    nmut = int(0.03 * rep_len)
    mpos = rng.choice(rep_len, nmut, replace=False)
    cp[mpos] = (cp[mpos] + rng.integers(1, 4, nmut)) % 4
    codes[28000 : 28000 + rep_len] = cp
    return codes


def _sim_reads(genome, n=220, read_len=3000, err=0.002, seed=9):
    rng = np.random.default_rng(seed)
    reads = []
    for _ in range(n):
        s = int(rng.integers(0, len(genome) - read_len))
        codes = genome[s : s + read_len].copy()
        e = np.nonzero(rng.random(read_len) < err)[0]
        codes[e] = (codes[e] + rng.integers(1, 4, len(e))) % 4
        if rng.random() < 0.5:
            codes = reverse_complement_codes(codes)
        reads.append(codes)
    return reads


def test_kruskal_reconstructs_repeat_genome():
    genome = _repeat_genome()
    reads = _sim_reads(genome)
    asm = Assembler(polish_rounds=1)
    contigs = asm.assemble(reads)
    lengths = sorted((len(s.codes) for s in contigs), reverse=True)
    # the repeat must not fragment the assembly: nearly all sequence in
    # <= 2 contigs, the largest covering most of the genome
    assert lengths[0] > 0.8 * len(genome), lengths[:5]
    assert sum(lengths[:2]) > 0.9 * len(genome), lengths[:5]
    # and the largest contig really is the genome (not a repeat collapse):
    # sample windows must be found in the reference text
    text = decode_dna(genome)
    full = text + "#" + reverse_complement(text)
    big = decode_dna(max((s.codes for s in contigs), key=len))
    hits = sum(
        1 for off in range(0, len(big) - 500, 1000) if big[off : off + 500] in full
    )
    wins = len(range(0, len(big) - 500, 1000))
    assert hits >= 0.9 * wins


def test_chimera_reads_detected_and_removed():
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 30000).astype(np.int8)
    reads = _sim_reads(genome, n=150, seed=5)
    # chimeric reads: two distant 1.5kb segments joined
    chimeras = []
    for i in range(6):
        a = int(rng.integers(0, 8000))
        b = int(rng.integers(18000, 26000))
        chimeras.append(
            np.concatenate([genome[a : a + 1500], genome[b : b + 1500]])
        )
    all_reads = reads + chimeras
    asm = Assembler(polish_rounds=0)
    g = asm.build_graph(all_reads)
    g.remove_chimeric_reads()
    chim_ids = set(range(len(reads), len(all_reads)))
    found = g.chimeric & chim_ids
    assert len(found) >= 4, f"only {len(found)} of 6 chimeras flagged"
    # genuine reads overwhelmingly survive
    false_pos = g.chimeric - chim_ids
    assert len(false_pos) <= 0.05 * len(reads), f"{len(false_pos)} false chimeras"


def test_relationship_scores_and_filtering():
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 20000).astype(np.int8)
    reads = _sim_reads(genome, n=120, read_len=2500, seed=6)
    asm = Assembler(polish_rounds=0)
    g = asm.build_graph(reads)
    assert g.edges, "no overlap edges built"
    e = g.edges[0]
    assert e.csk > 0 and 0 < e.ev_prop <= 1.0
    g.update_scores()
    assert all(ed.score > 0 for ed in g.edges)
    assert any(ed.cost > 0 for ed in g.edges)
    n_before = len(g.edges)
    g.filter_edges_and_embedded(0.5)
    assert 0 < len(g.edges) <= n_before


def test_graph_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(13)
    genome = rng.integers(0, 4, 15000).astype(np.int8)
    reads = _sim_reads(genome, n=80, read_len=2500, seed=8)
    asm = Assembler(polish_rounds=0)
    g = asm.build_graph(reads)
    g.remove_chimeric_reads()
    g.update_scores()
    path = str(tmp_path / "asm.graph.gz")
    g.save(path)
    g2 = AssemblyGraph.load(path)
    assert g2.n_reads == g.n_reads
    assert g2.read_lengths == g.read_lengths
    assert len(g2.edges) == len(g.edges)
    assert len(g2.embedded) == len(g.embedded)
    for a, b in zip(g.edges, g2.edges):
        assert a.key() == b.key()
        assert a.overlap == b.overlap
        assert a.csk == b.csk
        assert a.score == pytest.approx(b.score)
        assert a.ikbp == pytest.approx(b.ikbp, abs=1e-6)
    # resume-from-checkpoint path produces the same contigs
    asm2 = Assembler(polish_rounds=0, graph_file=path)
    c_resumed = asm2.assemble(reads)
    asm3 = Assembler(polish_rounds=0)
    c_fresh = asm3.assemble(reads)
    assert [len(s.codes) for s in c_resumed] == [len(s.codes) for s in c_fresh]


def test_layout_kruskal_vs_greedy_paths():
    """Both builders produce valid disjoint paths over the same graph."""
    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, 20000).astype(np.int8)
    reads = _sim_reads(genome, n=100, read_len=2500, seed=4)
    asm = Assembler(polish_rounds=0)
    g = asm.build_graph(reads)
    g.update_scores()
    g.filter_edges_and_embedded(0.5)
    for builder in (LayoutBuilderKruskalPath(), LayoutBuilderGreedy()):
        paths = builder.find_paths(g)
        seen = set()
        for p in paths:
            assert len(p.overlaps) == len(p.reads) - 1
            for r, _rev in p.reads:
                assert r not in seen, "read appears in two paths"
                seen.add(r)
        assert seen == set(g.active_reads())

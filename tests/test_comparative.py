import numpy as np
import pytest

from ngsepcore_tpu.genome.homologs import (
    HomologRelationshipsFinder,
    calculate_orthogroups,
)
from ngsepcore_tpu.genome.synteny import find_synteny_blocks
from ngsepcore_tpu.graphs.components import (
    maximal_cliques,
    strongly_connected_components,
)
from ngsepcore_tpu.graphs.mcl import mcl_cluster


def test_scc():
    # 0->1->2->0 cycle; 3->4
    adj = [[1], [2], [0], [4], []]
    comps = strongly_connected_components(adj)
    comp_sets = [set(c) for c in comps]
    assert {0, 1, 2} in comp_sets
    assert {3} in comp_sets and {4} in comp_sets


def test_maximal_cliques():
    n = 5
    adj = np.zeros((n, n), bool)
    for a, b in [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]:
        adj[a, b] = adj[b, a] = True
    cliques = maximal_cliques(adj)
    assert [0, 1, 2] in cliques
    assert [3, 4] in cliques


def test_mcl_two_clusters():
    n = 6
    sim = np.zeros((n, n), np.float32)
    for a, b in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
        sim[a, b] = sim[b, a] = 10.0
    sim[2, 3] = sim[3, 2] = 0.5  # weak bridge
    clusters = mcl_cluster(sim)
    sets = [set(c) for c in clusters if len(c) > 1]
    assert {0, 1, 2} in sets
    assert {3, 4, 5} in sets


def _mutate(rng, s, rate=0.05):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = rng.choice(list("ARNDCQEGHILKMFPSTWYV"))
    return "".join(out)


def test_homologs_and_orthogroups():
    rng = np.random.default_rng(3)
    fam1 = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), size=200))
    fam2 = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), size=200))
    seqs = [
        fam1, _mutate(rng, fam1), _mutate(rng, fam1),
        fam2, _mutate(rng, fam2),
    ]
    rels = HomologRelationshipsFinder().find_homologs(seqs)
    pairs = {(r.seq1, r.seq2) for r in rels}
    assert (0, 1) in pairs and (0, 2) in pairs and (3, 4) in pairs
    assert not any((a in (0, 1, 2)) != (b in (0, 1, 2)) for a, b in pairs)
    groups = calculate_orthogroups(seqs)
    sets = [set(g) for g in groups]
    assert {0, 1, 2} in sets
    assert {3, 4} in sets


def test_synteny_blocks():
    # genome1: genes g0..g9 on chrA at 1000*i; genome2 same order = 1 block
    gp1 = [("chrA", 1000 * i) for i in range(10)]
    gp2 = [("chr1", 500 * i) for i in range(10)]
    pairs = [(i, i) for i in range(10)]
    blocks = find_synteny_blocks(gp1, gp2, pairs)
    assert len(blocks) == 1
    b = blocks[0]
    assert b.n_orthologs == 10
    assert b.first1 == 0 and b.last1 == 9000
    # inversion: genome2 order reversed -> still one block (reverse strand)
    pairs_inv = [(i, 9 - i) for i in range(10)]
    blocks_inv = find_synteny_blocks(gp1, gp2, pairs_inv)
    assert len(blocks_inv) == 1
    assert not blocks_inv[0].same_strand
    # shuffled: no collinear chain
    rng = np.random.default_rng(1)
    perm = rng.permutation(10)
    pairs_shuf = [(i, int(perm[i])) for i in range(10)]
    blocks_shuf = find_synteny_blocks(gp1, gp2, pairs_shuf, min_block_genes=6)
    assert len(blocks_shuf) == 0


def test_linear_view_html(tmp_path):
    from ngsepcore_tpu.genome.genomes_aligner import GenomesAligner
    from ngsepcore_tpu.genome.synteny import SyntenyBlock

    ga = GenomesAligner()
    blocks = [
        SyntenyBlock(seq1="chr1", first1=100, last1=5000, seq2="c2",
                     first2=200, last2=5200, n_orthologs=12, same_strand=True),
        SyntenyBlock(seq1="chr1", first1=6000, last1=9000, seq2="c3",
                     first2=100, last2=3100, n_orthologs=5, same_strand=False),
    ]
    out = tmp_path / "viz.html"
    ga.write_linear_view(str(out), blocks)
    html = out.read_text()
    assert "<svg" in html and "chr1" in html and "c3" in html
    # interactive layer (pan/zoom/hover/isolate — self-contained JS, no CDN)
    assert "addEventListener('wheel'" in html
    assert "addEventListener('mousedown'" in html
    assert 'class="ribbon"' in html and "data-label" in html
    assert "tip.textContent" in html
    # one ribbon per block, each carrying its target-sequence handle
    assert html.count('class="ribbon"') == len(blocks)
    assert 'data-seq2="c3"' in html

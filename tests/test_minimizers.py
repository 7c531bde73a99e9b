import numpy as np

from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    encode_dna,
    pack_reads,
)
from ngsepcore_tpu.index.minimizer_table import MinimizerTable
from ngsepcore_tpu.kernels.minimizers import (
    default_kmer_hash,
    extract_minimizers,
    select_minimizers,
)


def brute_minimizers(hashes, valid, w):
    n = len(hashes)
    sel = np.zeros(n, bool)
    big = 1 << 62
    h = np.where(valid, hashes, big)
    for s in range(0, n - w + 1):
        win = h[s : s + w]
        m = win.min()
        if m == big:
            continue
        for i in range(s, s + w):
            if h[i] == m:
                sel[i] = True
    return sel


def test_select_minimizers_matches_bruteforce():
    rng = np.random.default_rng(11)
    hashes = rng.integers(0, 1000, size=(3, 50)).astype(np.int64)
    valid = rng.random((3, 50)) > 0.1
    w = 7
    sel = np.asarray(select_minimizers(hashes, valid, w))
    for b in range(3):
        expect = brute_minimizers(hashes[b], valid[b], w) & valid[b]
        assert list(sel[b]) == list(expect)


def test_extract_minimizers_positions_consistent():
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), size=300))
    codes, lengths, _ = pack_reads([encode_dna(seq)])
    kcodes, sel, valid = extract_minimizers(codes, lengths, 15, 10)
    sel = np.asarray(sel)
    # at least one minimizer per window stride, none outside valid region
    assert sel.sum() > 0
    assert not sel[0, 300 - 15 + 1 :].any()


def _toy_genome(seq: str) -> ReferenceGenome:
    return ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )


def test_minimizer_table_build_and_query():
    rng = np.random.default_rng(17)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    genome = _toy_genome(seq)
    t = MinimizerTable.build_from_genome(genome, k=15, window=10)
    assert t.size > 0
    # query with a read sampled from the genome: hits must include the origin
    start = 1234
    read = seq[start : start + 100]
    codes, lengths, _ = pack_reads([encode_dna(read)])
    kcodes, sel, valid = extract_minimizers(codes, lengths, 15, 10)
    kcodes, sel = np.asarray(kcodes), np.asarray(sel)
    qpos = np.nonzero(sel[0])[0]
    spos, qp = t.collect_hits(kcodes[0][qpos].astype(np.int64), qpos.astype(np.int64))
    assert len(spos) > 0
    est = spos - qp
    # majority of hits should estimate the true start
    vals, counts = np.unique(est, return_counts=True)
    assert vals[np.argmax(counts)] == start


def test_minimizer_table_save_load(tmp_path):
    rng = np.random.default_rng(2)
    seq = "".join(rng.choice(list("ACGT"), size=2000))
    genome = _toy_genome(seq)
    t = MinimizerTable.build_from_genome(genome, k=15, window=10)
    p = str(tmp_path / "table.npz")
    t.save(p)
    t2 = MinimizerTable.load(p)
    assert t2.size == t.size
    assert list(t2.unique_codes[:10]) == list(t.unique_codes[:10])

import numpy as np
import pytest

from ngsepcore_tpu.align.read_alignment import (
    FLAG_FIRST_OF_PAIR,
    FLAG_MATE_REVERSE,
    FLAG_PAIRED,
    FLAG_PROPER,
    FLAG_READ_REVERSE,
    ReadAlignment,
)
from ngsepcore_tpu.call.read_pair_sv import ReadPairAnalyzer, insert_length_stats


def _pair(first, insert, proper=True, same_strand=False, seq="chr1"):
    flags1 = FLAG_PAIRED | FLAG_FIRST_OF_PAIR
    if proper:
        flags1 |= FLAG_PROPER
    if not same_strand:
        flags1 |= FLAG_MATE_REVERSE
    a = ReadAlignment(
        seq, first, [(100, "M")], flags=flags1, read_chars="A" * 100,
        mate_sequence_name=seq, mate_first=first + insert - 100,
        inferred_insert_size=insert,
    )
    return a


def test_insert_stats():
    rng = np.random.default_rng(2)
    alns = [_pair(int(p), int(rng.normal(400, 30))) for p in rng.integers(1, 100000, 200)]
    st = insert_length_stats(alns)
    assert abs(st.mean - 400) < 15
    assert st.std < 60


def test_deletion_detection():
    rng = np.random.default_rng(3)
    normal = [
        _pair(int(p), int(rng.normal(400, 25)))
        for p in rng.integers(1, 100000, 300)
    ]
    # 8 pairs spanning a 2kb deletion around pos 50000
    del_pairs = [
        _pair(50000 - 150 - i * 10, 400 + 2000, proper=False) for i in range(8)
    ]
    analyzer = ReadPairAnalyzer()
    svs = analyzer.find_variants(normal + del_pairs)
    dels = [s for s in svs if s.variant_type == "DEL"]
    assert dels, "deletion not detected"
    d = dels[0]
    assert abs(d.first - 50000) < 500
    assert 1500 < d.length() < 2500


def test_inversion_detection():
    rng = np.random.default_rng(4)
    normal = [
        _pair(int(p), int(rng.normal(400, 25)))
        for p in rng.integers(1, 100000, 300)
    ]
    inv_pairs = [
        _pair(70000 + i * 13, 400, proper=False, same_strand=True) for i in range(6)
    ]
    analyzer = ReadPairAnalyzer()
    svs = analyzer.find_variants(normal + inv_pairs)
    invs = [s for s in svs if s.variant_type == "INV"]
    assert invs
    assert abs(invs[0].first - 70000) < 600

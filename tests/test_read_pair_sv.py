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


# ---- split-read indels (ref: ReadPairAnalyzer.analyzeSplitReads) ---------

def _clip_genome():
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList

    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, 20000).astype(np.int8)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    return ReferenceGenome(seqs), codes


def _clipped_aln(codes, aln_first, aln_len, rclip_codes=None, lclip_codes=None):
    """Alignment with a soft-clipped tail whose codes are supplied."""
    from ngsepcore_tpu.core.sequences import decode_dna

    body = codes[aln_first - 1 : aln_first - 1 + aln_len]
    cigar = []
    parts = []
    if lclip_codes is not None:
        cigar.append((len(lclip_codes), "S"))
        parts.append(lclip_codes)
    parts.append(body)
    cigar.append((aln_len, "M"))
    if rclip_codes is not None:
        cigar.append((len(rclip_codes), "S"))
        parts.append(rclip_codes)
    read_codes = np.concatenate(parts)
    a = ReadAlignment(
        "chr1", aln_first, cigar, read_chars=decode_dna(read_codes),
    )
    a._read_codes = read_codes
    a.alignment_quality = 90
    return a


def test_split_read_deletion_detection():
    """A 300bp deletion produces right-clipped reads whose tails relocate
    300bp downstream; the split-read step calls the deletion without any
    read-pair signal (ref ReadPairAnalyzer.java:175-178)."""
    genome, codes = _clip_genome()
    DEL_START0 = 8000  # 0-based: deletion removes [8000, 8300)
    DEL_LEN = 300
    alns = []
    for i in range(5):
        # read: 70 aligned bases ending at the breakpoint + 30bp tail that
        # really comes from after the deletion
        aln_first = DEL_START0 - 70 + 1 - i  # vary starts slightly
        aln_len = 70 + i
        tail = codes[DEL_START0 + DEL_LEN : DEL_START0 + DEL_LEN + 30]
        alns.append(_clipped_aln(codes, aln_first, aln_len, rclip_codes=tail))
    # left-clipped mirror reads
    for i in range(3):
        head = codes[DEL_START0 - 30 : DEL_START0]
        aln_first = DEL_START0 + DEL_LEN + 1 + i
        alns.append(
            _clipped_aln(codes, aln_first, 70, lclip_codes=head)
        )
    rp = ReadPairAnalyzer(genome=genome)
    calls = rp.find_variants(alns)
    from ngsepcore_tpu.variants.model import TYPE_LARGEDEL

    dels = [c for c in calls if c.variant_type == TYPE_LARGEDEL]
    assert dels, f"no deletion called; calls={calls}"
    d = dels[0]
    assert abs(d.first - (DEL_START0 + 1)) <= 10
    assert abs((d.last - d.first + 1) - DEL_LEN) <= 15
    assert d.total_read_depth >= 3

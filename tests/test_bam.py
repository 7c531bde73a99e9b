"""BAM binary I/O: round-trip through BGZF blocks + record codec."""
import gzip
import struct

import numpy as np
import pytest

from ngsepcore_tpu.align.read_alignment import ReadAlignment
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.io.bam import BGZF_EOF, BAMReader, BAMWriter, BGZFWriter
from ngsepcore_tpu.io.sam import ReadAlignmentFileReader, ReadAlignmentFileWriter


@pytest.fixture
def seqs():
    s = QualifiedSequenceList()
    s.add(QualifiedSequence.from_string("chr1", "ACGT" * 1000))
    s.add(QualifiedSequence.from_string("chr2", "TTGG" * 500))
    return s


def _aln(name, seq_name, first, cigar, flags=0, mq=60):
    return ReadAlignment(
        sequence_name=seq_name,
        first=first,
        cigar=cigar,
        flags=flags,
        read_name=name,
        read_chars="ACGTACGTAC",
        qualities="IIIIIIIIII",
        alignment_quality=mq,
        num_mismatches=2,
    )


def test_bam_roundtrip(tmp_path, seqs):
    path = str(tmp_path / "t.bam")
    alns = [
        _aln("r1", "chr1", 100, [(10, "M")]),
        _aln("r2", "chr1", 200, [(2, "S"), (5, "M"), (1, "I"), (2, "M")], flags=16),
        _aln("r3", "chr2", 50, [(4, "M"), (3, "D"), (6, "M")]),
    ]
    with BAMWriter(seqs, path, sample_id="S1") as w:
        for a in alns:
            w.write(a)
    r = BAMReader(path)
    got = list(r)
    assert r.sequence_names == ["chr1", "chr2"]
    assert r.sequence_lengths == [4000, 2000]
    assert r.read_groups == {"S1": "S1"}
    assert len(got) == 3
    for a, b in zip(alns, got):
        assert b.read_name == a.read_name
        assert b.sequence_name == a.sequence_name
        assert b.first == a.first
        assert b.cigar == a.cigar
        assert b.flags == a.flags
        assert b.read_chars == a.read_chars
        assert b.qualities == a.qualities
        assert b.alignment_quality == a.alignment_quality
        assert b.num_mismatches == a.num_mismatches
        assert b.read_group == "S1"


def test_bgzf_blocks_are_valid_gzip(tmp_path):
    path = str(tmp_path / "t.bgzf")
    w = BGZFWriter(path)
    data = bytes(np.random.default_rng(0).integers(0, 256, 200000, dtype=np.uint8))
    w.write(data)
    w.close()
    with gzip.open(path, "rb") as fh:
        assert fh.read() == data
    # every block carries the BC extra subfield with a correct BSIZE
    raw = open(path, "rb").read()
    assert raw.endswith(BGZF_EOF)
    off = 0
    blocks = 0
    while off < len(raw):
        assert raw[off : off + 4] == b"\x1f\x8b\x08\x04"
        (bsize,) = struct.unpack_from("<H", raw, off + 16)
        off += bsize + 1
        blocks += 1
    assert off == len(raw)
    assert blocks >= 4  # 200000 / 65280 payload blocks + EOF


def test_sam_layer_dispatches_bam(tmp_path, seqs):
    path = str(tmp_path / "d.bam")
    with ReadAlignmentFileWriter(seqs, path, sample_id="S2") as w:
        w.write(_aln("x1", "chr1", 5, [(10, "M")]))
        w.write(_aln("x2", "chr1", 7, [(10, "M")], mq=5))
    got = list(ReadAlignmentFileReader(path, min_mq=20))
    assert [a.read_name for a in got] == ["x1"]
    rd = ReadAlignmentFileReader(path)
    got2 = list(rd)
    assert len(got2) == 2
    assert rd.read_groups == {"S2": "S2"}


def test_unmapped_and_secondary_filters(tmp_path, seqs):
    path = str(tmp_path / "f.bam")
    un = ReadAlignment(
        sequence_name=None, first=0, cigar=[], flags=4, read_name="u",
        read_chars="ACGT", qualities="IIII",
    )
    sec = _aln("s", "chr1", 9, [(10, "M")], flags=256)
    with BAMWriter(seqs, path) as w:
        w.write(un)
        w.write(sec)
        w.write(_aln("p", "chr1", 11, [(10, "M")]))
    got = list(BAMReader(path))
    assert [a.read_name for a in got] == ["p"]
    got_all = list(BAMReader(path, skip_secondary=False, skip_unmapped=False))
    assert len(got_all) == 3

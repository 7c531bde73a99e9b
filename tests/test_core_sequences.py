import numpy as np
import pytest

from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    decode_dna,
    edit_distance,
    encode_dna,
    hamming_consensus,
    hamming_distance,
    pack_reads,
    qualities_to_phred,
    reverse_complement,
)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode_dna(encode_dna(s)) == s


def test_encode_lowercase_and_ambiguous():
    assert decode_dna(encode_dna("acgtRYKM")) == "ACGTNNNN"


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACGTN") == "NACGTT"


def test_pack_reads_shapes_and_padding():
    seqs = [encode_dna("ACGT"), encode_dna("A" * 200)]
    codes, lengths, _ = pack_reads(seqs)
    assert codes.shape == (2, 256)
    assert list(lengths) == [4, 200]
    assert codes[0, 4] == 4  # N padding


def test_qualified_sequence_list_unique_names():
    lst = QualifiedSequenceList()
    lst.add(QualifiedSequence.from_string("chr1", "ACGT"))
    with pytest.raises(ValueError):
        lst.add(QualifiedSequence.from_string("chr1", "TTTT"))
    assert lst.index_of("chr1") == 0
    assert lst.index_of("chrX") == -1


def test_qualities_to_phred():
    assert list(qualities_to_phred("!I5")) == [0, 40, 20]


def test_hamming():
    a, b = encode_dna("ACGT"), encode_dna("ACGA")
    assert hamming_distance(a, b) == 1
    cons = hamming_consensus([encode_dna("ACGT"), encode_dna("ACGA"), encode_dna("ACGT")])
    assert decode_dna(cons) == "ACGT"


def test_edit_distance():
    assert edit_distance(encode_dna("ACGT"), encode_dna("ACGT")) == 0
    assert edit_distance(encode_dna("ACGT"), encode_dna("AGT")) == 1
    assert edit_distance(encode_dna("AAAA"), encode_dna("TTTT")) == 4
    assert edit_distance(encode_dna("ACTG"), encode_dna("TACGT")) == 3

"""IUPAC degenerate + amino-acid alphabets (ref DegenerateSequence.java,
AminoacidSequence.java) and degenerate adapter trimming."""
import numpy as np

from ngsepcore_tpu.core.degenerate import (
    AMINOACIDS,
    DEGENERATE_ALPHABET,
    decode_aminoacids,
    decode_degenerate_masks,
    degenerate_complement,
    degenerate_reverse_complement,
    encode_aminoacids,
    encode_degenerate_masks,
    get_degenerate_base,
    get_extended_bases,
    make_regular_expression,
    match_positions,
)
from ngsepcore_tpu.core.sequences import RawRead
from ngsepcore_tpu.sequencing.trimmer import RawReadsTrimmer


def test_extended_bases():
    # ref getExtendedBases:65-91
    assert get_extended_bases("A") == "A"
    assert get_extended_bases("N") == "ACGT"
    assert get_extended_bases("R") == "AG"
    assert get_extended_bases("Y") == "CT"
    assert get_extended_bases("M") == "AC"
    assert get_extended_bases("K") == "GT"
    assert get_extended_bases("S") == "CG"
    assert get_extended_bases("W") == "AT"
    assert get_extended_bases("B") == "CGT"
    assert get_extended_bases("D") == "AGT"
    assert get_extended_bases("H") == "ACT"
    assert get_extended_bases("V") == "ACG"
    assert get_extended_bases("Z") is None


def test_degenerate_base_merge():
    # ref getDegenerateBase: iubCodes2[i][j]
    assert get_degenerate_base("A", "G") == "R"
    assert get_degenerate_base("C", "T") == "Y"
    assert get_degenerate_base("A", "C") == "M"
    assert get_degenerate_base("G", "T") == "K"


def test_complement_preserves_degeneracy():
    # ref alphaForComplement: W and S are self-complementary
    assert degenerate_complement("A") == "T"
    assert degenerate_complement("R") == "Y"  # AG -> TC
    assert degenerate_complement("W") == "W"
    assert degenerate_complement("S") == "S"
    assert degenerate_complement("B") == "V"  # CGT -> ACG
    assert degenerate_complement("N") == "N"
    # every alphabet char round-trips through double complement
    for c in DEGENERATE_ALPHABET:
        assert degenerate_complement(degenerate_complement(c)) == c


def test_reverse_complement():
    assert degenerate_reverse_complement("ARN") == "NYT"


def test_mask_roundtrip_and_regex():
    s = "ACGTNRYSWKMBDHV"
    masks = encode_degenerate_masks(s)
    assert decode_degenerate_masks(masks) == s
    rx = make_regular_expression("ANR")
    assert rx == "A[ACGT][AG]"


def test_match_positions_mask_scan():
    read = encode_degenerate_masks("TTACGTTAGGTT")
    pat = encode_degenerate_masks("TAR")  # T, A, A|G
    hits = match_positions(pat, read)
    # TAC no (C not in R); pos 6 'TAG' yes
    assert list(hits) == [6]


def test_aminoacid_codes():
    assert len(AMINOACIDS) == 26
    codes = encode_aminoacids("MKV*")
    assert decode_aminoacids(codes[:3]) == "MKV"
    assert decode_aminoacids(codes[3:4]) == "X"  # unknown char -> X


def test_trimmer_degenerate_adapter():
    # adapter with an N matches any base at that slot (ref
    # RawReadsTrimmer.java:55)
    tr = RawReadsTrimmer(min_quality=0, min_read_length=4,
                         adapters=["AGNTC"])
    read = RawRead("r1", "ACGTACGTAGCTCGGG", "I" * 16)
    out = tr.trim_read(read)
    assert out is not None
    assert out.sequence == "ACGTACGT"  # cut at AGCTC (= AGNTC)

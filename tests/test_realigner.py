"""Indel realigner conciliation tests.

Mirrors behaviors of IndelRealignerPileupListener.java: start-vote
conciliation (moveIndelStarts:274), mono-nucleotide STR detection
(checkMonoNucleotide:352-378), end trimming (processEndsOfAlignments).
"""
import numpy as np
import pytest

from ngsepcore_tpu.align.read_alignment import ReadAlignment, cigar_from_string
from ngsepcore_tpu.call.realigner import (
    IndelRealigner,
    check_mono_nucleotide,
)
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList, encode_dna


def _genome(seq: str) -> ReferenceGenome:
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=encode_dna(seq)))
    return ReferenceGenome(seqs)


def _aln(first: int, cigar: str, read: str, name="r") -> ReadAlignment:
    return ReadAlignment(
        sequence_name="chr1",
        first=first,
        cigar=cigar_from_string(cigar),
        read_chars=read,
        read_name=name,
        alignment_quality=60,
    )


class TestCheckMonoNucleotide:
    def test_pure_run(self):
        # java trace: run of 7 A -> 6 (loop exits on length then i--)
        assert check_mono_nucleotide("AAAAAAA") == 6

    def test_run_with_trailing_base(self):
        assert check_mono_nucleotide("AAAAAT") == 5

    def test_one_mismatch_inside(self):
        assert check_mono_nucleotide("AAAATAAAA") == 8

    def test_too_short(self):
        assert check_mono_nucleotide("AAAA") == 0

    def test_no_run(self):
        assert check_mono_nucleotide("ACGTACGT") == 0


class TestIndelCalls:
    def test_deletion_coordinates(self):
        a = _aln(10, "5M2D5M", "ACGTAACGTA")
        calls = a.indel_calls()
        # deletion of 2 after ref 14: first=14, last=17, length=2
        assert calls == [(14, 17, 2)]

    def test_insertion_coordinates(self):
        a = _aln(10, "5M3I5M", "ACGTAGGGACGTA")
        assert a.indel_calls() == [(14, 15, 3)]

    def test_border_indels_not_calls(self):
        a = _aln(10, "3I5M", "GGGACGTA")
        assert a.indel_calls() == []

    def test_move_indel_start_forward(self):
        a = _aln(10, "5M2D5M", "ACGTAACGTA")
        assert a.move_indel_start(14, 16)
        assert a.cigar_string == "7M2D3M"
        assert a.indel_calls() == [(16, 19, 2)]

    def test_move_indel_start_back(self):
        a = _aln(10, "5M2D5M", "ACGTAACGTA")
        assert a.move_indel_start(14, 12)
        assert a.cigar_string == "3M2D7M"

    def test_move_too_far_fails(self):
        a = _aln(10, "5M2D5M", "ACGTAACGTA")
        assert not a.move_indel_start(14, 25)


class TestConciliation:
    def test_votes_conciliate_starts(self):
        # same 2bp deletion placed at two starts; majority wins and the
        # minority read's CIGAR is moved to match
        g = _genome("ACGTACGTACGTACGTACGTACGTACGTAC")
        a1 = _aln(1, "10M2D10M", "ACGTACGTACGTACGTACGT", "r1")
        a2 = _aln(1, "10M2D10M", "ACGTACGTACGTACGTACGT", "r2")
        a3 = _aln(1, "12M2D8M", "ACGTACGTACGTACGTACGT", "r3")
        sites = IndelRealigner(g, 0).realign([a1, a2, a3])
        assert len(sites) == 1
        assert sites[0].first == 10
        assert a3.cigar_string == "10M2D10M"

    def test_trim_read_ending_inside_event(self):
        g = _genome("ACGTACGTACGTACGTACGTACGTACGTAC")
        a1 = _aln(1, "10M2D10M", "ACGTACGTACGTACGTACGT", "r1")
        # r2 ends right after the event start: < 5bp anchor -> trimmed
        a2 = _aln(1, "12M", "ACGTACGTACGT", "r2")
        IndelRealigner(g, 0).realign([a1, a2])
        assert a2.bases_to_ignore_end > 0
        assert a1.bases_to_ignore_end == 0

    def test_known_str_becomes_site(self):
        from ngsepcore_tpu.core.regions import GenomicRegion

        g = _genome("ACGTACGTACGTACGTACGTACGTACGTAC")
        a1 = _aln(1, "20M", "ACGTACGTACGTACGTACGT", "r1")
        strs = [GenomicRegion("chr1", 8, 12)]
        sites = IndelRealigner(g, 0, strs).realign([a1])
        assert len(sites) == 1
        assert sites[0].first == 7 and sites[0].is_str

    def test_new_str_detection(self):
        # reference has an 8bp A-run after the event; two different indel
        # lengths trigger the STR search
        g = _genome("ACGTACGTAC" + "AAAAAAAA" + "GTACGTACGTACGTACGT")
        read = "ACGTACGTAC" + "AAAAAA" + "GTACGTACGT"
        a1 = _aln(1, "10M2D16M", read + "AAAAAA"[:0], "r1")
        a1.read_chars = "ACGTACGTAC" + "AAAAAA" + "GTACGTACGT"
        a2 = _aln(1, "10M1D17M", "ACGTACGTAC" + "AAAAAAA" + "GTACGTACGT", "r2")
        sites = IndelRealigner(g, 0).realign([a1, a2])
        assert len(sites) == 1
        assert sites[0].is_str and sites[0].is_new_str


class TestPileupIgnores:
    def test_expand_honors_ignore_fields(self):
        from ngsepcore_tpu.call.pileup import expand_alignment_calls

        a = _aln(1, "10M", "ACGTACGTAC")
        a.bases_to_ignore_start = 2
        a.bases_to_ignore_end = 3
        rp, codes, quals, _ = expand_alignment_calls(a)
        assert rp.min() == 3 and rp.max() == 7

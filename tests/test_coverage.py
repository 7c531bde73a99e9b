import io

import numpy as np

from ngsepcore_tpu.align.read_alignment import ReadAlignment
from ngsepcore_tpu.call.coverage import (
    BasePairQualityStatisticsCalculator,
    CoverageStatisticsCalculator,
)
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList


def _genome(seq="ACGT" * 100):
    return ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )


def test_coverage_stats():
    g = _genome()
    alns = [
        ReadAlignment("chr1", 1, [(10, "M")], read_chars="ACGTACGTAC"),
        ReadAlignment("chr1", 5, [(10, "M")], read_chars="ACGTACGTAC"),
    ]
    calc = CoverageStatisticsCalculator(g)
    calc.process_alignments(alns)
    d = calc.coverage_distribution()
    assert d.counts[2] == 6   # positions 5-10 covered twice
    assert d.counts[1] == 8   # positions 1-4 and 11-14 covered once
    assert d.counts[0] == 400 - 14


def test_bp_qual_stats():
    g = _genome()
    # perfect read then read with mismatch at read position 3 (0-based 2)
    alns = [
        ReadAlignment("chr1", 1, [(8, "M")], read_chars="ACGTACGT"),
        ReadAlignment("chr1", 9, [(8, "M")], read_chars="ACTTACGT"),
    ]
    calc = BasePairQualityStatisticsCalculator(g, read_length=10)
    calc.process_alignments(alns)
    assert calc.totals[0] == 2
    assert calc.mismatches[2] == 1
    assert calc.mismatches.sum() == 1
    buf = io.StringIO()
    calc.print_report(buf)
    assert "3\t2\t1" in buf.getvalue()

"""Tier-2 STR-aware split alignment (ref:
ShortReadsUngappedSearchHitsClusterAligner.java:194-345) and the query-side
free-end Gotoh flags that power it."""
import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.regions import GenomicRegion
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    RawRead,
    decode_dna,
)
from ngsepcore_tpu.kernels.pairwise import affine_gap_align_batch

from tests.reference_gotoh import gotoh_align


def _codes(s: str) -> np.ndarray:
    return np.array(["ACGT".index(c) for c in s], dtype=np.int8)


def test_free_end1_matches_reference_mirror():
    """free_end1 (= forceEnd1 false) scores equal the scalar mirror."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        lq = int(rng.integers(8, 30))
        ls = int(rng.integers(8, 30))
        q = rng.integers(0, 4, lq).astype(np.int8)
        s = rng.integers(0, 4, ls).astype(np.int8)
        res = affine_gap_align_batch(
            q[None, :], np.array([lq], np.int32),
            s[None, :], np.array([ls], np.int32),
            free_start1=False, free_end1=True,
            free_start2=False, free_end2=False,
        )
        _, _, ref_score = gotoh_align(
            decode_dna(q), decode_dna(s),
            force_end1=False,
        )
        assert int(res["score"][0]) == ref_score


def test_free_start1_matches_reference_mirror():
    rng = np.random.default_rng(1)
    for _ in range(10):
        lq = int(rng.integers(8, 30))
        ls = int(rng.integers(8, 30))
        q = rng.integers(0, 4, lq).astype(np.int8)
        s = rng.integers(0, 4, ls).astype(np.int8)
        res = affine_gap_align_batch(
            q[None, :], np.array([lq], np.int32),
            s[None, :], np.array([ls], np.int32),
            free_start1=True, free_end1=False,
            free_start2=False, free_end2=False,
        )
        _, _, ref_score = gotoh_align(
            decode_dna(q), decode_dna(s),
            force_start1=False,
        )
        assert int(res["score"][0]) == ref_score


def _str_genome(seed=7, L=6000, str_at=3000, motif="ACGG", copies=12):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, L).astype(np.int8)
    unit = _codes(motif)
    span = len(unit) * copies
    codes[str_at - 1 : str_at - 1 + span] = np.tile(unit, copies)
    # keep flanks unique so seeding is unambiguous
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)
    region = GenomicRegion("chr1", str_at, str_at + span - 1)
    return genome, region, codes


@pytest.mark.parametrize("delta_copies", [2, -2])
def test_tier2_str_expansion_and_contraction(delta_copies):
    """A read carrying an expanded/contracted tandem array aligns via the
    split tier with ONE indel of the repeat-length difference between the
    flanks (ref verifyShortTandemRepeats:305-327)."""
    genome, region, codes = _str_genome()
    motif_len = 4
    # individual's STR has delta_copies more/fewer copies
    unit = codes[region.first - 1 : region.first - 1 + motif_len]
    ind_span = np.tile(unit, (region.last - region.first + 1) // motif_len + delta_copies)
    ind = np.concatenate(
        [codes[: region.first - 1], ind_span, codes[region.last :]]
    )
    # read covering the whole repeat with 60bp flanks
    start = region.first - 1 - 60  # 0-based in individual coords (left flank)
    read_len = 60 + len(ind_span) + 60
    rcodes = ind[start : start + read_len]
    read = RawRead(name="r1", sequence=decode_dna(rcodes), qualities="F" * read_len)

    aligner = ReadsAligner(
        genome, known_strs={"chr1": [region]},
    )
    out = aligner.align_batch([read])
    assert out[0], "read did not align"
    aln = out[0][0]
    cigar = aln.cigar
    if delta_copies > 0:
        assert any(op == "I" and ln == motif_len * delta_copies for ln, op in cigar), cigar
    else:
        assert any(op == "D" and ln == motif_len * (-delta_copies) for ln, op in cigar), cigar
    # flanks anchor on the true position
    assert aln.first == start + 1


def test_tier2_read_ending_inside_str_softclips():
    """A read entering the repeat from the left but not exiting gets a left
    alignment with the repeat bases soft-clipped (ref :283-293)."""
    genome, region, codes = _str_genome()
    start = region.first - 1 - 80  # 0-based
    read_len = 80 + 40  # 80bp flank + 40bp inside the repeat
    rcodes = codes[start : start + read_len]
    read = RawRead(name="r2", sequence=decode_dna(rcodes), qualities="F" * read_len)
    aligner = ReadsAligner(genome, known_strs={"chr1": [region]})
    out = aligner.align_batch([read])
    assert out[0], "read did not align"
    aln = out[0][0]
    # rightmost cigar run is a soft clip covering (at least) the repeat bases
    assert aln.cigar[-1][1] == "S"
    assert aln.cigar[-1][0] >= 35
    assert aln.first == start + 1

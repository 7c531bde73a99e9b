"""Translate de-novo GBS cluster variant coordinates to reference coords.

Ref: src/ngsep/gbs/VCFRelativeCoordinatesTranslator.java (663 LoC, command
`VCFRelativeCoordinatesTranslator`): map variants called on cluster
consensus sequences to genome coordinates through alignments of the
consensus sequences.
"""
from __future__ import annotations

from ..align.read_alignment import ReadAlignment
from ..core.sequences import reverse_complement
from ..vcf.io import VCFRecord


def translate_records(
    records: list[VCFRecord], consensus_alignments: dict[str, ReadAlignment]
) -> tuple[list[VCFRecord], int]:
    """Returns (translated records, n_untranslated).

    Each record's sequence_name is a cluster id; consensus_alignments maps
    cluster id -> alignment of its consensus to the reference.
    """
    out = []
    missed = 0
    for r in records:
        aln = consensus_alignments.get(r.variant.sequence_name)
        if aln is None or aln.is_unmapped:
            missed += 1
            continue
        rel = r.variant.first  # 1-based position within the consensus
        if aln.is_negative_strand:
            read_pos = len(aln.read_chars) - rel  # 0-based in aligned chars
        else:
            read_pos = rel - 1
        ref_pos = _ref_position_of_read_index(aln, read_pos)
        if ref_pos < 0:
            missed += 1
            continue
        v = r.variant
        v.sequence_name = aln.sequence_name
        v.first = ref_pos
        if aln.is_negative_strand:
            v.alleles = [reverse_complement(a) for a in v.alleles]
            for c in r.calls:
                c.sequence_name = aln.sequence_name
                c.first = ref_pos
                c.alleles = v.alleles
        else:
            for c in r.calls:
                c.sequence_name = aln.sequence_name
                c.first = ref_pos
        out.append(r)
    out.sort(key=lambda r: (r.variant.sequence_name, r.variant.first))
    return out, missed


def _ref_position_of_read_index(aln: ReadAlignment, read_idx: int) -> int:
    """Inverse of read_position_at: 1-based ref pos aligned to read_idx."""
    pos = aln.first
    ridx = 0
    for l, op in aln.cigar:
        consumes_read = op in "MIS=X"
        consumes_ref = op in "MDN=X"
        if consumes_read and ridx + l > read_idx:
            if consumes_ref and ridx <= read_idx:
                return pos + (read_idx - ridx)
            return -1
        if consumes_read:
            ridx += l
        if consumes_ref:
            pos += l
    return -1

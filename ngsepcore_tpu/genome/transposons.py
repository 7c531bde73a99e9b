"""Transposable element annotation.

Ref: src/ngsep/genome/TransposableElementsFinder.java:145-438 (command
`TransposonsFinder`): de-novo repeat discovery from overrepresented
k-mers/minimizers plus similarity search against a known TE library.

TPU redesign: genome minimizer multiplicities come straight from the CSR
minimizer table (rows longer than a repeat threshold mark repetitive
positions); library search reuses the same seed lookup as read mapping.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.genome import ReferenceGenome
from ..core.regions import GenomicRegion
from ..core.sequences import QualifiedSequence
from ..index.minimizer_table import MinimizerTable


@dataclass
class TransposonAnnotation(GenomicRegion):
    te_id: str = "denovo_repeat"
    score: float = 0.0


def find_repeats_denovo(
    genome: ReferenceGenome,
    k: int = 15,
    window: int = 10,
    min_multiplicity: int = 10,
    min_length: int = 200,
    merge_distance: int = 100,
) -> list[TransposonAnnotation]:
    """Regions whose minimizers occur >= min_multiplicity times genome-wide."""
    table = MinimizerTable.build_from_genome(
        genome, k=k, window=window, max_hits_per_code=1 << 30
    )
    row_sizes = np.diff(table.row_offsets)
    repeat_rows = np.nonzero(row_sizes >= min_multiplicity)[0]
    # positions covered by repetitive minimizers
    pos_list = []
    for r in repeat_rows:
        pos_list.append(table.entry_pos[table.row_offsets[r] : table.row_offsets[r + 1]])
    if not pos_list:
        return []
    pos = np.sort(np.concatenate(pos_list))
    # merge into regions
    out: list[TransposonAnnotation] = []
    start = prev = int(pos[0])
    for p in pos[1:]:
        p = int(p)
        if p - prev <= merge_distance + k:
            prev = p
            continue
        _emit_region(genome, start, prev + k, min_length, out)
        start = prev = p
    _emit_region(genome, start, prev + k, min_length, out)
    return out


def _emit_region(genome, start_concat, end_concat, min_length, out):
    if end_concat - start_concat < min_length:
        return
    si, first = genome.split_concat_pos(start_concat)
    sj, last = genome.split_concat_pos(end_concat - 1)
    if si != sj:
        return
    out.append(
        TransposonAnnotation(
            sequence_name=genome.sequence_name(si),
            first=first,
            last=last,
            score=float(end_concat - start_concat),
        )
    )


def find_repeats_by_library(
    genome: ReferenceGenome,
    library: list[QualifiedSequence],
    k: int = 15,
    window: int = 10,
    min_hits: int = 5,
    merge_distance: int = 200,
) -> list[TransposonAnnotation]:
    """Similarity search of known TEs against the genome via minimizer hits."""
    from ..core.sequences import pack_reads
    from ..kernels.minimizers import extract_minimizers

    table = MinimizerTable.build_from_genome(genome, k=k, window=window)
    out: list[TransposonAnnotation] = []
    for te in library:
        codes, lengths, _ = pack_reads([te.codes], pad_multiple=128)
        kcodes, sel, _ = extract_minimizers(codes, lengths, k, window)
        kcodes, sel = np.asarray(kcodes[0]), np.asarray(sel[0])
        qpos = np.nonzero(sel)[0]
        if len(qpos) == 0:
            continue
        spos, qp = table.collect_hits(
            kcodes[qpos].astype(np.int64), qpos.astype(np.int64)
        )
        if len(spos) < min_hits:
            continue
        spos = np.sort(spos)
        start = prev = int(spos[0])
        n_hits = 1
        for p in spos[1:]:
            p = int(p)
            if p - prev <= max(merge_distance, len(te)):
                prev = p
                n_hits += 1
                continue
            _emit_te(genome, te, start, prev + k, n_hits, min_hits, out)
            start = prev = p
            n_hits = 1
        _emit_te(genome, te, start, prev + k, n_hits, min_hits, out)
    return out


def _emit_te(genome, te, start_concat, end_concat, n_hits, min_hits, out):
    if n_hits < min_hits:
        return
    si, first = genome.split_concat_pos(start_concat)
    sj, last = genome.split_concat_pos(end_concat - 1)
    if si != sj:
        return
    out.append(
        TransposonAnnotation(
            sequence_name=genome.sequence_name(si),
            first=first,
            last=last,
            te_id=te.name,
            score=float(n_hits),
        )
    )


def write_transposons_gff(annotations: list[TransposonAnnotation], path: str) -> None:
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        for i, a in enumerate(annotations):
            fh.write(
                f"{a.sequence_name}\tngsepcore_tpu\ttransposable_element\t{a.first}"
                f"\t{a.last}\t{a.score:.0f}\t.\t.\tID=TE{i + 1};Name={a.te_id}\n"
            )

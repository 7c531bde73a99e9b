"""Consensus polishing + contig post-processing (end merge, circularization).

Ref: src/ngsep/assembly/ConsensusBuilderBidirectionalWithPolishing.java:82+
(align reads to the draft backbone, correct consensus from aligned-read
calls), AlignmentBasedIndelErrorsCorrector.java (indel error correction
from alignments), ContigEndsMerger.java (merge contigs with overlapping
ends), CircularSequencesProcessor.java (detect + trim circular overlaps).

TPU redesign: polishing is the genotyping scatter kernel re-used at
assembly scale — reads are aligned back to the draft with the batched
long-read aligner, every matched base lands in one device scatter-add
into a (contig_pos, allele, qbin) tensor, and the corrected consensus is
the per-position argmax.  Indel corrections are host-side sparse edits
collected from the same alignments.
"""
from __future__ import annotations

import numpy as np

from ..call.pileup import IndelEvent, expand_batch_calls
from ..core.genome import ReferenceGenome
from ..core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    encode_dna,
)
from ..kernels.genotyping import scatter_allele_counts


def _bucket(n: int, minimum: int = 1 << 14) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def polish_contigs(
    contigs: list[np.ndarray],
    reads: list,
    rounds: int = 1,
    min_indel_fraction: float = 0.5,
    min_depth: int = 2,
) -> tuple[list[np.ndarray], int]:
    """Polish draft contigs against the read set.

    Returns (polished contigs, number of corrections applied).
    reads: list of RawRead.
    """
    from ..align.long_reads import LongReadsAligner

    total_corrections = 0
    for _ in range(rounds):
        seqs = QualifiedSequenceList()
        for i, c in enumerate(contigs):
            seqs.add(QualifiedSequence(name=f"c{i}", codes=c))
        genome = ReferenceGenome(seqs)
        aligner = LongReadsAligner(genome)
        per_contig: dict[str, list] = {}
        B = 256
        for b0 in range(0, len(reads), B):
            for group in aligner.align_batch(reads[b0 : b0 + B]):
                for a in group:
                    per_contig.setdefault(a.sequence_name, []).append(a)
        new_contigs: list[np.ndarray] = []
        corrections = 0
        for i, draft in enumerate(contigs):
            alns = per_contig.get(f"c{i}", [])
            if not alns:
                new_contigs.append(draft)
                continue
            pos, allele, qual, strand, indels = expand_batch_calls(alns)
            L = len(draft)
            out_size = _bucket(L)
            counts, _, _, total = scatter_allele_counts(
                (pos - 1).astype(np.int32),
                allele,
                qual,
                strand,
                out_size=out_size,
            )
            base_counts = np.asarray(counts).sum(axis=2)[:L]  # (L, 4)
            depth = np.asarray(total)[:L]
            majority = base_counts.argmax(axis=1).astype(np.int8)
            support = base_counts.max(axis=1)
            use = (depth >= min_depth) & (support * 2 > depth)
            polished = np.where(use, majority, draft).astype(np.int8)
            corrections += int(np.count_nonzero(polished != draft))
            # indel corrections: apply events supported by a majority of
            # the spanning reads (right-to-left so coordinates stay valid)
            events: dict[tuple[int, int, str], int] = {}
            for ev in indels:
                key = (ev.ref_pos, ev.length, ev.inserted.upper())
                events[key] = events.get(key, 0) + 1
            edits = []
            for (rp, dlen, ins), n in events.items():
                if rp < 1 or rp > L:
                    continue
                d = depth[rp - 1]
                if d < min_depth or n < min_indel_fraction * d:
                    continue
                edits.append((rp, dlen, ins, n))
            # keep the best-supported event per position
            edits.sort(key=lambda e: (e[0], -e[3]))
            chosen = []
            last_rp = -1
            for e in edits:
                if e[0] != last_rp:
                    chosen.append(e)
                    last_rp = e[0]
            pieces = []
            prev = 0
            for rp, dlen, ins, _ in chosen:
                # event sits after 1-based position rp
                pieces.append(polished[prev:rp])
                if ins:
                    pieces.append(encode_dna(ins))
                prev = rp + dlen
                corrections += 1
            pieces.append(polished[prev:])
            new_contigs.append(np.concatenate(pieces).astype(np.int8))
        contigs = new_contigs
        total_corrections += corrections
        if corrections == 0:
            break
    return contigs, total_corrections


# ---------------------------------------------------------------------------
def detect_end_overlap(
    a: np.ndarray,
    b: np.ndarray,
    k: int = 15,
    max_window: int = 30000,
    min_overlap: int = 500,
    max_divergence: float = 0.15,
) -> int | None:
    """Overlap length if the suffix of `a` matches the prefix of `b`.

    K-mer anchored diagonal voting over the end windows + identity check
    (ref: ContigEndsMerger's end-window FM/k-mer search)."""
    wa = a[-min(len(a), max_window) :]
    wb = b[: min(len(b), max_window)]
    if len(wa) < k or len(wb) < k:
        return None
    codes_a = _kmer_code_array(wa, k)
    codes_b = _kmer_code_array(wb, k)
    ia = {}
    for i, c in enumerate(codes_a):
        if c >= 0:
            ia.setdefault(c, []).append(i)
    diag_list: list[int] = []
    for j, c in enumerate(codes_b):
        if c < 0:
            continue
        for i in ia.get(c, ())[:4]:
            diag_list.append(i - j)  # offset of wb start inside wa
    if not diag_list:
        return None
    diags = np.sort(np.array(diag_list, np.int64))
    # windowed votes (±32 tolerates small indel drift), exact modal offset
    lo = np.searchsorted(diags, diags - 32, side="left")
    hi = np.searchsorted(diags, diags + 32, side="right")
    votes = int((hi - lo).max())
    if votes < 6:
        return None
    center = int(diags[int((hi - lo).argmax())])
    window = diags[(diags >= center - 32) & (diags <= center + 32)]
    vals, counts = np.unique(window, return_counts=True)
    offset = int(vals[counts.argmax()])
    overlap = len(wa) - offset
    if overlap < min_overlap or offset < 0:
        return None
    n = min(overlap, len(wb))
    seg_a = wa[offset : offset + n]
    seg_b = wb[:n]
    m = min(len(seg_a), len(seg_b))
    if m < min_overlap:
        return None
    mism = np.count_nonzero(seg_a[:m] != seg_b[:m])
    if mism > max_divergence * m:
        return None
    return m


def circularize(
    contig: np.ndarray, min_overlap: int = 1000, max_window: int = 30000, **kw
) -> tuple[np.ndarray, bool]:
    """Trim the duplicated start from the end of a circular contig
    (ref: CircularSequencesProcessor).  The end windows compared are
    disjoint thirds so the contig's trivial self-diagonal cannot vote."""
    if len(contig) < 4 * min_overlap:
        return contig, False
    w = min(len(contig) // 3, max_window)
    ov = detect_end_overlap(
        contig[-w:], contig[:w], min_overlap=min_overlap, max_window=w, **kw
    )
    if ov is None or ov >= len(contig) // 2:
        return contig, False
    return contig[:-ov], True


def merge_contig_ends(
    contigs: list[np.ndarray], min_overlap: int = 500, **kw
) -> list[np.ndarray]:
    """Greedy merge of contigs whose ends overlap (both orientations)
    (ref: ContigEndsMerger)."""
    from ..core.sequences import reverse_complement_codes

    contigs = sorted(contigs, key=len, reverse=True)
    merged = True
    while merged and len(contigs) > 1:
        merged = False
        n = len(contigs)
        for i in range(n):
            if merged:
                break
            for j in range(n):
                if i == j:
                    continue
                for flip in (False, True):
                    b = (
                        contigs[j]
                        if not flip
                        else reverse_complement_codes(contigs[j])
                    )
                    ov = detect_end_overlap(
                        contigs[i], b, min_overlap=min_overlap, **kw
                    )
                    if ov is not None:
                        joined = np.concatenate([contigs[i], b[ov:]])
                        keep = [
                            contigs[x] for x in range(n) if x not in (i, j)
                        ]
                        contigs = sorted(keep + [joined], key=len, reverse=True)
                        merged = True
                        break
                if merged:
                    break
    return contigs


def _kmer_code_array(codes: np.ndarray, k: int) -> np.ndarray:
    """Rolling 2-bit k-mer codes; -1 where the window contains N."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, np.int64)
    valid = codes < 4
    c = np.where(valid, codes, 0).astype(np.int64)
    out = np.zeros(n, np.int64)
    ok = np.ones(n, bool)
    for i in range(k):
        out = out | (c[i : i + n] << (2 * (k - 1 - i)))
        ok &= valid[i : i + n]
    return np.where(ok, out, -1)

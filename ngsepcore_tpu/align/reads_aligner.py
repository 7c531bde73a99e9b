"""ReadsAligner — batched seed-and-extend read mapping on TPU.

Ref: src/ngsep/alignments/ReadsAligner.java:53-534 (command orchestration),
SingleReadsAligner.java:46-145 (fwd+revcomp, candidate filtering),
ShortReadsUngappedSearchHitsClusterAligner.java:62-121 (3-tier alignment).

TPU redesign: where the reference dispatches one thread task per read
object, this engine processes dense read batches through device kernels:

  stage 1  minimizer extraction for fwd+revcomp rows  (kernels/minimizers)
  stage 2  seed lookup + diagonal clustering          (index/minimizer_table,
           align/hits_clustering — host, vectorized numpy)
  stage 3  tier-1 ungapped mismatch screen            (kernels/tier1)
  stage 4  tier-3 affine-gap DP for the remainder     (kernels/pairwise)
  stage 5  per-read candidate filtering and SAM emit  (host)

Batch shapes are padded to fixed buckets so each kernel compiles once.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.genome import ReferenceGenome
from ..core.sequences import (
    RawRead,
    decode_dna,
    pack_reads,
    reverse_complement_codes,
)
from ..index.minimizer_table import MinimizerTable
from ..kernels.minimizers import extract_minimizers
from ..kernels.pairwise import affine_gap_align_batch, ops_to_cigar_and_strings
from ..kernels.tier1 import tier1_stats
from .hits_clustering import HitsCluster, cluster_hits
from .read_alignment import FLAG_READ_REVERSE, ReadAlignment

DEF_KMER_LENGTH = 25  # ref: ReadsAligner.java:62
DEF_WINDOW_LENGTH = 20  # ref: ReadsAligner.java:63
DEF_MAX_ALNS_PER_READ = 1  # ref: ReadsAligner.java:61
MIN_MATCH_LENGTH = 15  # ref: ShortReadsUngappedSearchHitsClusterAligner.java:41
MIN_PROPORTION_BEST = 0.2  # ref: SingleReadsAligner.java:16
MIN_WEIGHTED_COUNT = 1.0  # ref: SingleReadsAligner.java:17


def _row_bucket(n: int, minimum: int = 256) -> int:
    """Pow2 row bucket so kernel shapes repeat across batches (compile once)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def select_final_alignments(
    reads: list[RawRead],
    candidates: list["_Candidate"],
    max_alns_per_read: int,
) -> tuple[list[list[ReadAlignment]], int]:
    """Per-read combine + filter of finished candidates into primary and
    secondary alignments (ref: SingleReadsAligner.filterAlignments:118-143).
    Shared by the short- and long-read aligners."""
    B = len(reads)
    out: list[list[ReadAlignment]] = [[] for _ in range(B)]
    finals: dict[int, list["_Candidate"]] = {}
    n_aligned = 0
    for c in candidates:
        if c.aln is not None:
            finals.setdefault(c.read_idx, []).append(c)
    for ridx, cands in finals.items():
        read = reads[ridx]
        cands.sort(key=lambda c: -c.quality)
        best = cands[0].quality
        threshold = int(0.8 * best)
        kept = []
        for i, c in enumerate(cands):
            if c.quality <= threshold and i > 0:
                break
            if i == 0 and c.quality <= threshold:
                break
            kept.append(c)
        n = len(kept)
        for i, c in enumerate(kept):
            aln = c.aln
            aln.read_name = read.name
            if c.reverse:
                aln.flags |= FLAG_READ_REVERSE
                aln.read_chars = decode_dna(reverse_complement_codes(read.codes))
                aln.qualities = (
                    read.qualities[::-1]
                    if read.qualities
                    else "5" * len(read.sequence)
                )
            else:
                aln.read_chars = read.sequence
                aln.qualities = read.qualities or "5" * len(read.sequence)
            if i > 0:
                aln.set_secondary(True)
            q = c.quality
            if n > 1:
                q = int(round(0.3 * q / n))
            aln.alignment_quality = max(0, min(255, q))
        kept = kept[:max_alns_per_read]
        out[ridx] = [c.aln for c in kept]
        if out[ridx]:
            n_aligned += 1
    return out, n_aligned


@dataclass
class _Candidate:
    read_idx: int
    reverse: bool
    cluster: HitsCluster
    seq_idx: int
    # 0-based concat coords of predicted ungapped placement
    pred_start: int
    aln: ReadAlignment | None = None
    quality: int = 0


class ReadsAligner:
    def __init__(
        self,
        genome: ReferenceGenome,
        table: MinimizerTable | None = None,
        kmer_length: int = DEF_KMER_LENGTH,
        window_length: int = DEF_WINDOW_LENGTH,
        max_alns_per_read: int = DEF_MAX_ALNS_PER_READ,
        read_pad: int = 256,
    ):
        self.genome = genome
        self.kmer_length = kmer_length
        self.window_length = window_length
        self.max_alns_per_read = max_alns_per_read
        self.read_pad = read_pad
        if table is None:
            table = MinimizerTable.build_from_genome(genome, kmer_length, window_length)
        self.table = table
        # stats (ref: ReadsAligner printStatistics)
        self.total_reads = 0
        self.aligned_reads = 0
        self.few_mismatches_alns = 0
        self.complete_alns = 0

    # ------------------------------------------------------------------
    def align_batch(self, reads: list[RawRead]) -> list[list[ReadAlignment]]:
        B = len(reads)
        self.total_reads += B
        fwd_codes = [r.codes for r in reads]
        rev_codes = [reverse_complement_codes(c) for c in fwd_codes]
        all_codes = fwd_codes + rev_codes
        n_rows = len(all_codes)
        bucket = _row_bucket(n_rows)
        padded = all_codes + [np.empty(0, np.int8)] * (bucket - n_rows)
        codes, lengths, _ = pack_reads(padded, pad_multiple=self.read_pad)
        kcodes, sel, valid = extract_minimizers(
            codes, lengths, self.kmer_length, self.window_length
        )
        kcodes = np.asarray(kcodes)
        sel = np.asarray(sel)

        # stage 2: seed lookup + clustering (host)
        candidates: list[_Candidate] = []
        for row in range(2 * B):
            ridx = row % B
            rev = row >= B
            qlen = lengths[row]
            qpos = np.nonzero(sel[row])[0]
            if len(qpos) == 0:
                continue
            spos, qp = self.table.collect_hits(kcodes[row][qpos], qpos.astype(np.int64))
            clusters = cluster_hits(spos, qp, int(qlen))
            for cl in clusters:
                seq_idx, _ = self.genome.split_concat_pos(
                    min(max(cl.subject_concat_start, 0), self.genome.total_length - 1)
                )
                candidates.append(
                    _Candidate(
                        read_idx=ridx,
                        reverse=rev,
                        cluster=cl,
                        seq_idx=seq_idx,
                        pred_start=cl.subject_concat_start,
                    )
                )

        # per-read candidate filtering by weighted count
        # (ref: SingleReadsAligner.buildAlignments:84-99)
        per_read: dict[int, list[_Candidate]] = {}
        for c in candidates:
            per_read.setdefault(c.read_idx, []).append(c)
        selected: list[_Candidate] = []
        for ridx, cands in per_read.items():
            cands.sort(key=lambda c: -c.cluster.weighted_count)
            max_count = cands[0].cluster.weighted_count
            limit_count = min(MIN_WEIGHTED_COUNT, MIN_PROPORTION_BEST * max_count)
            limit_clusters = min(len(cands), max(5, 3 * self.max_alns_per_read))
            for i, c in enumerate(cands[:limit_clusters]):
                if i > 0 and c.cluster.weighted_count < limit_count:
                    break
                selected.append(c)

        # stage 3: tier-1 ungapped screen on device
        dp_cands = self._tier1(selected, all_codes, lengths)
        # stage 4: affine-gap DP for the rest
        self._tier3(dp_cands, all_codes)

        # stage 5: per-read combine + filter (ref: filterAlignments:118-143)
        out, n_aligned = select_final_alignments(reads, selected, self.max_alns_per_read)
        self.aligned_reads += n_aligned
        return out

    # ------------------------------------------------------------------
    def _tier1(
        self,
        selected: list[_Candidate],
        all_codes: list[np.ndarray],
        lengths: np.ndarray,
    ) -> list[_Candidate]:
        """Run the ungapped screen; returns candidates needing DP."""
        offs = self.genome.offsets
        concat = self.genome.concat
        applicable: list[_Candidate] = []
        dp_needed: list[_Candidate] = []
        rows_q: list[np.ndarray] = []
        rows_s: list[np.ndarray] = []
        for c in selected:
            row_codes = all_codes[c.read_idx] if not c.reverse else None
            qcodes = (
                all_codes[c.read_idx]
                if not c.reverse
                else reverse_complement_codes(all_codes[c.read_idx])
            )
            qlen = len(qcodes)
            s0, s1 = int(offs[c.seq_idx]), int(offs[c.seq_idx + 1])
            p = c.pred_start
            in_bounds = p >= s0 and p + qlen <= s1
            if (
                in_bounds
                and c.cluster.weighted_count > 2
                and c.cluster.all_consistent
            ):
                applicable.append(c)
                rows_q.append(qcodes)
                rows_s.append(concat[p : p + qlen])
            elif in_bounds:
                # ungapped placement exists but tier-1 rules don't apply
                dp_needed.append(c)
            else:
                dp_needed.append(c)
        if applicable:
            L = max(len(q) for q in rows_q)
            bucket = _row_bucket(len(rows_q))
            pad_rows = [np.empty(0, np.int8)] * (bucket - len(rows_q))
            qc, ql, _ = pack_reads(rows_q + pad_rows, pad_to=L, pad_multiple=self.read_pad)
            sc, _, _ = pack_reads(rows_s + pad_rows, pad_to=L, pad_multiple=self.read_pad)
            total, clip_s, clip_e = tier1_stats(qc, ql, sc)
            total = np.asarray(total)
            clip_s = np.asarray(clip_s)
            clip_e = np.asarray(clip_e)
            for i, c in enumerate(applicable):
                qlen = int(ql[i])
                t, cs, ce = int(total[i]), int(clip_s[i]), int(clip_e[i])
                if t < 0.05 * qlen and cs + ce < 0.1 * qlen:
                    first_concat = c.pred_start + cs
                    seq_idx, first = self.genome.split_concat_pos(first_concat)
                    cigar = []
                    if cs > 0:
                        cigar.append((cs, "S"))
                    cigar.append((qlen - cs - ce, "M"))
                    if ce > 0:
                        cigar.append((ce, "S"))
                    mism = t
                    aln = ReadAlignment(
                        sequence_name=self.genome.sequence_name(seq_idx),
                        first=first,
                        cigar=cigar,
                        num_mismatches=mism,
                    )
                    c.aln = aln
                    c.quality = int(round(100 - 5 * mism))
                    self.few_mismatches_alns += 1
                else:
                    dp_needed.append(c)
        return dp_needed

    # ------------------------------------------------------------------
    def _tier3(self, dp_cands: list[_Candidate], all_codes: list[np.ndarray]) -> None:
        """Affine-gap DP with free subject ends (ref tier-3, ":97-121")."""
        if not dp_cands:
            return
        offs = self.genome.offsets
        concat = self.genome.concat
        jobs = []
        for c in dp_cands:
            qcodes = (
                all_codes[c.read_idx]
                if not c.reverse
                else reverse_complement_codes(all_codes[c.read_idx])
            )
            qlen = len(qcodes)
            s0, s1 = int(offs[c.seq_idx]), int(offs[c.seq_idx + 1])
            first = max(s0, c.pred_start - 3)
            last = min(s1, c.pred_start + qlen + 3)
            d = last - first
            if d > 1.5 * qlen or d < 0.5 * qlen:
                continue
            jobs.append((c, qcodes, first, last))
        if not jobs:
            return
        max_q = max(len(j[1]) for j in jobs)
        max_s = max(j[3] - j[2] for j in jobs)
        bucket = _row_bucket(len(jobs), minimum=64)
        pad_rows = [np.empty(0, np.int8)] * (bucket - len(jobs))
        qc, ql, _ = pack_reads(
            [j[1] for j in jobs] + pad_rows, pad_to=max_q, pad_multiple=64
        )
        sc, sl, _ = pack_reads(
            [concat[j[2] : j[3]] for j in jobs] + pad_rows, pad_to=max_s, pad_multiple=64
        )
        self.complete_alns += len(jobs)
        out = affine_gap_align_batch(
            qc, ql, sc, sl, free_start2=True, free_end2=True
        )
        ops = np.asarray(out["ops"])
        n_ops = np.asarray(out["n_ops"])
        start_j = np.asarray(out["start_j"])
        for i, (c, qcodes, first, last) in enumerate(jobs):
            qlen = len(qcodes)
            window = concat[first:last]
            cigar, mism = ops_to_cigar_and_strings(
                ops[i], int(n_ops[i]), qcodes, window, int(start_j[i])
            )
            if mism > 0.1 * qlen:
                continue
            # normalize indel placement so all reads report the same event
            # position (ref: IndelRealignerPileupListener.moveIndelStarts)
            from .read_alignment import left_align_indels

            cigar = left_align_indels(cigar, qcodes, window, int(start_j[i]))
            aln_first_concat = first + int(start_j[i])
            seq_idx, pos1 = self.genome.split_concat_pos(aln_first_concat)
            aln = ReadAlignment(
                sequence_name=self.genome.sequence_name(seq_idx),
                first=pos1,
                cigar=cigar,
                num_mismatches=mism,
            )
            if not aln.clip_borders(MIN_MATCH_LENGTH):
                continue
            c.aln = aln
            c.quality = int(round(100 - 5 * mism))

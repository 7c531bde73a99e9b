"""Long-read aligner — minimizer anchor chaining with batched segment DP.

Ref: src/ngsep/alignments/LongReadsUngappedSearchHitsClusterAligner.java:33-245
(anchor walk: consume kmer hits in query order, extend match runs through
equal-length low-divergence gaps, pairwise-align unequal inter-anchor
segments, soft-clip unalignable ends) and
ReadAlignmentObjectsFactory.java:119-124 (long-read platforms use the
minimizer seed finder with the same k/w as short reads).

TPU redesign: the reference aligns inter-anchor segments one at a time with
per-object CPU DP (or the recursive "dynamic kmers" scheme,
PairwiseAlignerDynamicKmers.java:16-279, which exists purely to cap CPU DP
cost).  Here every read in the batch contributes its segments to shared
(size-bucketed) device batches of the Gotoh kernel, so the DP runs as a few
large dense tensor programs instead of thousands of small host loops —
segments from different reads and different clusters align in the same
kernel launch.  The anchor walk itself is cheap integer work on hits and
stays on host, emitting a "skeleton" whose DP slots are spliced after the
batched kernels return.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.genome import ReferenceGenome
from ..core.sequences import (
    RawRead,
    pack_reads,
    reverse_complement_codes,
)
from ..index.minimizer_table import MinimizerTable
from ..kernels.minimizers import extract_minimizers
from ..kernels.pairwise import (
    OP_INS,
    OP_MATCH,
    affine_gap_align_batch,
)
from .hits_clustering import cluster_hits
from .read_alignment import ReadAlignment
from .reads_aligner import (
    DEF_KMER_LENGTH,
    DEF_WINDOW_LENGTH,
    MIN_PROPORTION_BEST,
    MIN_WEIGHTED_COUNT,
    _Candidate,
    _row_bucket,
    select_final_alignments,
)

# ref: LongReadsUngappedSearchHitsClusterAligner.java:35-36
MAX_LENGTH_FULL_PW = 4000
MAX_LENGTH_ENDS_PW = 500
# ref: equal-length gap fast path ":127-129"
MAX_HAMMING_GAP = 50
HAMMING_FRACTION = 0.03


def _hamming(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.count_nonzero(a != b))


def _naive_runs(
    q_seg: np.ndarray, s_seg: np.ndarray
) -> tuple[list[tuple[int, str]], int]:
    """Single leading gap + match run (ref: PairwiseAlignerNaive.java with
    gapsLeft=true); mismatches counted Hamming-style over aligned columns
    (gap columns count)."""
    dq, ds = len(q_seg), len(s_seg)
    mn = min(dq, ds)
    runs: list[tuple[int, str]] = []
    if ds > dq:
        runs.append((ds - dq, "D"))
    elif dq > ds:
        runs.append((dq - ds, "I"))
    if mn > 0:
        runs.append((mn, "M"))
    mism = abs(ds - dq) + (_hamming(q_seg[dq - mn :], s_seg[ds - mn :]) if mn else 0)
    return runs, mism


def _ops_runs_hamming(
    ops: np.ndarray,
    n_ops: int,
    q: np.ndarray,
    s: np.ndarray,
    start_j: int,
) -> tuple[list[tuple[int, str]], int, int]:
    """Decode device traceback ops into CIGAR runs + Hamming-style mismatch
    count (mismatched pairs + gap columns, matching the reference's
    HammingSequenceDistanceMeasure over aligned fragments).  Returns
    (runs, mismatches, subject_end)."""
    runs: list[tuple[int, str]] = []
    mism = 0
    qi = 0
    sj = start_j
    for op in ops[:n_ops]:
        if op == OP_MATCH:
            ch = "M"
            if q[qi] != s[sj]:
                mism += 1
            qi += 1
            sj += 1
        elif op == OP_INS:
            ch = "I"
            mism += 1
            qi += 1
        else:
            ch = "D"
            mism += 1
            sj += 1
        if runs and runs[-1][1] == ch:
            runs[-1] = (runs[-1][0] + 1, ch)
        else:
            runs.append((1, ch))
    return runs, mism, sj


def merge_runs(runs: list[tuple[int, str]]) -> list[tuple[int, str]]:
    out: list[tuple[int, str]] = []
    for n, ch in runs:
        if n <= 0:
            continue
        if out and out[-1][1] == ch:
            out[-1] = (out[-1][0] + n, ch)
        else:
            out.append((n, ch))
    return out


def collapse_complementary_indels(
    runs: list[tuple[int, str]],
) -> tuple[list[tuple[int, str]], int]:
    """Merge I,M,D / D,M,I sandwiches into longer matches
    (ref: ReadAlignment.collapseComplementaryIndels:1314-1349).
    Returns (new_runs, collapsed_length) — callers subtract
    collapsed_length from the mismatch count like the reference."""
    if len(runs) < 5:
        return runs, 0
    out: list[tuple[int, str]] = []
    collapsed = 0
    i = 0
    n = len(runs)
    while i < n:
        if 0 < i < n - 3:
            l1, op1 = runs[i]
            lm, opm = runs[i + 1]
            l2, op2 = runs[i + 2]
            if (
                op1 != op2
                and op1 in "ID"
                and op2 in "ID"
                and opm == "M"
            ):
                diff = abs(l1 - l2)
                min_len = min(l1, l2)
                if min_len > 10 and l1 > 1.5 * lm and l2 > 1.5 * lm and diff < max(
                    5, 0.5 * lm
                ):
                    out.append((lm + min_len, "M"))
                    if l1 > l2:
                        out.append((diff, op1))
                    elif l2 > l1:
                        out.append((diff, op2))
                    collapsed += min_len
                    i += 3
                    continue
        out.append(runs[i])
        i += 1
    return merge_runs(out), collapsed


@dataclass
class _SegJob:
    q_seg: np.ndarray
    s_seg: np.ndarray
    kind: str  # 'center' | 'start' | 'end'
    runs: list[tuple[int, str]] | None = None
    mism: int = 0
    start_j: int = 0
    end_j: int = 0


@dataclass
class _Skeleton:
    """Chain-walk output for one candidate: CIGAR runs with unresolved DP
    slots ('SEG', job) plus bookkeeping for final assembly."""
    items: list = field(default_factory=list)  # (n, op) | ('SEG', _SegJob)
    mismatches: int = 0
    aln_start: int = -1  # concat 0-based; adjusted by start-seg start_j
    start_seg: _SegJob | None = None
    end_seg: _SegJob | None = None
    aln_end: int = -1  # concat 0-based exclusive (before end seg splice)
    query_start: int = 0
    query_next: int = 0
    failed: bool = False


class LongReadsAligner:
    """Batched long-read alignment (PACBIO / ONT platforms)."""

    def __init__(
        self,
        genome: ReferenceGenome,
        table: MinimizerTable | None = None,
        kmer_length: int = DEF_KMER_LENGTH,
        window_length: int = DEF_WINDOW_LENGTH,
        max_alns_per_read: int = 1,
    ):
        self.genome = genome
        self.kmer_length = kmer_length
        self.window_length = window_length
        self.max_alns_per_read = max_alns_per_read
        if table is None:
            table = MinimizerTable.build_from_genome(genome, kmer_length, window_length)
        self.table = table
        self.total_reads = 0
        self.aligned_reads = 0

    # ------------------------------------------------------------------
    def align_batch(self, reads: list[RawRead]) -> list[list[ReadAlignment]]:
        B = len(reads)
        self.total_reads += B
        fwd = [r.codes for r in reads]
        rev = [reverse_complement_codes(c) for c in fwd]
        all_codes = fwd + rev
        bucket = _row_bucket(2 * B, minimum=16)
        padded = all_codes + [np.empty(0, np.int8)] * (bucket - 2 * B)
        codes, lengths, _ = pack_reads(padded, pad_multiple=1024)
        kcodes, sel, _ = extract_minimizers(
            codes, lengths, self.kmer_length, self.window_length
        )
        kcodes = np.asarray(kcodes)
        sel = np.asarray(sel)

        candidates: list[tuple[_Candidate, _Skeleton]] = []
        per_read: dict[int, list[_Candidate]] = {}
        raw: list[_Candidate] = []
        for row in range(2 * B):
            ridx = row % B
            rv = row >= B
            qlen = int(lengths[row])
            qpos = np.nonzero(sel[row])[0]
            if len(qpos) == 0:
                continue
            spos, qp = self.table.collect_hits(
                kcodes[row][qpos], qpos.astype(np.int64)
            )
            clusters = cluster_hits(spos, qp, qlen, with_members=True)
            for cl in clusters:
                seq_idx, _ = self.genome.split_concat_pos(
                    min(max(cl.subject_concat_start, 0), self.genome.total_length - 1)
                )
                c = _Candidate(
                    read_idx=ridx,
                    reverse=rv,
                    cluster=cl,
                    seq_idx=seq_idx,
                    pred_start=cl.subject_concat_start,
                )
                raw.append(c)
                per_read.setdefault(ridx, []).append(c)

        # candidate filtering per read (ref: SingleReadsAligner:84-99)
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

        # anchor walk -> skeleton + DP jobs
        jobs: list[_SegJob] = []
        work: list[tuple[_Candidate, _Skeleton]] = []
        for c in selected:
            qcodes = (
                all_codes[c.read_idx]
                if not c.reverse
                else all_codes[c.read_idx + B]
            )
            sk = self._chain(c, qcodes, jobs)
            if sk is not None and not sk.failed:
                work.append((c, sk))

        self._run_dp_jobs(jobs)

        # splice + finalize each candidate
        for c, sk in work:
            aln = self._assemble(c, sk)
            if aln is not None:
                c.aln = aln
                c.quality = aln.alignment_quality

        out, n_aligned = select_final_alignments(reads, selected, self.max_alns_per_read)
        self.aligned_reads += n_aligned
        return out

    # ------------------------------------------------------------------
    def _chain(
        self, c: _Candidate, qcodes: np.ndarray, jobs: list[_SegJob]
    ) -> _Skeleton | None:
        """The reference's hit walk (LongReadsUngappedSearchHitsClusterAligner
        .buildAlignment:69-245), emitting DP slots instead of aligning
        inline."""
        cl = c.cluster
        hq, hs = cl.member_qpos, cl.member_spos
        if hq is None or len(hq) == 0:
            return None
        k = self.kmer_length
        qlen = len(qcodes)
        concat = self.genome.concat
        s0 = int(self.genome.offsets[c.seq_idx])
        s1 = int(self.genome.offsets[c.seq_idx + 1])
        sk = _Skeleton()
        subject_next = -1
        query_next = 0
        next_match = 0
        pred_start = cl.subject_concat_start

        for qs, ss in zip(hq.tolist(), hs.tolist()):
            if sk.aln_start == -1:
                # inconsistent early hit (ref ":93")
                if ss < pred_start:
                    continue
                sk.aln_start = ss
                sk.query_start = qs
                start_aligned = qs <= 0
                if not start_aligned and qs < ss - s0:
                    q_seg = qcodes[:qs]
                    possible_start = max(s0, ss - qs - 5)
                    s_seg = concat[possible_start:ss]
                    if len(q_seg) <= 5 or len(s_seg) <= 5:
                        runs, mism = _naive_runs(q_seg, s_seg)
                        sk.items.extend(runs)
                        sk.mismatches += mism
                        start_aligned = True
                        sk.query_start = 0
                        sk.aln_start = possible_start
                    elif (
                        len(q_seg) < MAX_LENGTH_ENDS_PW
                        and len(s_seg) < MAX_LENGTH_ENDS_PW
                    ):
                        job = _SegJob(q_seg, s_seg, "start")
                        jobs.append(job)
                        sk.start_seg = job
                        sk.items.append(("SEG", job))
                        start_aligned = True
                        sk.query_start = 0
                        sk.aln_start = possible_start
                if not start_aligned:
                    sk.items.append((qs, "S"))
                next_match += k
                subject_next = ss + k
                query_next = qs + k
            elif qs > query_next and subject_next < ss:
                s_gap = ss - subject_next
                q_gap = qs - query_next
                good = s_gap == q_gap and s_gap < MAX_HAMMING_GAP
                if good:
                    ham = _hamming(
                        concat[subject_next:ss], qcodes[query_next:qs]
                    )
                    good = ham < HAMMING_FRACTION * q_gap
                if good:
                    next_match += s_gap
                    sk.mismatches += ham
                else:
                    mn, mx = min(s_gap, q_gap), max(s_gap, q_gap)
                    if mx > mn + 3 and 0.95 * mx > mn:
                        # possible invalid kmer hit: delay (ref ":138-142")
                        continue
                    if next_match > 0:
                        sk.items.append((next_match, "M"))
                        next_match = 0
                    q_seg = qcodes[query_next:qs]
                    s_seg = concat[subject_next:ss]
                    if mx <= MAX_LENGTH_FULL_PW:
                        job = _SegJob(q_seg, s_seg, "center")
                        jobs.append(job)
                        sk.items.append(("SEG", job))
                    elif mn < 0.1 * mx:
                        # large indel event: naive single-gap (ref ":153-156")
                        runs, mism = _naive_runs(q_seg, s_seg)
                        sk.items.extend(runs)
                        sk.mismatches += mism
                    elif mx > 0.2 * qlen:
                        sk.failed = True  # ref ":166 return null"
                        return sk
                    else:
                        # default encoding: mismatch run + indel (ref ":167-170")
                        sk.items.append((mn, "M"))
                        if s_gap > q_gap:
                            sk.items.append((s_gap - q_gap, "D"))
                        else:
                            sk.items.append((q_gap - s_gap, "I"))
                        sk.mismatches += mx
                next_match += k
                subject_next = ss + k
                query_next = qs + k
            else:
                # overlapping hit (ref ":188-200")
                d_s = ss + k - subject_next
                d_q = qs + k - query_next
                if d_s > 0 and d_s == d_q:
                    next_match += d_s
                    subject_next = ss + k
                    query_next = qs + k
        if sk.aln_start == -1:
            return None
        if next_match > 0:
            sk.items.append((next_match, "M"))
        sk.aln_end = subject_next
        remainder = qlen - query_next
        if remainder > 0 and remainder + 5 < MAX_LENGTH_ENDS_PW:
            end = min(subject_next + remainder + 5, s1)
            if s1 - subject_next >= remainder:
                q_seg = qcodes[query_next:]
                s_seg = concat[subject_next:end]
                job = _SegJob(q_seg, s_seg, "end")
                jobs.append(job)
                sk.end_seg = job
                sk.items.append(("SEG", job))
                remainder = 0
        if remainder > 0:
            sk.items.append((remainder, "S"))
        sk.query_next = query_next
        return sk

    # ------------------------------------------------------------------
    def _run_dp_jobs(self, jobs: list[_SegJob]) -> None:
        """Size-bucketed batched Gotoh over all segments of all reads."""
        groups: dict[tuple[str, int, int], list[_SegJob]] = {}
        for j in jobs:
            bq = _row_bucket(max(1, len(j.q_seg)), minimum=128)
            bs = _row_bucket(max(1, len(j.s_seg)), minimum=128)
            groups.setdefault((j.kind, bq, bs), []).append(j)
        for (kind, bq, bs), group in groups.items():
            # cap traceback tensor ~64 MB per launch
            rows_cap = max(1, (1 << 26) // (bq * bs))
            rows_cap = min(64, rows_cap)
            for i in range(0, len(group), rows_cap):
                chunk = group[i : i + rows_cap]
                pad = [np.empty(0, np.int8)] * (rows_cap - len(chunk))
                qc, ql, _ = pack_reads(
                    [j.q_seg for j in chunk] + pad, pad_to=bq, pad_multiple=128
                )
                sc, sl, _ = pack_reads(
                    [j.s_seg for j in chunk] + pad, pad_to=bs, pad_multiple=128
                )
                out = affine_gap_align_batch(
                    qc,
                    ql,
                    sc,
                    sl,
                    free_start2=(kind == "start"),
                    free_end2=(kind == "end"),
                )
                ops = np.asarray(out["ops"])
                n_ops = np.asarray(out["n_ops"])
                start_j = np.asarray(out["start_j"])
                for row, j in enumerate(chunk):
                    runs, mism, end_j = _ops_runs_hamming(
                        ops[row],
                        int(n_ops[row]),
                        j.q_seg,
                        j.s_seg,
                        int(start_j[row]),
                    )
                    j.runs = runs
                    j.mism = mism
                    j.start_j = int(start_j[row])
                    j.end_j = end_j

    # ------------------------------------------------------------------
    def _assemble(self, c: _Candidate, sk: _Skeleton) -> ReadAlignment | None:
        runs: list[tuple[int, str]] = []
        mism = sk.mismatches
        for item in sk.items:
            if item[0] == "SEG":
                job: _SegJob = item[1]
                if job.runs is None:
                    return None
                runs.extend(job.runs)
                mism += job.mism
            else:
                runs.append(item)
        runs = merge_runs(runs)
        if not any(op == "M" for _, op in runs):
            return None
        runs, collapsed = collapse_complementary_indels(runs)
        mism = max(0, mism - collapsed)
        aln_start = sk.aln_start
        if sk.start_seg is not None and sk.start_seg.runs is not None:
            aln_start += sk.start_seg.start_j
        aln_end = sk.aln_end
        if sk.end_seg is not None and sk.end_seg.runs is not None:
            aln_end += sk.end_seg.end_j
        seq_idx, pos1 = self.genome.split_concat_pos(aln_start)
        aln = ReadAlignment(
            sequence_name=self.genome.sequence_name(seq_idx),
            first=pos1,
            cigar=runs,
            num_mismatches=mism,
        )
        # quality = 100 * aligned coverage of the query
        # (ref: ":236-238" setAlignmentQuality(100*cov))
        qlen = sum(n for n, op in runs if op in "MIS")
        cov = (sk.query_next - sk.query_start) / max(1, qlen)
        aln.alignment_quality = max(0, min(255, int(round(100 * cov))))
        if not aln.clip_borders(5):
            return None
        return aln


def is_long_read_platform(platform: str | None) -> bool:
    """Ref: ReadAlignment.Platform.isLongReads (ReadAlignment.java:75-84)."""
    return (platform or "").upper() in ("PACBIO", "ONT")

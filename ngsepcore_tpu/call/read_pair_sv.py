"""Read-pair structural variant detection.

Ref: src/ngsep/discovery/ReadPairAnalyzer.java:155-196 (`findVariants`:
insert-length distributions per read group -> distribute abnormal pairs ->
deletions -> insertions -> inversions -> coordinate sort).

Vectorized: insert lengths of all proper-orientation pairs in one array;
abnormal pairs cluster by position into candidate SV intervals.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..align.read_alignment import ReadAlignment
from ..variants.model import (
    CalledGenomicVariant,
    TYPE_INVERSION,
    TYPE_LARGEDEL,
    TYPE_LARGEINS,
)

DEF_MAX_LEN_DELETION = 1_000_000  # ref: ReadPairAnalyzer.DEF_MAX_LEN_DELETION


@dataclass
class InsertStats:
    mean: float
    std: float


def insert_length_stats(alns: list[ReadAlignment]) -> InsertStats:
    lens = np.array(
        [
            abs(a.inferred_insert_size)
            for a in alns
            if a.is_proper_pair and a.inferred_insert_size > 0
        ],
        np.float64,
    )
    if len(lens) < 10:
        return InsertStats(0.0, 0.0)
    med = np.median(lens)
    keep = lens[np.abs(lens - med) < 5 * max(1.0, np.std(lens))]
    return InsertStats(float(np.mean(keep)), float(np.std(keep)))


class ReadPairAnalyzer:
    def __init__(self, n_std: float = 5.0, min_pairs: int = 4):
        self.n_std = n_std
        self.min_pairs = min_pairs

    def find_variants(self, alns: list[ReadAlignment]) -> list[CalledGenomicVariant]:
        stats = insert_length_stats(alns)
        if stats.mean <= 0:
            return []
        out: list[CalledGenomicVariant] = []
        threshold_high = stats.mean + self.n_std * max(stats.std, 10.0)
        threshold_low = max(0.0, stats.mean - self.n_std * max(stats.std, 10.0))
        # first-of-pair records carry the pair info once
        pairs = [
            a
            for a in alns
            if a.is_paired
            and a.flags & 64  # first of pair
            and a.mate_sequence_name == a.sequence_name
            and not a.is_unmapped
        ]
        long_pairs = []  # deletion signal
        short_pairs = []  # insertion signal
        inverted = []  # inversion signal: same-strand mates
        for a in pairs:
            ins = abs(a.inferred_insert_size) if a.inferred_insert_size else abs(
                a.mate_first - a.first
            )
            same_strand = bool(a.flags & 16) == bool(a.flags & 32)
            if same_strand:
                inverted.append(a)
            elif ins > threshold_high and ins < DEF_MAX_LEN_DELETION:
                long_pairs.append((a, ins))
            elif ins < threshold_low and ins > 0:
                short_pairs.append((a, ins))
        out.extend(
            self._cluster(long_pairs, TYPE_LARGEDEL, stats)
        )
        out.extend(self._cluster(short_pairs, TYPE_LARGEINS, stats))
        out.extend(self._cluster([(a, 0) for a in inverted], TYPE_INVERSION, stats))
        out.sort(key=lambda c: (c.sequence_name, c.first))
        return out

    def _cluster(self, pairs, vtype, stats) -> list[CalledGenomicVariant]:
        """Group supporting pairs by predicted event interval."""
        if len(pairs) < self.min_pairs:
            return []
        by_seq: dict[str, list] = {}
        for a, ins in pairs:
            by_seq.setdefault(a.sequence_name, []).append((a, ins))
        out = []
        for seq, items in by_seq.items():
            # event interval per pair: inside the pair's gap
            intervals = []
            for a, ins in items:
                left = min(a.last, a.mate_first)
                right = max(a.first, a.mate_first)
                intervals.append((left + 1, max(left + 2, right - 1), ins))
            intervals.sort()
            cluster: list[tuple[int, int, int]] = []
            for iv in intervals:
                if cluster and iv[0] > max(c[1] for c in cluster):
                    out.extend(self._emit(seq, cluster, vtype, stats))
                    cluster = []
                cluster.append(iv)
            out.extend(self._emit(seq, cluster, vtype, stats))
        return out

    def _emit(self, seq, cluster, vtype, stats) -> list[CalledGenomicVariant]:
        if len(cluster) < self.min_pairs:
            return []
        firsts = np.array([c[0] for c in cluster])
        lasts = np.array([c[1] for c in cluster])
        inss = np.array([c[2] for c in cluster])
        first = int(np.median(firsts))
        last = int(np.median(lasts))
        if vtype == TYPE_LARGEDEL:
            svlen = int(np.median(inss) - stats.mean)
            last = first + max(50, svlen)
        call = CalledGenomicVariant(
            sequence_name=seq,
            first=first,
            alleles=["N"],
            variant_type=vtype,
            quality=min(255, 10 * len(cluster)),
            last_=last,
            genotype_quality=min(255, 10 * len(cluster)),
            total_read_depth=len(cluster),
            indexes_called_alleles=[0],
        )
        return [call]

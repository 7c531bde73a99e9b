"""K-mer spectrum read error correction.

Ref: src/ngsep/sequences/ReadsFileErrorsCorrector.java:1-443 (command
`ReadsFileErrorsCorrector`): build a k-mer spectrum of the input, then for
each read locate stretches whose k-mers fall below minKmerCount and try
every single-bp substitution in the stretch, keeping the change that
maximizes the summed spectrum counts of the affected k-mers
(processReadBestSNPChange/correctErrors :364-446, up to 3 rounds).

The spectrum lookup is the vectorized sorted-array KmersMap; per-read
candidate scoring recomputes only the k k-mers covering each tried
position with a windowed rolling update.
"""
from __future__ import annotations

import numpy as np

from ..core.sequences import RawRead, decode_dna, encode_dna
from ..io.fastq import FastqFileReader, write_fastq
from .kmers_extractor import KmersExtractor
from .kmers_map import KmersMap

DEF_KMER_LENGTH = 15
DEF_MIN_KMER_COUNT = 5


class ReadsFileErrorsCorrector:
    def __init__(
        self,
        kmer_length: int = DEF_KMER_LENGTH,
        min_kmer_count: int = DEF_MIN_KMER_COUNT,
        rounds: int = 3,
    ):
        self.kmer_length = kmer_length
        self.min_kmer_count = min_kmer_count
        self.rounds = rounds
        self.kmers_map: KmersMap | None = None
        self.corrected_errors = 0
        self.corrected_reads = 0

    # ------------------------------------------------------------------
    def build_kmers_map(self, path: str) -> None:
        ex = KmersExtractor(kmer_length=self.kmer_length, only_forward_strand=False)
        ex.process_file(path)
        self.kmers_map = ex.kmers_map

    # ------------------------------------------------------------------
    def _read_kmer_codes(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        k = self.kmer_length
        L = len(codes)
        if L < k:
            return np.empty(0, np.int64), np.empty(0, bool)
        n = L - k + 1
        kc = np.zeros(n, np.int64)
        ok = np.ones(n, bool)
        c = codes.astype(np.int64)
        for j in range(k):
            cj = c[j : j + n]
            kc = kc * 4 + np.where(cj < 4, cj, 0)
            ok &= cj < 4
        return kc, ok

    def _segment_score(self, codes: np.ndarray, first: int, last: int) -> float:
        """Sum of spectrum counts of k-mers inside codes[first..last]."""
        seg = codes[first : last + 1]
        kc, ok = self._read_kmer_codes(seg)
        if len(kc) == 0:
            return 0.0
        counts = self.kmers_map.lookup(kc)
        return float(np.sum(np.where(ok, counts, 0)))

    def correct_read(self, read: RawRead) -> RawRead:
        codes = encode_dna(read.sequence)
        k = self.kmer_length
        changed_any = False
        for _ in range(self.rounds):
            kc, ok = self._read_kmer_codes(codes)
            if len(kc) == 0:
                break
            counts = np.where(ok, self.kmers_map.lookup(kc), 0)
            represented = counts >= self.min_kmer_count
            # gap regions between represented kmers (ref :376-386)
            gaps = []
            last_rep = -1
            for i in range(len(represented)):
                if represented[i]:
                    if i - 1 != last_rep:
                        gaps.append((last_rep, i))
                    last_rep = i
            gaps.append((last_rep, len(codes)))
            changed = False
            for last_rep, next_rep in gaps:
                first = last_rep + k if last_rep >= 0 else 0
                last = next_rep - 1
                if last < first:
                    continue
                lo = last_rep + 1 if last_rep >= 0 else 0
                best_score = self._segment_score(codes, lo, last)
                best = None
                for i in range(first, last + 1):
                    orig = codes[i]
                    if orig >= 4:
                        continue
                    for b in range(4):
                        if b == orig:
                            continue
                        codes[i] = b
                        s = self._segment_score(codes, lo, last)
                        if s > best_score:
                            best_score = s
                            best = (i, b)
                    codes[i] = orig
                if best is not None:
                    codes[best[0]] = best[1]
                    self.corrected_errors += 1
                    changed = True
            if not changed:
                break
            changed_any = True
        if changed_any:
            self.corrected_reads += 1
            return RawRead(read.name, decode_dna(codes), read.qualities)
        return read

    # ------------------------------------------------------------------
    def run(self, input_file: str, output_file: str) -> None:
        self.build_kmers_map(input_file)
        out = []
        for read in FastqFileReader(input_file):
            out.append(self.correct_read(read))
        write_fastq(out, output_file)

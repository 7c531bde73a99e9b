"""K-mer count map as sorted code/count arrays.

TPU-native replacement for the reference's two KmersMap implementations
(ref: sequences/ShortArrayDNAKmersMapImpl.java — flat short[4^k] for k<=15;
DefaultKmersMapImpl.java — hashmap).  Layout here: parallel sorted arrays
(codes int64, counts int32) — a CSR-style structure that is
  * mergeable: per-batch device counts merge in O(n log n) host-side,
  * queryable on device: np/jnp.searchsorted + gather, no pointer chasing,
  * saturating at 32767 like the reference (ShortArrayDNAKmersMapImpl.java:61-68).
"""
from __future__ import annotations

import numpy as np

SATURATION = 32767


class KmersMap:
    def __init__(self, k: int):
        self.k = k
        self.codes = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int32)

    def __len__(self) -> int:
        return len(self.codes)

    @property
    def size(self) -> int:
        return len(self.codes)

    def merge_batch(self, codes: np.ndarray, counts: np.ndarray) -> None:
        """Merge a sorted (codes, counts) run into the map."""
        if len(codes) == 0:
            return
        if len(self.codes) == 0:
            self.codes = codes.astype(np.int64)
            self.counts = np.minimum(counts.astype(np.int32), SATURATION)
            return
        allc = np.concatenate([self.codes, codes.astype(np.int64)])
        alln = np.concatenate([self.counts, counts.astype(np.int32)])
        order = np.argsort(allc, kind="stable")
        allc = allc[order]
        alln = alln[order]
        starts = np.empty(len(allc), dtype=bool)
        starts[0] = True
        np.not_equal(allc[1:], allc[:-1], out=starts[1:])
        idx = np.cumsum(starts) - 1
        merged = np.zeros(idx[-1] + 1, dtype=np.int64)
        np.add.at(merged, idx, alln)
        self.codes = allc[starts]
        self.counts = np.minimum(merged, SATURATION).astype(np.int32)

    def get_count(self, code_or_kmer) -> int:
        if isinstance(code_or_kmer, str):
            from ..kernels.kmers import encode_kmer

            code_or_kmer = encode_kmer(code_or_kmer)
        i = np.searchsorted(self.codes, code_or_kmer)
        if i < len(self.codes) and self.codes[i] == code_or_kmer:
            return int(self.counts[i])
        return 0

    def lookup(self, query_codes: np.ndarray) -> np.ndarray:
        """Vectorized count lookup for an array of codes (0 if absent)."""
        idx = np.searchsorted(self.codes, query_codes)
        idx = np.clip(idx, 0, max(0, len(self.codes) - 1))
        if len(self.codes) == 0:
            return np.zeros(len(query_codes), dtype=np.int32)
        hit = self.codes[idx] == query_codes
        return np.where(hit, self.counts[idx], 0).astype(np.int32)

    def filter_min_count(self, min_count: int) -> None:
        keep = self.counts >= min_count
        self.codes = self.codes[keep]
        self.counts = self.counts[keep]

    def count_distribution(self, max_count: int = 200) -> np.ndarray:
        """Histogram: dist[c] = number of distinct kmers with count c.

        Ref: KmersExtractor distribution output (KmersMap.calculateAbundancesDistribution).
        """
        clipped = np.minimum(self.counts, max_count)
        return np.bincount(clipped, minlength=max_count + 1)

    def save(self, path: str) -> None:
        np.savez_compressed(path, k=self.k, codes=self.codes, counts=self.counts)

    @classmethod
    def load(cls, path: str) -> "KmersMap":
        data = np.load(path)
        m = cls(int(data["k"]))
        m.codes = data["codes"]
        m.counts = data["counts"]
        return m

    def save_text(self, fh, min_count: int = 1) -> None:
        """kmer<TAB>count text output like the reference's KmersExtractor."""
        from ..kernels.kmers import decode_kmer

        for code, cnt in zip(self.codes, self.counts):
            if cnt >= min_count:
                fh.write(f"{decode_kmer(int(code), self.k)}\t{int(cnt)}\n")

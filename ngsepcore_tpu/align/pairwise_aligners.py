"""Pairwise aligner family with the reference's dispatch surface.

Ref: src/ngsep/alignments/PairwiseAligner.java (interface),
PairwiseAlignerSimpleGap.java (linear gap + force flags + local),
PairwiseAlignerStaticBanded.java (k-banded global, checkminK),
PairwiseAlignerNaive.java (gap-pad the shorter sequence),
PairwiseAlignerAffineGap.java (Gotoh — kernels/pairwise.py).

Each aligner exposes `calculate_alignment(s1, s2) -> (a1, a2)` gapped
strings plus `get_max_score`.  Single pairs are padded to power-of-two
shapes so repeated calls reuse a small set of compiled programs; the
batched entry points (`align_batch`) take code arrays directly for hot
paths (MSA center alignment, consensus polishing).
"""
from __future__ import annotations

import numpy as np

from ..core.sequences import encode_dna
from ..kernels.pairwise import affine_gap_align_batch
from ..kernels.pairwise_simple import (
    banded_align_batch,
    ops_to_strings,
    simple_gap_align_batch,
)


def _pad_pow2(n: int, lo: int = 16) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _pack_pair(s1: str, s2: str):
    q = encode_dna(s1)
    s = encode_dna(s2)
    Lq, Ls = _pad_pow2(max(1, len(q))), _pad_pow2(max(1, len(s)))
    qa = np.zeros((1, Lq), np.int8)
    sa = np.zeros((1, Ls), np.int8)
    qa[0, : len(q)] = q
    sa[0, : len(s)] = s
    return (
        qa,
        np.array([len(q)], np.int32),
        sa,
        np.array([len(s)], np.int32),
    )


class PairwiseAlignerSimpleGap:
    """Linear-gap NW/local aligner (ref PairwiseAlignerSimpleGap.java:29)."""

    def __init__(self, match: int = 1, mismatch: int = 1, open_gap: int = 2):
        self.match = match
        self.mismatch = mismatch
        self.open_gap = open_gap
        self.force_start1 = True
        self.force_start2 = True
        self.force_end1 = True
        self.force_end2 = True
        self.local = False
        self.max_score = 0

    def set_local(self, local: bool) -> None:
        """Ref setLocal:112-115 — local clears all force flags."""
        self.local = local
        if local:
            self.force_start1 = self.force_start2 = False
            self.force_end1 = self.force_end2 = False

    def _run(self, s1: str, s2: str):
        qa, ql, sa, sl = _pack_pair(s1, s2)
        out = simple_gap_align_batch(
            qa, ql, sa, sl,
            match=self.match, mismatch=self.mismatch, gap=self.open_gap,
            force_start1=self.force_start1, force_start2=self.force_start2,
            force_end1=self.force_end1, force_end2=self.force_end2,
            local=self.local,
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def calculate_alignment(self, s1: str, s2: str) -> tuple[str, str]:
        out = self._run(s1, s2)
        self.max_score = int(out["score"][0])
        start_i = int(out["start_i"][0]) if self.local else 0
        start_j = int(out["start_j"][0]) if self.local else 0
        return ops_to_strings(
            out["ops"][0], int(out["n_ops"][0]), s1, s2, start_i, start_j
        )

    def get_max_score(self, s1: str | None = None, s2: str | None = None) -> int:
        if s1 is not None:
            self.max_score = int(self._run(s1, s2)["score"][0])
        return self.max_score

    @staticmethod
    def align_batch(query, qlen, subject, slen, **kw):
        """Batched device entry point over padded int8 code arrays."""
        return simple_gap_align_batch(query, qlen, subject, slen, **kw)


class PairwiseAlignerStaticBanded:
    """k-banded global aligner (ref PairwiseAlignerStaticBanded.java:8)."""

    def __init__(self, k: int = 3, match: int = 1, mismatch: int = 1,
                 indel: int = 2):
        self.k = k
        self.match = match
        self.mismatch = mismatch
        self.indel = indel
        self.max_score = 0

    def _check_k(self, s1: str, s2: str) -> None:
        # ref checkminK: the band must contain the (L1, L2) corner
        if abs(len(s1) - len(s2)) > self.k:
            raise ValueError("K value is not possible")

    def calculate_alignment(self, s1: str, s2: str) -> tuple[str, str]:
        self._check_k(s1, s2)
        qa, ql, sa, sl = _pack_pair(s1, s2)
        out = banded_align_batch(
            qa, ql, sa, sl, k=self.k,
            match=self.match, mismatch=self.mismatch, indel=self.indel,
        )
        self.max_score = int(np.asarray(out["score"])[0])
        return ops_to_strings(
            np.asarray(out["ops"])[0], int(np.asarray(out["n_ops"])[0]), s1, s2
        )

    def get_max_score(self, s1: str, s2: str) -> int:
        self._check_k(s1, s2)
        qa, ql, sa, sl = _pack_pair(s1, s2)
        out = banded_align_batch(
            qa, ql, sa, sl, k=self.k,
            match=self.match, mismatch=self.mismatch, indel=self.indel,
        )
        self.max_score = int(np.asarray(out["score"])[0])
        return self.max_score

    @staticmethod
    def align_batch(query, qlen, subject, slen, k, **kw):
        return banded_align_batch(query, qlen, subject, slen, k=k, **kw)


class PairwiseAlignerNaive:
    """Gap-pads the shorter sequence (ref PairwiseAlignerNaive.java:20-40)."""

    def __init__(self, gaps_left: bool = True):
        self.gaps_left = gaps_left

    def calculate_alignment(self, s1: str, s2: str) -> tuple[str, str]:
        diff = len(s1) - len(s2)
        g = "-" * abs(diff)
        a1, a2 = s1, s2
        if self.gaps_left:
            if diff > 0:
                a2 = g + a2
            elif diff < 0:
                a1 = g + a1
        else:
            if diff > 0:
                a2 = a2 + g
            elif diff < 0:
                a1 = a1 + g
        return a1, a2


class PairwiseAlignerAffineGap:
    """String facade over the batched Gotoh kernel (kernels/pairwise.py).

    Ref: PairwiseAlignerAffineGap.java:29-292 (match=1 mismatch=1 openGap=3
    extGap=1, forceStart/forceEnd flags)."""

    def __init__(self, match: int = 1, mismatch: int = 1, open_gap: int = 3,
                 ext_gap: int = 1):
        self.match = match
        self.mismatch = mismatch
        self.open_gap = open_gap
        self.ext_gap = ext_gap
        self.force_start1 = True
        self.force_start2 = True
        self.force_end1 = True
        self.force_end2 = True
        self.max_score = 0

    def calculate_alignment(self, s1: str, s2: str) -> tuple[str, str]:
        qa, ql, sa, sl = _pack_pair(s1, s2)
        out = affine_gap_align_batch(
            qa, ql, sa, sl,
            match=self.match, mismatch=self.mismatch,
            open_gap=self.open_gap, ext_gap=self.ext_gap,
            free_start1=not self.force_start1, free_end1=not self.force_end1,
            free_start2=not self.force_start2, free_end2=not self.force_end2,
        )
        self.max_score = int(np.asarray(out["score"])[0])
        ops = np.asarray(out["ops"])[0]
        n_ops = int(np.asarray(out["n_ops"])[0])
        start_j = int(np.asarray(out["start_j"])[0])
        a1, a2 = ops_to_strings(ops, n_ops, s1, s2, 0, start_j)
        # unaligned query tail under free_end1 (kernel stops at end_i)
        end_i = int(np.asarray(out["end_i"])[0])
        if end_i < len(s1):
            a1 += s1[end_i:]
            a2 += "-" * (len(s1) - end_i)
        return a1, a2

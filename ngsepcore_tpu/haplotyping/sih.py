"""Single individual haplotyping (SIH).

Ref: src/ngsep/haplotyping/ — SingleIndividualHaplotyper.java (command
`SIH`: input = single-sample VCF + alignments; fragment matrix ->
SIHAlgorithm -> phased blocks), SIHAlgorithm.java:12-20 (pluggable
algorithms), RefhapSIHAlgorithm.java + FragmentsCutBuilder.java (max-cut
on the fragment conflict graph), HaplotypeBlock.java / HaplotypeFragment
(fragment matrix model).

TPU redesign: the fragment matrix is a dense (fragments, variants) int8
matrix (-1 = not covered); the RefHap max-cut refinement is iterated
matrix-vector work — agreement scores for all fragments against the
current haplotype in one masked matmul-like reduction per sweep.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..align.read_alignment import ReadAlignment
from ..variants.model import CalledGenomicVariant
from ..vcf.io import VCFRecord


@dataclass
class HaplotypeFragment:
    read_name: str
    first_var: int  # index of first covered variant
    calls: np.ndarray  # int8 alleles (0/1, -1 missing) from first_var


@dataclass
class HaplotypeBlock:
    var_indices: list[int]
    haplotype: np.ndarray  # int8 0/1 per variant (allele of haplotype 0)
    mec: int = 0  # minimum error correction score


def build_fragment_matrix(
    alignments: list[ReadAlignment], het_calls: list[CalledGenomicVariant]
) -> np.ndarray:
    """(fragments, variants) matrix of 0/1 alleles, -1 uncovered.

    Only biallelic het SNVs are phaseable (ref: SIH input filtering).
    """
    positions = {(c.sequence_name, c.first): i for i, c in enumerate(het_calls)}
    alleles = [(c.alleles[0], c.alleles[1]) for c in het_calls]
    rows = []
    for a in alignments:
        if a.is_unmapped or not a.read_chars:
            continue
        row = np.full(len(het_calls), -1, np.int8)
        covered = 0
        for (seq, pos), vi in positions.items():
            if seq != a.sequence_name or pos < a.first or pos > a.last:
                continue
            rp = a.read_position_at(pos)
            if rp < 0 or rp >= len(a.read_chars):
                continue
            base = a.read_chars[rp].upper()
            if base == alleles[vi][0]:
                row[vi] = 0
                covered += 1
            elif base == alleles[vi][1]:
                row[vi] = 1
                covered += 1
        if covered >= 2:  # fragments spanning <2 hets carry no phase info
            rows.append(row)
    if not rows:
        return np.empty((0, len(het_calls)), np.int8)
    return np.stack(rows)


class RefhapSIHAlgorithm:
    """RefHap-style MEC local search.

    Ref: RefhapSIHAlgorithm.java / FragmentsCutBuilder.java — fragments are
    split into two haplotype groups maximizing agreement (max-cut on the
    conflict graph); here solved by iterated reassignment + consensus,
    which converges to the same two-group consensus structure.
    """

    def __init__(self, max_iter: int = 50, seed: int = 1):
        self.max_iter = max_iter
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _greedy_init(fragments: np.ndarray) -> np.ndarray:
        """Left-to-right phase propagation: orient each variant by majority
        linkage with already-phased variants through shared fragments (the
        spanning structure the reference's cut builder starts from)."""
        F, V = fragments.shape
        covered = fragments >= 0
        hap = np.zeros(V, np.int8)
        for v in range(1, V):
            rows = covered[:, v]
            if not rows.any():
                continue
            vote = 0
            sub = fragments[rows]
            for u in range(max(0, v - 20), v):
                both = (sub[:, u] >= 0)
                if not both.any():
                    continue
                same = (sub[both, u] == sub[both, v]).sum()
                diff = both.sum() - same
                orient = 1 if same >= diff else -1
                vote += orient if hap[u] == 0 else -orient
            hap[v] = 0 if vote >= 0 else 1
        return hap

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        """Returns (haplotype (V,) int8, MEC score)."""
        F, V = fragments.shape
        if F == 0:
            return np.zeros(V, np.int8), 0
        covered = fragments >= 0
        hap = self._greedy_init(fragments)
        side = np.zeros(F, bool)
        for _ in range(self.max_iter):
            # agreement of each fragment with hap vs complement
            agree = ((fragments == hap[None, :]) & covered).sum(axis=1)
            total = covered.sum(axis=1)
            new_side = agree * 2 < total  # True = assigned to complement
            # consensus per variant from assigned fragments
            votes1 = (
                ((fragments == 1) & covered & ~new_side[:, None]).sum(axis=0)
                + ((fragments == 0) & covered & new_side[:, None]).sum(axis=0)
            )
            votes0 = (
                ((fragments == 0) & covered & ~new_side[:, None]).sum(axis=0)
                + ((fragments == 1) & covered & new_side[:, None]).sum(axis=0)
            )
            new_hap = (votes1 > votes0).astype(np.int8)
            if np.array_equal(new_hap, hap) and np.array_equal(new_side, side):
                break
            hap, side = new_hap, new_side
        # MEC: disagreements with the assigned haplotype
        frag_hap = np.where(side[:, None], 1 - hap[None, :], hap[None, :])
        mec = int(((fragments != frag_hap) & covered).sum())
        return hap, mec


class SingleIndividualHaplotyper:
    def __init__(self, algorithm: str = "Refhap"):
        self.algorithm_name = algorithm
        self._algo = RefhapSIHAlgorithm()

    def phase(
        self,
        records: list[VCFRecord],
        alignments: list[ReadAlignment],
    ) -> list[HaplotypeBlock]:
        """Phase het biallelic SNVs into blocks connected by fragments."""
        het_calls = [
            r.calls[0]
            for r in records
            if r.calls
            and r.calls[0].is_heterozygous
            and r.variant.is_snv
            and r.variant.is_biallelic
        ]
        if not het_calls:
            return []
        frags = build_fragment_matrix(alignments, het_calls)
        if len(frags) == 0:
            return []
        # connected components of variants linked by shared fragments
        V = frags.shape[1]
        parent = list(range(V))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for row in frags:
            cov = np.nonzero(row >= 0)[0]
            for i in range(1, len(cov)):
                union(int(cov[0]), int(cov[i]))
        comps: dict[int, list[int]] = {}
        for v in range(V):
            comps.setdefault(find(v), []).append(v)
        blocks = []
        for comp in comps.values():
            if len(comp) < 2:
                continue
            sub = frags[:, comp]
            keep = (sub >= 0).sum(axis=1) >= 2
            sub = sub[keep]
            if len(sub) == 0:
                continue
            hap, mec = self._algo.phase(sub)
            blocks.append(HaplotypeBlock(var_indices=comp, haplotype=hap, mec=mec))
            # annotate calls as phased
            for local, vi in enumerate(comp):
                c = het_calls[vi]
                c.phased = True
                a = int(hap[local])
                c.indexes_called_alleles = [a, 1 - a]
        return blocks

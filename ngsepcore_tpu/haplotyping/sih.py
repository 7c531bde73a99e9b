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


def _consensus_from_cut(fragments: np.ndarray, cut: np.ndarray) -> np.ndarray:
    """Haplotype consensus from a fragment 2-coloring (CutHaplotypeTranslator
    .getHaplotype CONSENSUS_COMBINED, CutHaplotypeTranslator.java:33-60)."""
    covered = fragments >= 0
    v1 = ((fragments == 1) & covered & ~cut[:, None]).sum(axis=0) + (
        (fragments == 0) & covered & cut[:, None]
    ).sum(axis=0)
    v0 = ((fragments == 0) & covered & ~cut[:, None]).sum(axis=0) + (
        (fragments == 1) & covered & cut[:, None]
    ).sum(axis=0)
    return (v1 > v0).astype(np.int8)


def _mec(fragments: np.ndarray, hap: np.ndarray, cut: np.ndarray) -> int:
    covered = fragments >= 0
    frag_hap = np.where(cut[:, None], 1 - hap[None, :], hap[None, :])
    return int(((fragments != frag_hap) & covered).sum())


def _hamming2(fragments: np.ndarray, hap: np.ndarray) -> np.ndarray:
    """Per-fragment (disagreements - agreements) against hap, counting only
    decided hap positions (HaplotypeBlock.getHamming2)."""
    decided = (hap >= 0)[None, :] & (fragments >= 0)
    dis = ((fragments != hap[None, :]) & decided).sum(axis=1)
    agr = ((fragments == hap[None, :]) & decided).sum(axis=1)
    return dis - agr


class DGSSIHAlgorithm:
    """DGS greedy growth + consensus iteration.

    Ref: DGSSIHAlgorithm.java:39-127 — seed with the fragment carrying the
    most calls, repeatedly attach the unassigned fragment with the largest
    |hamming2| score to the matching side (initCut :54-97), then alternate
    consensus haplotype / cut reassignment until the haplotype is stable
    (buildHaplotype :39-52, <=1000 iterations).
    """

    def __init__(self, max_iter: int = 1000):
        self.max_iter = max_iter

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        F, V = fragments.shape
        if F == 0:
            return np.zeros(V, np.int8), 0
        covered = fragments >= 0
        hap = np.full(V, -1, np.int8)
        assigned = np.zeros(F, bool)
        cut = np.zeros(F, bool)
        seed = int(np.argmax(covered.sum(axis=1)))
        assigned[seed] = True
        upd = (hap < 0) & covered[seed]
        hap[upd] = fragments[seed][upd]
        for _ in range(F - 1):
            scores = _hamming2(fragments, hap)
            scores[assigned] = 0
            i = int(np.argmax(np.abs(scores)))
            if scores[i] == 0 and assigned[i]:
                break
            assigned[i] = True
            cut[i] = scores[i] > 0
            row = fragments[i] if not cut[i] else np.where(
                fragments[i] >= 0, 1 - fragments[i], -1
            )
            upd = (hap < 0) & (row >= 0)
            hap[upd] = row[upd]
        hap = np.where(hap < 0, 0, hap).astype(np.int8)
        for _ in range(self.max_iter):
            new_hap = _consensus_from_cut(fragments, cut)
            if np.array_equal(new_hap, hap):
                break
            hap = new_hap
            cut = _hamming2(fragments, hap) > 0
        return hap, _mec(fragments, hap, cut)


class Refhap2SIHAlgorithm(RefhapSIHAlgorithm):
    """Max-cut with the builder's alternative strategy 2 — here random
    multi-restart local search keeping the best-MEC solution
    (ref: Refhap2SIHAlgorithm.java calls calculateMaxCutStrategy2)."""

    def __init__(self, restarts: int = 5, seed: int = 2):
        super().__init__()
        self.restarts = restarts
        self.rng = np.random.default_rng(seed)

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        best = super().phase(fragments)
        F, V = fragments.shape
        if F == 0:
            return best
        covered = fragments >= 0
        for _ in range(self.restarts):
            cut = self.rng.random(F) < 0.5
            hap = _consensus_from_cut(fragments, cut)
            for _ in range(self.max_iter):
                new_cut = _hamming2(fragments, hap) > 0
                new_hap = _consensus_from_cut(fragments, new_cut)
                if np.array_equal(new_hap, hap):
                    break
                hap, cut = new_hap, new_cut
            mec = _mec(fragments, hap, _hamming2(fragments, hap) > 0)
            if mec < best[1]:
                best = (hap, mec)
        return best


class Refhap3SIHAlgorithm(Refhap2SIHAlgorithm):
    """Max-cut strategy 3 (ref: Refhap3SIHAlgorithm.java) — deeper restart
    schedule."""

    def __init__(self):
        super().__init__(restarts=10, seed=3)


class GroupsSIHAlgorithm:
    """Group-seeded phasing: seed the first haplotype group with the
    fragment having the most low-disagreement overlaps, then assign the
    rest by agreement (ref: GroupsSIHAlgorithm.java:44-140)."""

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        F, V = fragments.shape
        if F == 0:
            return np.zeros(V, np.int8), 0
        covered = fragments >= 0
        # pairwise disagreement counts on shared sites (small blocks: dense)
        eq = (fragments[:, None, :] == fragments[None, :, :]) & (
            covered[:, None, :] & covered[None, :, :]
        )
        shared = (covered[:, None, :] & covered[None, :, :]).sum(axis=2)
        agree = eq.sum(axis=2)
        dis = shared - agree
        friendly = ((dis <= agree) & (shared > 0)).sum(axis=1)
        seed = int(np.argmax(friendly))
        cut = np.zeros(F, bool)
        cut = (dis[seed] > agree[seed]) & (shared[seed] > 0)
        hap = _consensus_from_cut(fragments, cut)
        cut = _hamming2(fragments, hap) > 0
        hap = _consensus_from_cut(fragments, cut)
        return hap, _mec(fragments, hap, cut)


class HapChatSIHAlgorithm:
    """Iterative k-bounded error correction then consensus, in the HapChat
    style (ref: HapChatSIHAlgorithm.java — merge fragments whose corrected
    distance fits within k errors, then phase the merged matrix)."""

    def __init__(self, k: int = 2):
        self.k = k

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        base = RefhapSIHAlgorithm()
        hap, mec = base.phase(fragments)
        covered = fragments >= 0
        # correct up to k errors per fragment toward its assigned side and
        # re-phase once (HapChat's bounded-correction step)
        side = _hamming2(fragments, hap) > 0
        target = np.where(side[:, None], 1 - hap[None, :], hap[None, :])
        errs = (fragments != target) & covered
        fixed = fragments.copy()
        for i in range(len(fragments)):
            bad = np.nonzero(errs[i])[0][: self.k]
            fixed[i, bad] = target[i, bad]
        return base.phase(fixed)[0], mec


class GenHapSIHAlgorithm:
    """Genetic-algorithm max-cut: population of fragment 2-colorings with
    crossover + mutation, MEC fitness (ref: GenHapSIHAlgorithm.java:60-390,
    population-based optimization of the same cut)."""

    def __init__(self, population: int = 20, generations: int = 30, seed: int = 7):
        self.population = population
        self.generations = generations
        self.rng = np.random.default_rng(seed)

    def phase(self, fragments: np.ndarray) -> tuple[np.ndarray, int]:
        F, V = fragments.shape
        if F == 0:
            return np.zeros(V, np.int8), 0
        pop = self.rng.random((self.population, F)) < 0.5
        pop[0] = False

        def fitness(cut):
            hap = _consensus_from_cut(fragments, cut)
            return _mec(fragments, hap, cut), hap

        scored = [fitness(c) + (c,) for c in pop]
        scored.sort(key=lambda t: t[0])
        for _ in range(self.generations):
            elite = scored[: max(2, self.population // 4)]
            children = []
            while len(children) + len(elite) < self.population:
                a, b = self.rng.choice(len(elite), 2, replace=True)
                mask = self.rng.random(F) < 0.5
                child = np.where(mask, elite[a][2], elite[b][2])
                mut = self.rng.random(F) < (1.0 / max(F, 1))
                child = child ^ mut
                children.append(child)
            scored = elite + [fitness(c) + (c,) for c in children]
            scored.sort(key=lambda t: t[0])
        mec, hap, cut = scored[0]
        # local-search polish
        for _ in range(20):
            new_cut = _hamming2(fragments, hap) > 0
            new_hap = _consensus_from_cut(fragments, new_cut)
            if np.array_equal(new_hap, hap):
                break
            hap = new_hap
        return hap, _mec(fragments, hap, _hamming2(fragments, hap) > 0)


SIH_ALGORITHMS = {
    "Refhap": RefhapSIHAlgorithm,
    "Refhap2": Refhap2SIHAlgorithm,
    "Refhap3": Refhap3SIHAlgorithm,
    "DGS": DGSSIHAlgorithm,
    "Groups": GroupsSIHAlgorithm,
    "HapChat": HapChatSIHAlgorithm,
    "GenHap": GenHapSIHAlgorithm,
}


class SingleIndividualHaplotyper:
    def __init__(self, algorithm: str = "Refhap"):
        self.algorithm_name = algorithm
        by_lower = {k.lower(): v for k, v in SIH_ALGORITHMS.items()}
        cls = by_lower.get(algorithm.lower())
        if cls is None:
            raise ValueError(
                f"Unknown SIH algorithm {algorithm!r}; options: "
                + ", ".join(SIH_ALGORITHMS)
            )
        self._algo = cls()

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

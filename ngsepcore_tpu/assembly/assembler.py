"""De-novo long-read assembler (overlap-layout-consensus).

Ref: src/ngsep/assembly/Assembler.java:279-545 (command `Assembler`: kmer
spectrum -> minimizer overlap graph -> chimera/embedded filtering ->
layout -> consensus), GraphBuilderMinimizers.java:103-246 (table over
reads, KmerHitsAssemblyEdgesFinder overlap edges/embedded relations),
LayoutBuilderKruskalPath.java:71-460 (path building),
ConsensusBuilderBidirectionalSimple.java, NStatisticsCalculator.java.

TPU redesign: minimizers of all reads are extracted on device in one
padded batch (canonical-strand codes so both orientations match); hit
pairs come from one global sort of (code, read, pos, strand) entries; the
per-pair diagonal voting that the reference does with per-read hashmap
walks becomes sorted-array segment reductions.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    decode_dna,
    pack_reads,
    reverse_complement_codes,
)
from ..kernels.kmers import kmer_codes_both_strands
from ..kernels.minimizers import default_kmer_hash, select_minimizers
from .graph import AssemblyEdge, AssemblyEmbedded, AssemblyGraph

DEF_KMER_LENGTH = 15
DEF_WINDOW_LENGTH = 10
DEF_MIN_SHARED_MINIMIZERS = 6
DEF_MIN_OVERLAP = 200


class Assembler:
    def __init__(
        self,
        kmer_length: int = DEF_KMER_LENGTH,
        window_length: int = DEF_WINDOW_LENGTH,
        min_shared_minimizers: int = DEF_MIN_SHARED_MINIMIZERS,
        min_overlap: int = DEF_MIN_OVERLAP,
        batch_rows: int = 512,
        polish_rounds: int = 1,
        merge_ends: bool = True,
        circular: bool = False,
        ploidy: int = 1,
    ):
        self.kmer_length = kmer_length
        self.window_length = window_length
        self.min_shared = min_shared_minimizers
        self.min_overlap = min_overlap
        self.batch_rows = batch_rows
        self.polish_rounds = polish_rounds
        self.merge_ends = merge_ends
        self.circular = circular
        self.ploidy = ploidy
        self.corrections = 0
        self.circularized = 0

    # ------------------------------------------------------------------
    def _read_minimizers(self, reads: list[np.ndarray]):
        """Canonical-strand minimizers of every read.

        Returns flat arrays (codes, read_idx, pos, strand) sorted by code.
        """
        k = self.kmer_length
        codes_l, reads_l, pos_l, strand_l = [], [], [], []
        maxlen = max(len(r) for r in reads)
        for b0 in range(0, len(reads), self.batch_rows):
            batch = reads[b0 : b0 + self.batch_rows]
            rows = len(batch)
            pad = [np.empty(0, np.int8)] * (self.batch_rows - rows)
            codes, lengths, _ = pack_reads(batch + pad, pad_to=maxlen)
            fwd, rev, ok = kmer_codes_both_strands(codes, lengths, k)
            canon = np.minimum(np.asarray(fwd), np.asarray(rev))
            strand = (np.asarray(fwd) > np.asarray(rev)).astype(np.int8)
            import jax.numpy as jnp

            sel = np.asarray(
                select_minimizers(
                    default_kmer_hash(jnp.asarray(canon)), ok, self.window_length
                )
            )
            for r in range(rows):
                idx = np.nonzero(sel[r])[0]
                codes_l.append(canon[r][idx])
                reads_l.append(np.full(len(idx), b0 + r, np.int32))
                pos_l.append(idx.astype(np.int32))
                strand_l.append(strand[r][idx])
        codes = np.concatenate(codes_l)
        read_idx = np.concatenate(reads_l)
        pos = np.concatenate(pos_l)
        strand = np.concatenate(strand_l)
        order = np.argsort(codes, kind="stable")
        return codes[order], read_idx[order], pos[order], strand[order]

    # ------------------------------------------------------------------
    def build_graph(self, reads: list[np.ndarray]) -> AssemblyGraph:
        lens = np.array([len(r) for r in reads], np.int64)
        codes, read_idx, pos, strand = self._read_minimizers(reads)
        graph = AssemblyGraph(len(reads))
        if len(codes) == 0:
            return graph
        # group boundaries by code
        starts = np.nonzero(
            np.concatenate([[True], codes[1:] != codes[:-1]])
        )[0]
        ends = np.concatenate([starts[1:], [len(codes)]])
        # pair votes: key=(r1, r2, orient) -> diagonals in r1 coords
        pair_keys = []
        pair_diags = []
        k = self.kmer_length
        MAX_GROUP = 12  # repeats produce huge groups; skip (ref hit caps)
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > MAX_GROUP:
                continue
            r = read_idx[s:e]
            p = pos[s:e]
            st = strand[s:e]
            ii, jj = np.triu_indices(g, 1)
            same = r[ii] != r[jj]
            ii, jj = ii[same], jj[same]
            if len(ii) == 0:
                continue
            # normalize so r1 < r2
            swap = r[ii] > r[jj]
            a = np.where(swap, jj, ii)
            b = np.where(swap, ii, jj)
            r1, r2 = r[a], r[b]
            p1, p2 = p[a], p[b]
            s1, s2 = st[a], st[b]
            orient = (s1 != s2).astype(np.int64)
            # diag in r1 forward coords; opposite orientation flips r2 pos
            p2_eff = np.where(orient == 1, lens[r2] - (p2 + k), p2)
            diag = p1 - p2_eff
            key = (r1.astype(np.int64) * len(reads) + r2) * 2 + orient
            pair_keys.append(key)
            pair_diags.append(diag)
        if not pair_keys:
            return graph
        keys = np.concatenate(pair_keys)
        diags = np.concatenate(pair_diags)
        order = np.argsort(keys, kind="stable")
        keys, diags = keys[order], diags[order]
        starts = np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(keys)]])
        for s, e in zip(starts, ends):
            n_hits = e - s
            if n_hits < self.min_shared:
                continue
            d = np.sort(diags[s:e])
            med = int(np.median(d))
            # require diagonal consistency
            if np.sum(np.abs(d - med) <= 100) < self.min_shared:
                continue
            key = int(keys[s])
            orient = key & 1
            pair = key >> 1
            r1, r2 = divmod(pair, len(reads))
            L1, L2 = int(lens[r1]), int(lens[r2])
            rev2 = orient == 1
            score = float(n_hits)
            if med >= 0 and med + L2 <= L1:
                graph.add_embedded(AssemblyEmbedded(r2, r1, med, rev2))
            elif med < 0 and -med + L1 <= L2:
                graph.add_embedded(AssemblyEmbedded(r1, r2, -med, rev2))
            elif med > 0:
                overlap = L1 - med
                if overlap >= self.min_overlap:
                    graph.add_edge(
                        AssemblyEdge(r1, False, r2, rev2, overlap, score)
                    )
            else:
                overlap = L2 + med
                if overlap >= self.min_overlap:
                    graph.add_edge(
                        AssemblyEdge(r2, rev2, r1, False, overlap, score)
                    )
        return graph

    # ------------------------------------------------------------------
    def layout_and_consensus(
        self, reads: list[np.ndarray], graph: AssemblyGraph
    ) -> list[np.ndarray]:
        """Greedy path layout + overlap-concatenation consensus.

        Ref: LayoutBuilderKruskalPath (greedy over best overlaps with each
        physical read end used at most once) +
        ConsensusBuilderBidirectionalSimple.  An overlap edge joins the
        3'-side end of one oriented read to the 5'-side end of another;
        both directions of the same physical junction are equivalent, so
        junctions are keyed by physical (read, L/R) ends.
        """
        n = len(reads)
        # edge priority per layout algorithm (ref: LayoutBuilderKruskalPath
        # sorts by relationship score; LayoutBuilderGreedyMaxOverlap /
        # MinCost are the greedy variants)
        keys = {
            "KruskalPath": lambda e: (-e.score, -e.overlap),
            "MaxOverlap": lambda e: (-e.overlap, -e.score),
            "MinCost": lambda e: (e.cost if hasattr(e, "cost") else -e.score),
        }
        algo = getattr(self, "layout_algorithm", "MaxOverlap")
        edges = sorted(graph.filtered_edges(), key=keys.get(algo, keys["MaxOverlap"]))
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # physical end of an oriented read: exit end of (r, rev) is R when
        # forward, L when reversed; entry end is the opposite
        def exit_end(r, rev):
            return (r, "L" if rev else "R")

        def entry_end(r, rev):
            return (r, "R" if rev else "L")

        junction: dict[tuple[int, str], tuple[tuple[int, str], int]] = {}
        for e in edges:
            e1 = exit_end(e.read1, e.rev1)
            e2 = entry_end(e.read2, e.rev2)
            if e1 in junction or e2 in junction:
                continue
            if find(e.read1) == find(e.read2):
                continue
            junction[e1] = (e2, e.overlap)
            junction[e2] = (e1, e.overlap)
            parent[find(e.read2)] = find(e.read1)

        contigs: list[np.ndarray] = []
        visited: set[int] = set(graph.embedded.keys())

        def walk(r0: int, entry: str) -> np.ndarray:
            """Walk a path entering read r0 at physical end `entry`."""
            pieces = []
            r, ent = r0, entry
            prev_overlap = 0
            while True:
                visited.add(r)
                rev = ent == "R"
                seq = reads[r] if not rev else reverse_complement_codes(reads[r])
                pieces.append(seq[prev_overlap:] if prev_overlap < len(seq) else seq[:0])
                ex = (r, "R" if ent == "L" else "L")
                nxt = junction.get(ex)
                if nxt is None:
                    break
                (r2, ent2), overlap = nxt
                if r2 in visited:
                    break
                r, ent, prev_overlap = r2, ent2, overlap
            return np.concatenate(pieces)

        # path starts: reads whose entry end is free (degree<=1 chains)
        for r in range(n):
            if r in visited:
                continue
            lfree = (r, "L") not in junction
            rfree = (r, "R") not in junction
            if lfree and rfree:
                continue  # handled as singleton later unless part of a loop
            if lfree:
                contigs.append(walk(r, "L"))
            elif rfree:
                contigs.append(walk(r, "R"))
        # leftover circular components + isolated reads
        for r in range(n):
            if r not in visited:
                contigs.append(walk(r, "L"))
        contigs.sort(key=len, reverse=True)
        return contigs

    # ------------------------------------------------------------------
    def assemble(self, reads: list[np.ndarray]) -> QualifiedSequenceList:
        """Full pipeline: graph -> layout -> end merge -> polish ->
        circularize (ref: Assembler.run stages :285-545); for ploidy>=2 a
        phase-filter pass re-assembles each haplotype read cluster
        (ref: ploidy loop :461-484)."""
        if self.ploidy >= 2:
            return self._assemble_phased(reads)
        graph = self.build_graph(reads)
        contigs = self.layout_and_consensus(reads, graph)
        if self.merge_ends and len(contigs) > 1:
            from .polishing import merge_contig_ends

            contigs = merge_contig_ends(contigs, min_overlap=self.min_overlap)
        if self.polish_rounds > 0 and contigs:
            from ..core.sequences import RawRead
            from .polishing import polish_contigs

            raw = [
                RawRead(name=f"r{i}", sequence=decode_dna(r))
                for i, r in enumerate(reads)
            ]
            contigs, self.corrections = polish_contigs(
                contigs, raw, rounds=self.polish_rounds
            )
        if self.circular:
            from .polishing import circularize

            done = []
            for c in contigs:
                c2, was = circularize(c)
                self.circularized += was
                done.append(c2)
            contigs = done
        contigs = sorted(contigs, key=len, reverse=True)
        out = QualifiedSequenceList()
        for i, c in enumerate(contigs):
            out.add(QualifiedSequence(name=f"contig_{i + 1}", codes=c))
        return out

    # ------------------------------------------------------------------
    def _assemble_phased(self, reads: list[np.ndarray]) -> QualifiedSequenceList:
        """Diploid assembly: draft -> phase reads into haplotype clusters ->
        assemble each cluster."""
        from ..core.sequences import RawRead
        from .phasing import phase_reads

        draft_asm = Assembler(
            self.kmer_length,
            self.window_length,
            self.min_shared,
            self.min_overlap,
            self.batch_rows,
            polish_rounds=0,
            merge_ends=self.merge_ends,
        )
        draft = draft_asm.assemble(reads)
        raw = [
            RawRead(name=f"r{i}", sequence=decode_dna(r))
            for i, r in enumerate(reads)
        ]
        clusters = phase_reads([s.codes for s in draft], raw)
        out = QualifiedSequenceList()
        for h, cluster in enumerate(clusters):
            sub_reads = [reads[i] for i in sorted(cluster)]
            if not sub_reads:
                continue
            sub = Assembler(
                self.kmer_length,
                self.window_length,
                self.min_shared,
                self.min_overlap,
                self.batch_rows,
                polish_rounds=self.polish_rounds,
                merge_ends=self.merge_ends,
                circular=self.circular,
            )
            contigs = sub.assemble(sub_reads)
            self.corrections += sub.corrections
            self.circularized += sub.circularized
            for i, s in enumerate(contigs):
                out.add(
                    QualifiedSequence(
                        name=f"contig_{i + 1}_hap{h}", codes=s.codes
                    )
                )
        return out


def n_statistics(lengths: list[int]) -> dict:
    """N50/N90 and friends (ref: NStatisticsCalculator)."""
    ls = sorted(lengths, reverse=True)
    total = sum(ls)
    out = {"total": total, "count": len(ls), "max": ls[0] if ls else 0}
    acc = 0
    for l in ls:
        acc += l
        if "N50" not in out and acc * 2 >= total:
            out["N50"] = l
        if acc * 10 >= total * 9:
            out.setdefault("N90", l)
    return out

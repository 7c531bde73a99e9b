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
        min_score_proportion: float = 0.5,  # ref: Assembler.java:65
        graph_file: str | None = None,  # load a saved graph (ref -graphFile)
        save_graph_file: str | None = None,  # checkpoint after filtering
        remove_chimeras: bool = True,
        error_correction_rounds: int = 0,  # ref: Assembler.java:415 rounds
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
        self.min_score_proportion = min_score_proportion
        self.graph_file = graph_file
        self.save_graph_file = save_graph_file
        self.remove_chimeras = remove_chimeras
        self.error_correction_rounds = error_correction_rounds
        self.corrections = 0
        self.read_indel_corrections = 0
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
        graph = AssemblyGraph(len(reads), [int(x) for x in lens])
        if len(codes) == 0:
            return graph
        # group boundaries by code
        starts = np.nonzero(
            np.concatenate([[True], codes[1:] != codes[:-1]])
        )[0]
        ends = np.concatenate([starts[1:], [len(codes)]])
        # pair votes: key=(r1, r2, orient) -> diagonals + r1 positions
        pair_keys = []
        pair_diags = []
        pair_p1 = []
        k = self.kmer_length
        # skip repeat-inflated minimizer groups, but scale the cap with
        # coverage: the typical group size IS the read coverage (every
        # read over a locus contributes the same minimizer), so a fixed
        # cap starves the graph of evidence at deep coverage (ref:
        # GraphBuilderMinimizers limits hits per kmer relative to mean
        # coverage the same way)
        group_sizes = ends - starts
        med_group = int(np.median(group_sizes[group_sizes >= 2])) if np.any(
            group_sizes >= 2
        ) else 2
        max_group = max(12, 3 * med_group)
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > max_group:
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
            pair_p1.append(p1)
        if not pair_keys:
            return graph
        keys = np.concatenate(pair_keys)
        diags = np.concatenate(pair_diags)
        p1s = np.concatenate(pair_p1)
        order = np.argsort(keys, kind="stable")
        keys, diags, p1s = keys[order], diags[order], p1s[order]
        starts = np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(keys)]])
        for s, e in zip(starts, ends):
            n_hits = e - s
            if n_hits < self.min_shared:
                continue
            d = diags[s:e]
            med = int(np.median(np.sort(d)))
            cons = np.abs(d - med) <= 100
            n_cons = int(cons.sum())
            # require diagonal consistency
            if n_cons < self.min_shared:
                continue
            key = int(keys[s])
            orient = key & 1
            pair = key >> 1
            r1, r2 = divmod(pair, len(reads))
            L1, L2 = int(lens[r1]), int(lens[r2])
            rev2 = orient == 1
            score = float(n_cons)
            # relation evidence statistics (ref: AssemblyEdge evidence
            # spans, coverage shared kmers, indels/kbp)
            pc = p1s[s:e][cons]
            ev1_start = int(pc.min())
            ev1_end = int(pc.max()) + k
            csk = int(min(len(np.unique(pc)) * k, L1))
            dd = np.abs(d[cons] - med)
            # evidence span in r2 FORWARD coords: p2_eff = p1 - med, and
            # orient 1 maps p2_eff back through the reverse complement
            if rev2:
                ev2_start = max(0, L2 - ev1_end + med)
                ev2_end = min(L2, L2 - ev1_start + med)
            else:
                ev2_start = max(0, ev1_start - med)
                ev2_end = min(L2, ev1_end - med)
            if med >= 0 and med + L2 <= L1:
                ev_prop = min(1.0, (ev1_end - ev1_start) / max(1, L2))
                graph.add_embedded(
                    AssemblyEmbedded(
                        r2, r1, med, rev2, nshared=n_cons, csk=csk,
                        ev_prop=ev_prop, host_evidence_start=ev1_start,
                        host_evidence_end=ev1_end, score=score,
                    )
                )
            elif med < 0 and -med + L1 <= L2:
                # host evidence span translated into r2 coordinates
                if rev2:
                    h_start = max(0, L2 - (ev1_end - med))
                    h_end = min(L2, L2 - (ev1_start - med))
                else:
                    h_start = max(0, ev1_start - med)
                    h_end = min(L2, ev1_end - med)
                ev_prop = min(1.0, (ev1_end - ev1_start) / max(1, L1))
                graph.add_embedded(
                    AssemblyEmbedded(
                        r1, r2, -med, rev2, nshared=n_cons, csk=csk,
                        ev_prop=ev_prop, host_evidence_start=h_start,
                        host_evidence_end=h_end, score=score,
                    )
                )
            elif med > 0:
                overlap = L1 - med
                if overlap >= self.min_overlap:
                    ikbp = float(np.median(dd)) * 1000.0 / max(1, overlap)
                    ev_prop = min(
                        1.0, (ev1_end - max(ev1_start, med)) / max(1, overlap)
                    )
                    graph.add_edge(
                        AssemblyEdge(
                            r1, False, r2, rev2, overlap, score,
                            nshared=n_cons, csk=min(csk, overlap),
                            ev_prop=max(0.0, ev_prop), ikbp=ikbp,
                            ev1_start=ev1_start, ev1_end=ev1_end,
                            ev2_start=ev2_start, ev2_end=ev2_end,
                        )
                    )
            else:
                overlap = L2 + med
                if overlap >= self.min_overlap:
                    ikbp = float(np.median(dd)) * 1000.0 / max(1, overlap)
                    ev_prop = min(
                        1.0, (min(ev1_end, overlap) - ev1_start) / max(1, overlap)
                    )
                    graph.add_edge(
                        AssemblyEdge(
                            r2, rev2, r1, False, overlap, score,
                            nshared=n_cons, csk=min(csk, overlap),
                            ev_prop=max(0.0, ev_prop), ikbp=ikbp,
                            ev1_start=ev2_start, ev1_end=ev2_end,
                            ev2_start=ev1_start, ev2_end=ev1_end,
                        )
                    )
        return graph

    # ------------------------------------------------------------------
    def layout_and_consensus(
        self, reads: list[np.ndarray], graph: AssemblyGraph
    ) -> list[np.ndarray]:
        """Path layout + overlap-concatenation consensus.

        Layout defaults to the reference's MST-based KruskalPath algorithm
        (assembly/layout.py: safe reciprocal-best edges seed paths, path
        ends merge Kruskal-style under cost/IKBP constraints, small
        repeat-bubble paths are absorbed); `layout_algorithm` selects the
        greedy variants instead (ref LayoutBuilderGreedyMaxOverlap /
        MinCost / MaxCoverageSharedKmers)."""
        from .layout import LayoutBuilderGreedy, LayoutBuilderKruskalPath

        algo = getattr(self, "layout_algorithm", "KruskalPath")
        if algo == "KruskalPath":
            builder = LayoutBuilderKruskalPath()
        else:
            builder = LayoutBuilderGreedy(algo)
        paths = builder.find_paths(graph)
        contigs: list[np.ndarray] = []
        for p in paths:
            pieces = []
            prev_overlap = 0
            for (r, rev), ov in zip(p.reads, [0] + p.overlaps):
                prev_overlap = ov
                seq = (
                    reads[r]
                    if not rev
                    else reverse_complement_codes(reads[r])
                )
                pieces.append(
                    seq[prev_overlap:]
                    if prev_overlap < len(seq)
                    else seq[:0]
                )
            contigs.append(np.concatenate(pieces))
        contigs.sort(key=len, reverse=True)
        return contigs

    # ------------------------------------------------------------------
    def assemble(self, reads: list[np.ndarray]) -> QualifiedSequenceList:
        """Full pipeline: graph -> layout -> end merge -> polish ->
        circularize (ref: Assembler.run stages :285-545); for ploidy>=2 a
        phase-filter pass re-assembles each haplotype read cluster
        (ref: ploidy loop :461-484)."""
        self._polish_reads = None
        if self.ploidy >= 2:
            return self._assemble_phased(reads)
        if self.graph_file:
            # resume from a graph checkpoint (ref: Assembler.java:323 load
            # path skipping graph construction)
            graph = AssemblyGraph.load(self.graph_file)
        else:
            graph = self._build_filtered_graph(reads)
            # error-correction rounds (ref: Assembler.java:415 +
            # AlignmentBasedIndelErrorsCorrector): correct read INDEL
            # errors against a draft, then rebuild the graph from the
            # corrected reads — substitutions stay untouched so het
            # signal survives for phasing.  The ORIGINAL reads are kept
            # for consensus polishing: corrected reads are biased toward
            # the draft's own errors (deletions filled with draft bases),
            # so polishing with them would lock draft errors in as
            # unanimous evidence
            self._polish_reads = reads
            for _round in range(self.error_correction_rounds):
                from .read_correction import correct_reads_indels

                draft = self.layout_and_consensus(reads, graph)
                if not draft:
                    break
                reads, n_ev = correct_reads_indels(draft, reads)
                self.read_indel_corrections += n_ev
                if n_ev == 0:
                    break
                graph = self._build_filtered_graph(reads)
        if self.save_graph_file:
            # ref: Assembler.java:417-434 saves the filtered graph so later
            # runs skip construction
            graph.save(self.save_graph_file)
        contigs = self.layout_and_consensus(reads, graph)
        return self._finish_contigs(contigs, reads)

    def _build_filtered_graph(self, reads: list[np.ndarray]) -> AssemblyGraph:
        graph = self.build_graph(reads)
        if self.remove_chimeras:
            # ref: Assembler.java:455 removeVerticesChimericReads
            graph.remove_chimeric_reads()
        graph.update_scores()
        graph.filter_edges_and_embedded(self.min_score_proportion)
        return graph

    def _finish_contigs(
        self, contigs: list[np.ndarray], reads: list[np.ndarray]
    ) -> QualifiedSequenceList:
        # polish from the UNBIASED read set (see the error-correction note)
        reads = getattr(self, "_polish_reads", None) or reads
        raw = None
        if self.polish_rounds > 0 and contigs:
            from ..core.sequences import RawRead
            from .polishing import polish_contigs

            raw = [
                RawRead(name=f"r{i}", sequence=decode_dna(r))
                for i, r in enumerate(reads)
            ]
            # one polish round BEFORE merging: on high-error read sets the
            # raw consensus carries enough error that end-overlap /
            # containment detection (exact k-mer anchors + fixed-diagonal
            # identity) misses real overlaps; polishing first makes the
            # contig set mergeable (ref polishes during consensus:
            # ConsensusBuilderBidirectionalWithPolishing.java:82)
            contigs, self.corrections = polish_contigs(contigs, raw, rounds=1)
        # dedupe -> merge -> polish to convergence: a redundant contig
        # that survives one containment pass (noisy) steals the read
        # support of its region from the kept contig, starving the polish
        # there; the second pass sees POLISHED contigs and removes it
        for _pass in range(2):
            n_before = len(contigs)
            if self.merge_ends and len(contigs) > 1:
                from .polishing import (
                    drop_contained_contigs,
                    merge_contig_ends,
                )

                contigs = drop_contained_contigs(contigs)
                contigs = merge_contig_ends(
                    contigs, min_overlap=self.min_overlap
                )
            if self.polish_rounds > 0 and contigs:
                contigs, more = polish_contigs(
                    contigs, raw, rounds=self.polish_rounds
                )
                self.corrections += more
            if len(contigs) == n_before:
                break
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

        # the draft exists only to DISCOVER het sites for phasing, so it
        # wants maximal contiguity, not conservative path building: the
        # greedy MaxOverlap layout chains reads of both haplotypes into
        # the longest possible backbone (cross-haplotype joins are fine
        # here — the het columns they expose are exactly the phasing
        # signal), while the conservative Kruskal reciprocal-best layout
        # fragments on diploid data because same-locus reads of the two
        # haplotypes compete for every junction
        draft_asm = Assembler(
            self.kmer_length,
            self.window_length,
            self.min_shared,
            self.min_overlap,
            self.batch_rows,
            polish_rounds=0,
            merge_ends=self.merge_ends,
            min_score_proportion=0.0,
            remove_chimeras=False,
        )
        draft_asm.layout_algorithm = "MaxOverlap"
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
                min_score_proportion=self.min_score_proportion,
                remove_chimeras=self.remove_chimeras,
            )
            sub.layout_algorithm = getattr(self, "layout_algorithm", "KruskalPath")
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

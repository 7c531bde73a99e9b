"""Assembly overlap graph.

Ref: src/ngsep/assembly/AssemblyGraph.java (vertices = read ends, edges =
overlaps, embedded reads), AssemblyEdge.java, AssemblyEmbedded.java,
AssemblySequencesRelationshipFilter.java.  Simplified model: an edge
records an overlap between the suffix of one oriented read and the prefix
of another; embedded reads are contained in a host read and removed from
layout.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class AssemblyEdge:
    """Suffix of (read1, rev1) overlaps prefix of (read2, rev2) by `overlap` bp."""

    read1: int
    rev1: bool
    read2: int
    rev2: bool
    overlap: int
    score: float  # supporting shared minimizers / weighted count


@dataclass
class AssemblyEmbedded:
    read: int
    host: int
    host_start: int
    reverse: bool


class AssemblyGraph:
    def __init__(self, n_reads: int):
        self.n_reads = n_reads
        self.edges: list[AssemblyEdge] = []
        self.embedded: dict[int, AssemblyEmbedded] = {}

    def add_edge(self, e: AssemblyEdge) -> None:
        self.edges.append(e)

    def add_embedded(self, emb: AssemblyEmbedded) -> None:
        prev = self.embedded.get(emb.read)
        self.embedded[emb.read] = emb

    def active_reads(self) -> list[int]:
        return [r for r in range(self.n_reads) if r not in self.embedded]

    def filtered_edges(self, min_score: float = 0) -> list[AssemblyEdge]:
        """Edges between non-embedded reads above a score threshold."""
        return [
            e
            for e in self.edges
            if e.score >= min_score
            and e.read1 not in self.embedded
            and e.read2 not in self.embedded
        ]

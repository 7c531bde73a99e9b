"""Read simulator with error profiles.

Ref: src/ngsep/simulation/SingleReadsSimulator.java (command
`SingleReadsSimulator`): uniform read sampling from a genome with
substitution/indel errors; read names encode the truth placement as
`<seqName>_<first1based>_<reverse>_<i>` (SingleReadsSimulator.java:229),
which the mapping-accuracy benchmark parses
(QualityStatisticsAlignmentSimulatedReads.java:57).
"""
from __future__ import annotations

import numpy as np

from ..core.genome import ReferenceGenome
from ..core.sequences import RawRead, decode_dna, reverse_complement_codes


class SingleReadsSimulator:
    def __init__(
        self,
        genome: ReferenceGenome,
        read_length: int = 100,
        substitution_error_rate: float = 0.005,
        indel_error_rate: float = 0.0,
        seed: int = 1,
        base_quality: int = 40,
    ):
        self.genome = genome
        self.read_length = read_length
        self.substitution_error_rate = substitution_error_rate
        self.indel_error_rate = indel_error_rate
        self.rng = np.random.default_rng(seed)
        self.base_quality = base_quality

    def simulate(self, num_reads: int) -> list[RawRead]:
        reads: list[RawRead] = []
        g = self.genome
        L = self.read_length
        # sample sequences weighted by length
        lengths = np.diff(g.offsets).astype(np.float64)
        ok = lengths >= L
        probs = np.where(ok, lengths, 0.0)
        probs = probs / probs.sum()
        qual_char = chr(33 + self.base_quality)
        for i in range(num_reads):
            si = int(self.rng.choice(len(lengths), p=probs))
            seq_len = int(lengths[si])
            start = int(self.rng.integers(0, seq_len - L + 1))  # 0-based
            codes = g.codes(si, start + 1, start + L).copy()
            reverse = bool(self.rng.random() < 0.5)
            # substitution errors
            if self.substitution_error_rate > 0:
                errs = self.rng.random(L) < self.substitution_error_rate
                idx = np.nonzero(errs)[0]
                if len(idx):
                    shift = self.rng.integers(1, 4, size=len(idx)).astype(np.int8)
                    codes[idx] = np.where(
                        codes[idx] < 4, (codes[idx] + shift) % 4, codes[idx]
                    )
            if reverse:
                codes = reverse_complement_codes(codes)
            name = f"{g.sequence_name(si)}_{start + 1}_{reverse}_{i + 1}"
            reads.append(
                RawRead(name=name, sequence=decode_dna(codes), qualities=qual_char * L)
            )
        return reads


def parse_simulated_read_name(name: str) -> tuple[str, int, bool]:
    """Inverse of the truth encoding: (seq_name, first 1-based, reverse)."""
    items = name.split("_")
    reverse = items[-2] == "True" or items[-2] == "true"
    first = int(items[-3])
    seq_name = "_".join(items[:-3])
    return seq_name, first, reverse

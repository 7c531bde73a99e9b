"""Read-depth CNV detection.

Ref: src/ngsep/discovery/rd/ — ReadDepthDistribution.java (genome bins of
100bp default, GC correction :223, depth distribution fit :286-357),
SingleSampleReadDepthAlgorithm.java:26-47 (algorithm interface),
PoissonHMMReadDepthAlgorithm.java + AbstractHMMReadDepthAlgorithm (HMM over
bins with copy-number states and Poisson-like emissions), CNVseqAlgorithm
(`ReadDepthComparator` command: case-control CNV from depth ratios).

TPU redesign: depth binning is one bincount; GC correction is a vectorized
per-GC-bin renormalization; the copy-number HMM runs through the log-space
scan kernels (kernels/hmm.py) over all bins of a sequence at once.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..align.read_alignment import ReadAlignment
from ..core.genome import ReferenceGenome
from ..kernels.hmm import viterbi_log
from ..math.phred import phred_score
from ..variants.model import CalledGenomicVariant, TYPE_CNV

DEFAULT_BIN_SIZE = 100  # ref: ReadDepthDistribution.java:45


class ReadDepthDistribution:
    """Genome-binned read depth with GC correction."""

    def __init__(self, genome: ReferenceGenome, bin_size: int = DEFAULT_BIN_SIZE):
        self.genome = genome
        self.bin_size = bin_size
        self.bins_per_seq: list[np.ndarray] = []
        self.gc_per_seq: list[np.ndarray] = []
        for si in range(genome.num_sequences):
            L = genome.sequence_length(si)
            nbins = (L + bin_size - 1) // bin_size
            self.bins_per_seq.append(np.zeros(nbins, np.float64))
            codes = genome.sequences[si].codes
            pad = nbins * bin_size - L
            padded = np.concatenate([codes, np.full(pad, 4, np.int8)])
            mat = padded.reshape(nbins, bin_size)
            gc = np.mean((mat == 1) | (mat == 2), axis=1)
            valid = np.mean(mat < 4, axis=1)
            gc = np.where(valid > 0.5, gc / np.maximum(valid, 1e-9), np.nan)
            self.gc_per_seq.append(gc)
        self.mean_read_depth = 0.0
        self.sigma_read_depth = 0.0

    def process_alignments(self, alns: list[ReadAlignment]) -> None:
        """Count read midpoints per bin (vectorized per sequence)."""
        by_seq: dict[str, list[int]] = {}
        for a in alns:
            if a.is_unmapped:
                continue
            mid = (a.first + a.last) // 2
            by_seq.setdefault(a.sequence_name, []).append(mid)
        for name, mids in by_seq.items():
            si = self.genome.index_of(name)
            if si < 0:
                continue
            idx = (np.array(mids, np.int64) - 1) // self.bin_size
            nbins = len(self.bins_per_seq[si])
            idx = idx[(idx >= 0) & (idx < nbins)]
            self.bins_per_seq[si] += np.bincount(idx, minlength=nbins)

    def correct_depth_by_gc_content(self) -> None:
        """Scale each bin's depth so all GC classes share the global mean.

        Ref: ReadDepthDistribution.correctDepthByGCContent (:223).
        """
        all_depth = np.concatenate(self.bins_per_seq)
        all_gc = np.concatenate(self.gc_per_seq)
        ok = ~np.isnan(all_gc)
        global_mean = all_depth[ok].mean() if ok.any() else 0.0
        gc_bins = np.clip((np.nan_to_num(all_gc, nan=-1) * 100).astype(int), -1, 100)
        means = np.zeros(101)
        for g in range(101):
            sel = ok & (gc_bins == g)
            if sel.sum() >= 10:
                means[g] = all_depth[sel].mean()
        for si in range(len(self.bins_per_seq)):
            gc = self.gc_per_seq[si]
            gb = np.clip((np.nan_to_num(gc, nan=-1) * 100).astype(int), -1, 100)
            m = np.where((gb >= 0), means[np.maximum(gb, 0)], 0.0)
            factor = np.where(m > 0, global_mean / np.maximum(m, 1e-9), 1.0)
            self.bins_per_seq[si] = self.bins_per_seq[si] * factor

    def fit(self) -> None:
        all_depth = np.concatenate(self.bins_per_seq)
        ok = all_depth > 0
        if ok.sum() == 0:
            return
        self.mean_read_depth = float(np.median(all_depth[ok]))
        self.sigma_read_depth = float(all_depth[ok].std())


class PoissonHMMReadDepthAlgorithm:
    """Copy-number HMM over depth bins with Poisson emissions.

    Ref: PoissonHMMReadDepthAlgorithm.java — states are copy numbers
    0..2*normal_ploidy, emission = Poisson(bin depth | cn/ploidy * mean),
    sticky transitions; CNV calls are maximal runs of non-normal states.
    """

    def __init__(
        self,
        normal_ploidy: int = 2,
        max_copies: int = 4,
        change_probability: float = 0.001,
        min_cnv_bins: int = 5,
    ):
        self.normal_ploidy = normal_ploidy
        self.n_states = max_copies + 1  # copy numbers 0..max_copies
        self.change_probability = change_probability
        self.min_cnv_bins = min_cnv_bins

    def call_cnvs(
        self, distribution: ReadDepthDistribution
    ) -> list[CalledGenomicVariant]:
        mean = distribution.mean_read_depth
        if mean <= 0:
            return []
        S = self.n_states
        p = self.change_probability
        trans = np.full((S, S), p / (S - 1))
        np.fill_diagonal(trans, 1 - p)
        log_trans = np.log10(trans)[None]
        log_start = np.full(S, -math.log10(S))
        out: list[CalledGenomicVariant] = []
        for si in range(distribution.genome.num_sequences):
            depth = distribution.bins_per_seq[si]
            if len(depth) < 2 or depth.sum() == 0:
                continue
            # Poisson log10 emissions per copy-number state; cn=0 keeps a
            # small residual rate (mismapped reads)
            lam = np.maximum(
                mean * np.arange(S)[None, :] / self.normal_ploidy, mean * 0.05
            )  # (1, S)
            d = np.round(depth)[:, None]
            log_emit = _poisson_log10(d, lam)
            path, _ = viterbi_log(log_start, log_trans, log_emit)
            path = np.asarray(path)
            # extract maximal runs of non-normal copy number
            seq_name = distribution.genome.sequence_name(si)
            bs = distribution.bin_size
            t = 0
            T = len(path)
            while t < T:
                cn = int(path[t])
                if cn == self.normal_ploidy:
                    t += 1
                    continue
                start = t
                while t < T and int(path[t]) == cn:
                    t += 1
                if t - start < self.min_cnv_bins:
                    continue
                seg_depth = depth[start:t].mean()
                # quality: Poisson LR of called cn vs normal ploidy on segment
                lr = float(
                    np.sum(
                        _poisson_log10(np.round(depth[start:t])[:, None], lam[:, [cn]])
                        - _poisson_log10(
                            np.round(depth[start:t])[:, None],
                            lam[:, [self.normal_ploidy]],
                        )
                    )
                )
                qual = min(255, max(0, int(round(10 * lr))))
                call = CalledGenomicVariant(
                    sequence_name=seq_name,
                    first=start * bs + 1,
                    alleles=["N"],
                    variant_type=TYPE_CNV,
                    quality=qual,
                    last_=min(t * bs, distribution.genome.sequence_length(si)),
                    copy_number=cn,
                    genotype_quality=qual,
                    total_read_depth=int(round(seg_depth)),
                    indexes_called_alleles=[0],
                )
                out.append(call)
        return out


def _poisson_log10(d: np.ndarray, lam: np.ndarray) -> np.ndarray:
    """log10 Poisson pmf, vectorized (d (T,1), lam (1,S))."""
    from math import lgamma

    lg = np.vectorize(lgamma)
    ln = d * np.log(lam) - lam - lg(d + 1.0)
    return ln / math.log(10.0)


def cnv_seq_compare(
    genome: ReferenceGenome,
    case_alns: list[ReadAlignment],
    control_alns: list[ReadAlignment],
    bin_size: int = DEFAULT_BIN_SIZE,
    min_ratio: float = 2.0,
    min_bins: int = 5,
) -> list[CalledGenomicVariant]:
    """Case-control CNV detection from depth ratios.

    Ref: discovery/rd/CNVseqAlgorithm.java (`ReadDepthComparator` command):
    per-bin depth ratio case/control normalized by totals, merged runs of
    extreme ratios become CNV calls.
    """
    case = ReadDepthDistribution(genome, bin_size)
    case.process_alignments(case_alns)
    control = ReadDepthDistribution(genome, bin_size)
    control.process_alignments(control_alns)
    tot_case = sum(b.sum() for b in case.bins_per_seq) or 1.0
    tot_ctrl = sum(b.sum() for b in control.bins_per_seq) or 1.0
    out: list[CalledGenomicVariant] = []
    for si in range(genome.num_sequences):
        c = case.bins_per_seq[si] / tot_case
        k = control.bins_per_seq[si] / tot_ctrl
        ratio = (c + 1e-9) / (k + 1e-9)
        extreme = (ratio >= min_ratio) | (ratio <= 1.0 / min_ratio)
        extreme &= (case.bins_per_seq[si] + control.bins_per_seq[si]) >= 5
        t = 0
        T = len(ratio)
        name = genome.sequence_name(si)
        while t < T:
            if not extreme[t]:
                t += 1
                continue
            up = ratio[t] > 1
            start = t
            while t < T and extreme[t] and (ratio[t] > 1) == up:
                t += 1
            if t - start < min_bins:
                continue
            seg_ratio = float(np.mean(ratio[start:t]))
            cn = max(0, int(round(2 * seg_ratio)))
            out.append(
                CalledGenomicVariant(
                    sequence_name=name,
                    first=start * bin_size + 1,
                    alleles=["N"],
                    variant_type=TYPE_CNV,
                    quality=int(min(255, 10 * abs(np.log2(seg_ratio)) * (t - start))),
                    last_=min(t * bin_size, genome.sequence_length(si)),
                    copy_number=cn,
                    indexes_called_alleles=[0],
                )
            )
    return out

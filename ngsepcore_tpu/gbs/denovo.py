"""De-novo GBS: k-mer prefix read clustering + per-cluster variant calling.

Ref: src/ngsep/gbs/KmerPrefixReadsClusteringAlgorithm.java:313-355 (command
`DeNovoGBS`): cluster reads across samples by their 31-bp k-mer prefix
(DNAShortKmerClusterMap), min cluster depth = max(#samples, default), max =
100x#samples (:319-321), per-cluster consensus + column-wise variant
calling with CountsHelper; ReadCluster.java (consensus/depth),
ProcessClusterVCFTask.java (per-cluster VCF records).

TPU redesign: prefixes pack into int64 codes (31 bases = 62 bits); one
global sort groups reads into clusters; per-cluster columns become one
dense (reads, length) matrix whose per-column, per-sample allele counts
feed the same contribution-table genotyping math as the reference-guided
caller.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.sequences import RawRead, decode_dna, encode_dna
from ..io.fastq import FastqFileReader
from ..kernels.genotyping import HET_RATE_DIPLOID, snv_contribution_table
from ..math.phred import phred_score
from ..variants.model import CalledGenomicVariant, TYPE_BIALLELIC_SNV
from ..vcf.io import VCFFileWriter, VCFRecord

PREFIX_LENGTH = 31  # ref: DNAShortKmerClusterMap k<=31


@dataclass
class ReadCluster:
    cluster_id: int
    reads: list[np.ndarray]
    samples: list[int]
    quals: list[np.ndarray]

    @property
    def depth(self) -> int:
        return len(self.reads)

    def consensus(self) -> np.ndarray:
        L = max(len(r) for r in self.reads)
        counts = np.zeros((L, 5), np.int32)
        for r in self.reads:
            idx = np.arange(len(r))
            np.add.at(counts, (idx, np.clip(r, 0, 4)), 1)
        return np.argmax(counts, axis=1).astype(np.int8)


class KmerPrefixReadsClusteringAlgorithm:
    def __init__(
        self,
        min_cluster_depth: int | None = None,
        max_cluster_depth_per_sample: int = 100,
        min_quality: int = 40,
        heterozygosity_rate: float = HET_RATE_DIPLOID,
    ):
        self.min_cluster_depth = min_cluster_depth
        self.max_cluster_depth_per_sample = max_cluster_depth_per_sample
        self.min_quality = min_quality
        self.heterozygosity_rate = heterozygosity_rate
        self._contribution = snv_contribution_table(4, 0.5)

    # ------------------------------------------------------------------
    def cluster_reads(
        self, reads_per_sample: list[list[RawRead]]
    ) -> list[ReadCluster]:
        n_samples = len(reads_per_sample)
        codes_l, sample_l, read_refs = [], [], []
        for si, reads in enumerate(reads_per_sample):
            for r in reads:
                c = r.codes
                if len(c) < PREFIX_LENGTH or np.any(c[:PREFIX_LENGTH] >= 4):
                    continue
                prefix = c[:PREFIX_LENGTH].astype(np.int64)
                code = np.int64(0)
                for b in prefix:
                    code = code * 4 + b
                codes_l.append(code)
                sample_l.append(si)
                read_refs.append(r)
        if not codes_l:
            return []
        codes = np.array(codes_l)
        samples = np.array(sample_l)
        order = np.argsort(codes, kind="stable")
        codes, samples = codes[order], samples[order]
        refs = [read_refs[i] for i in order]
        starts = np.nonzero(np.concatenate([[True], codes[1:] != codes[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(codes)]])
        min_depth = self.min_cluster_depth or max(n_samples, 5)
        max_depth = self.max_cluster_depth_per_sample * n_samples
        clusters = []
        for ci, (s, e) in enumerate(zip(starts, ends)):
            depth = e - s
            if depth < min_depth or depth > max_depth:
                continue
            rs = refs[s:e]
            clusters.append(
                ReadCluster(
                    cluster_id=len(clusters) + 1,
                    reads=[r.codes for r in rs],
                    samples=[int(x) for x in samples[s:e]],
                    quals=[
                        r.phred if r.qualities else np.full(len(r), 30, np.int8)
                        for r in rs
                    ],
                )
            )
        return clusters

    # ------------------------------------------------------------------
    def call_cluster_variants(
        self, cluster: ReadCluster, n_samples: int
    ) -> list[VCFRecord]:
        cons = cluster.consensus()
        L = len(cons)
        n = cluster.depth
        mat = np.full((n, L), -1, np.int8)
        qmat = np.zeros((n, L), np.int8)
        for i, (r, q) in enumerate(zip(cluster.reads, cluster.quals)):
            mat[i, : len(r)] = r
            qmat[i, : len(r)] = q[: len(r)]
        sample_arr = np.array(cluster.samples)
        out: list[VCFRecord] = []
        C = self._contribution
        het = self.heterozygosity_rate
        prior = np.where(
            np.eye(4, dtype=bool), np.log10((1 - het) / 4), np.log10(het / 12)
        )
        # variable columns only (skip the monomorphic majority)
        variable = [
            j
            for j in range(PREFIX_LENGTH, L)
            if cons[j] < 4 and np.any((mat[:, j] >= 0) & (mat[:, j] != cons[j]))
        ]
        for j in variable:
            col = mat[:, j]
            qcol = np.minimum(qmat[:, j], 30)
            ok = (col >= 0) & (col < 4) & (qcol > 3)
            if not ok.any():
                continue
            calls = []
            variant_qs = 0
            alt_allele = None
            for si in range(n_samples):
                sel = ok & (sample_arr == si)
                logcond = np.zeros((4, 4))
                for a, q in zip(col[sel], qcol[sel]):
                    logcond += C[a, q]
                ev = logcond + prior
                rel = ev - ev.max()
                p = np.where(rel < -20, 0.0, 10.0 ** rel)
                post = p / p.sum() if p.sum() > 0 else p
                ref = int(cons[j])
                bi = bj = ref
                best = post[ref][ref]
                for i2 in range(4):
                    for j2 in range(i2, 4):
                        prob = post[i2][j2] + (post[j2][i2] if i2 != j2 else 0)
                        if prob > best + 0.01:
                            best, bi, bj = prob, i2, j2
                gq = phred_score(max(0.0, 1 - best)) if sel.any() else 0
                calls.append((bi, bj, gq, int(sel.sum())))
                if (bi, bj) != (ref, ref) and gq > variant_qs:
                    variant_qs = gq
                    alt_allele = bi if bi != ref else bj
            if variant_qs < self.min_quality or alt_allele is None:
                continue
            ref_c = "ACGT"[cons[j]]
            alt_c = "ACGT"[alt_allele]
            alleles = [ref_c, alt_c]
            vcf_calls = []
            for si, (bi, bj, gq, depth) in enumerate(calls):
                cgv = CalledGenomicVariant(
                    sequence_name=f"Cluster_{cluster.cluster_id}",
                    first=j + 1,
                    alleles=alleles,
                    variant_type=TYPE_BIALLELIC_SNV,
                    quality=variant_qs,
                    sample_id=str(si),
                    genotype_quality=gq,
                    total_read_depth=depth,
                )
                idxs = []
                for a in sorted({bi, bj}):
                    if a == cons[j]:
                        idxs.append(0)
                    elif a == alt_allele:
                        idxs.append(1)
                if idxs and depth > 0:
                    cgv.indexes_called_alleles = idxs
                vcf_calls.append(cgv)
            out.append(VCFRecord(variant=vcf_calls[0], calls=vcf_calls))
        return out

    # ------------------------------------------------------------------
    def run(
        self, fastq_files: list[str], sample_ids: list[str], output_prefix: str
    ) -> int:
        reads_per_sample = [list(FastqFileReader(p)) for p in fastq_files]
        clusters = self.cluster_reads(reads_per_sample)
        n = 0
        with VCFFileWriter(output_prefix + ".vcf", sample_ids) as w:
            for cluster in clusters:
                for rec in self.call_cluster_variants(cluster, len(sample_ids)):
                    w.write(rec)
                    n += 1
        return n

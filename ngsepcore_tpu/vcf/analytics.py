"""VCF downstream analytics: filter, summary stats, diversity, density,
distance matrix, comparator, merge.

Ref: src/ngsep/vcf/VCFFilter.java (26 options: quality/depth/MAF/het/regions/
samples filters), VCFSummaryStatisticsCalculator.java,
VCFDiversityCalculator.java (per-site MAF, observed/expected heterozygosity,
Wright F), VCFVariantDensityCalculator.java, VCFDistanceMatrixCalculator.java,
VCFComparator.java (genotype concordance), IndividualSampleVariantsMerge /
ConsistentVCFFilesMerge (population merge).

TPU note: the population genotype matrix (sites x samples, dosage-coded)
drives all of these; the distance matrix is computed on device as one-hot
matmuls (MXU path) — the per-pair scalar loops of the reference collapse
into a single (samples, sites*3) @ (sites*3, samples) product.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..core.regions import GenomicRegionSortedCollection
from ..variants.model import CalledGenomicVariant, GenomicVariant
from .io import VCFFileReader, VCFFileWriter, VCFRecord


def dosage_matrix(records: list[VCFRecord]) -> tuple[np.ndarray, list[str]]:
    """(sites, samples) int8 dosage matrix: 0/1/2 alt-allele dose, -1 missing.

    Multi-allelic records use the first alternative allele.
    """
    n_samples = len(records[0].calls) if records else 0
    out = np.full((len(records), n_samples), -1, np.int8)
    for i, r in enumerate(records):
        for s, c in enumerate(r.calls):
            if c.is_undecided:
                continue
            idxs = c.indexes_called_alleles
            if len(idxs) == 1:
                idxs = idxs * 2
            out[i, s] = sum(1 for a in idxs if a != 0)
    return out, [c.sample_id or str(i) for i, c in enumerate(records[0].calls)]


# --------------------------------------------------------------------------
@dataclass
class VCFFilter:
    """Site and genotype filters (subset of ref's 26 options, the common ones)."""

    min_genotype_quality: int = 0
    min_depth: int = 0
    min_quality: int = 0  # variant QS
    min_samples_genotyped: int = 0
    min_maf: float = 0.0
    max_maf: float = 0.5
    min_oh: float = 0.0
    max_oh: float = 1.0  # observed heterozygosity bounds
    keep_only_snvs: bool = False
    keep_only_biallelic: bool = False
    regions: GenomicRegionSortedCollection | None = None
    invert_regions: bool = False
    sample_ids: list[str] | None = None
    max_sites: int | None = None

    def apply(self, records: list[VCFRecord]) -> list[VCFRecord]:
        out = []
        for r in records:
            v = r.variant
            if self.keep_only_snvs and not v.is_snv:
                continue
            if self.keep_only_biallelic and not v.is_biallelic:
                continue
            if v.quality < self.min_quality:
                continue
            if self.regions is not None:
                inside = bool(
                    self.regions.find_spanning(v.sequence_name, v.first, v.last)
                )
                if inside == self.invert_regions:
                    continue
            calls = r.calls
            if self.sample_ids is not None:
                keep = set(self.sample_ids)
                calls = [c for c in calls if c.sample_id in keep]
                r = VCFRecord(
                    variant=r.variant, calls=calls, info=r.info, filters=r.filters,
                    format_str=r.format_str,
                )
            # genotype-level filters: drop low-quality genotypes to undecided
            for c in calls:
                if not c.is_undecided and (
                    c.genotype_quality < self.min_genotype_quality
                    or c.total_read_depth < self.min_depth
                ):
                    c.indexes_called_alleles = []
            stats = site_diversity(r)
            if stats.genotyped < self.min_samples_genotyped:
                continue
            if calls and stats.genotyped > 0:
                if not (self.min_maf <= stats.maf <= self.max_maf):
                    continue
                if not (self.min_oh <= stats.observed_het <= self.max_oh):
                    continue
            out.append(r)
            if self.max_sites is not None and len(out) >= self.max_sites:
                break
        return out


# --------------------------------------------------------------------------
@dataclass
class SiteDiversity:
    genotyped: int = 0
    n_alleles_called: int = 0
    maf: float = 0.0
    observed_het: float = 0.0
    expected_het: float = 0.0
    f: float = 0.0
    allele_counts: list[int] = field(default_factory=list)


def site_diversity(record: VCFRecord) -> SiteDiversity:
    """Per-site diversity (ref: VCFDiversityCalculator / DiversityStatistics)."""
    n_alleles = len(record.variant.alleles)
    counts = [0] * n_alleles
    genotyped = 0
    het = 0
    for c in record.calls:
        if c.is_undecided:
            continue
        genotyped += 1
        idxs = c.indexes_called_alleles
        if len(idxs) == 1:
            idxs = idxs * 2
        for a in idxs:
            if 0 <= a < n_alleles:
                counts[a] += 1
        if len(set(idxs)) > 1:
            het += 1
    total = sum(counts)
    sd = SiteDiversity(genotyped=genotyped, allele_counts=counts)
    if genotyped == 0 or total == 0:
        return sd
    freqs = [c / total for c in counts]
    sorted_f = sorted(freqs, reverse=True)
    sd.maf = sorted_f[1] if len(sorted_f) > 1 else 0.0
    sd.observed_het = het / genotyped
    sd.expected_het = 1.0 - sum(f * f for f in freqs)
    if sd.expected_het > 0:
        sd.f = 1.0 - sd.observed_het / sd.expected_het
    sd.n_alleles_called = sum(1 for c in counts if c > 0)
    return sd


class VCFSummaryStatisticsCalculator:
    """Variant counts report by category (ref: VCFSummaryStatisticsCalculator)."""

    def __init__(self):
        self.counts: dict[str, int] = {}
        self.genotype_calls = 0
        self.homozygous_alt = 0
        self.heterozygous = 0
        self.undecided = 0
        self.transitions = 0
        self.transversions = 0

    def process(self, record: VCFRecord) -> None:
        v = record.variant
        key = v.variant_type
        self.counts[key] = self.counts.get(key, 0) + 1
        if v.is_snv and v.is_biallelic:
            pair = {v.alleles[0], v.alleles[1]}
            if pair in ({"A", "G"}, {"C", "T"}):
                self.transitions += 1
            else:
                self.transversions += 1
        for c in record.calls:
            if c.is_undecided:
                self.undecided += 1
            else:
                self.genotype_calls += 1
                if c.is_heterozygous:
                    self.heterozygous += 1
                elif not c.is_homozygous_reference:
                    self.homozygous_alt += 1

    def print_report(self, fh) -> None:
        fh.write("Variant counts by type\n")
        for k, v in sorted(self.counts.items()):
            fh.write(f"{k}\t{v}\n")
        if self.transversions > 0:
            fh.write(f"Ts/Tv\t{self.transitions / self.transversions:.4f}\n")
        fh.write(f"Genotype calls\t{self.genotype_calls}\n")
        fh.write(f"Heterozygous\t{self.heterozygous}\n")
        fh.write(f"Homozygous alternative\t{self.homozygous_alt}\n")
        fh.write(f"Undecided\t{self.undecided}\n")


def variant_density(
    records: list[VCFRecord], window: int = 100000
) -> list[tuple[str, int, int]]:
    """Variant counts in genomic windows (ref: VCFVariantDensityCalculator)."""
    counts: dict[tuple[str, int], int] = {}
    order: list[tuple[str, int]] = []
    for r in records:
        key = (r.variant.sequence_name, (r.variant.first - 1) // window)
        if key not in counts:
            counts[key] = 0
            order.append(key)
        counts[key] += 1
    return [(seq, w * window + 1, counts[(seq, w)]) for seq, w in order]


# --------------------------------------------------------------------------
def distance_matrix(records: list[VCFRecord]) -> tuple[np.ndarray, list[str]]:
    """Genetic distance matrix from genotype dosages.

    Ref: VCFDistanceMatrixCalculator (default IBS-style distance: average
    |dosage_i - dosage_j| / 2 over shared genotyped sites).  Runs as three
    one-hot matmuls on device — MXU-shaped instead of per-pair loops.
    """
    dos, samples = dosage_matrix(records)
    import jax.numpy as jnp

    d = jnp.asarray(dos)
    valid = (d >= 0).astype(jnp.float32)  # (T, N)
    shared = valid.T @ valid  # (N, N) sites genotyped in both
    onehot = jnp.stack([(d == g).astype(jnp.float32) for g in (0, 1, 2)], 0)  # (3,T,N)
    # sum over sites of |di-dj|: |0-1|=1,|0-2|=2,|1-2|=1
    cross = jnp.einsum("gtn,htm->ghnm", onehot, onehot)
    absdiff = jnp.zeros_like(shared)
    for g in range(3):
        for h in range(3):
            absdiff = absdiff + abs(g - h) * cross[g, h]
    dist = np.array(absdiff / jnp.maximum(shared, 1.0) / 2.0)
    np.fill_diagonal(dist, 0.0)
    return dist, samples


def write_distance_matrix(dist: np.ndarray, samples: list[str], fh) -> None:
    """Generic/PHYLIP-like matrix output (ref: DistanceMatrix print)."""
    fh.write(f"{len(samples)}\n")
    for i, s in enumerate(samples):
        fh.write(s + " " + " ".join(f"{x:.6f}" for x in dist[i]) + "\n")


def load_distance_matrix(fh) -> tuple[np.ndarray, list[str]]:
    n = int(fh.readline().strip())
    names = []
    rows = []
    for _ in range(n):
        parts = fh.readline().split()
        names.append(parts[0])
        rows.append([float(x) for x in parts[1:]])
    return np.array(rows), names


# --------------------------------------------------------------------------
@dataclass
class GenotypeComparisonResult:
    both_genotyped: int = 0
    concordant: int = 0
    only_first: int = 0
    only_second: int = 0

    @property
    def concordance(self) -> float:
        return self.concordant / self.both_genotyped if self.both_genotyped else 0.0


def compare_vcfs(
    records1: list[VCFRecord], records2: list[VCFRecord]
) -> GenotypeComparisonResult:
    """Genotype concordance between two VCFs on shared sites/samples.

    Ref: VCFComparator.java.
    """
    res = GenotypeComparisonResult()
    idx2 = {
        (r.variant.sequence_name, r.variant.first): r for r in records2
    }
    keys1 = {(r.variant.sequence_name, r.variant.first) for r in records1}
    res.only_second += sum(1 for k in idx2 if k not in keys1)
    for r1 in records1:
        key = (r1.variant.sequence_name, r1.variant.first)
        r2 = idx2.get(key)
        if r2 is None:
            res.only_first += 1
            continue
        calls2 = {c.sample_id: c for c in r2.calls}
        # positional fallback when sample ids don't match (e.g. comparing a
        # single-sample callset against a differently-named truth set)
        positional = not any(c.sample_id in calls2 for c in r1.calls)
        for ci, c1 in enumerate(r1.calls):
            if positional:
                c2 = r2.calls[ci] if ci < len(r2.calls) else None
            else:
                c2 = calls2.get(c1.sample_id)
            if c2 is None:
                continue
            g1 = None if c1.is_undecided else sorted(c1.called_alleles())
            g2 = None if c2.is_undecided else sorted(c2.called_alleles())
            if g1 is not None and g2 is not None:
                res.both_genotyped += 1
                if g1 == g2:
                    res.concordant += 1
            elif g1 is not None:
                res.only_first += 1
            elif g2 is not None:
                res.only_second += 1
    return res


# --------------------------------------------------------------------------
def merge_vcfs(record_lists: list[list[VCFRecord]], sample_ids: list[str]) -> list[VCFRecord]:
    """Merge per-sample VCFs into one population VCF.

    Ref: IndividualSampleVariantsMerge / ConsistentVCFFilesMerge — union of
    sites; samples without a call at a site get an undecided genotype.
    """
    sites: dict[tuple[str, int, tuple[str, ...]], GenomicVariant] = {}
    per_sample: list[dict[tuple, CalledGenomicVariant]] = []
    for records in record_lists:
        m = {}
        for r in records:
            key = (r.variant.sequence_name, r.variant.first, tuple(r.variant.alleles))
            if key not in sites:
                sites[key] = r.variant
            else:
                v = sites[key]
                v.quality = max(v.quality, r.variant.quality)
            if r.calls:
                m[key] = r.calls[0]
        per_sample.append(m)
    out = []
    for key in sorted(sites.keys(), key=lambda k: (k[0], k[1])):
        v = sites[key]
        calls = []
        for si, m in enumerate(per_sample):
            c = m.get(key)
            if c is None:
                c = CalledGenomicVariant(
                    sequence_name=v.sequence_name,
                    first=v.first,
                    alleles=list(v.alleles),
                    variant_type=v.variant_type,
                    sample_id=sample_ids[si],
                )
            else:
                c.sample_id = sample_ids[si]
            calls.append(c)
        out.append(VCFRecord(variant=v, calls=calls))
    return out

"""VCFConverter — export genotypes to population-genetics formats.

Ref: src/ngsep/vcf/VCFConverter.java:57-75 — 19 output formats
(Structure/Fasta/rrBLUP/Matrix/Hapmap/GWASPoly/Spagedi/Plink/Haploview/
Emma/PowerMarker/Eigensoft/Flapjack/Darwin/TreeMix/JoinMap/Phase/
FineStructure/GenePop).  All are projections of the same genotype matrix;
each printer below consumes the biallelic-SNV record list + dosage matrix.
"""
from __future__ import annotations

import numpy as np

from .analytics import dosage_matrix
from .io import VCFRecord

IUPAC_HET = {
    frozenset("AC"): "M",
    frozenset("AG"): "R",
    frozenset("AT"): "W",
    frozenset("CG"): "S",
    frozenset("CT"): "Y",
    frozenset("GT"): "K",
}


def _biallelic_snvs(records: list[VCFRecord]) -> list[VCFRecord]:
    return [r for r in records if r.variant.is_snv and r.variant.is_biallelic]


def _genotype_chars(r: VCFRecord, dosage: int) -> str:
    ref, alt = r.variant.alleles[0], r.variant.alleles[1]
    if dosage == 0:
        return ref
    if dosage == 2:
        return alt
    if dosage == 1:
        return IUPAC_HET.get(frozenset((ref, alt)), "N")
    return "N"


def convert_matrix(records, out_prefix: str) -> None:
    """Simple genotype matrix (ref: printMatrix)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_genotypes.txt", "w") as fh:
        fh.write("CHROM\tPOS\t" + "\t".join(samples) + "\n")
        for i, r in enumerate(recs):
            row = ["-" if d < 0 else str(d) for d in dos[i]]
            fh.write(f"{r.variant.sequence_name}\t{r.variant.first}\t" + "\t".join(row) + "\n")


def convert_fasta(records, out_prefix: str) -> None:
    """Concatenated IUPAC consensus per sample (ref: printFasta)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_aln.fa", "w") as fh:
        for s, name in enumerate(samples):
            seq = "".join(_genotype_chars(recs[i], int(dos[i, s])) for i in range(len(recs)))
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                fh.write(seq[i : i + 80] + "\n")


def convert_plink(records, out_prefix: str) -> None:
    """PLINK .ped/.map (ref: printPlink)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + ".map", "w") as fh:
        for r in recs:
            v = r.variant
            chrom = v.sequence_name.replace("chr", "")
            fh.write(f"{chrom}\t{v.var_id or f'{v.sequence_name}_{v.first}'}\t0\t{v.first}\n")
    with open(out_prefix + ".ped", "w") as fh:
        for s, name in enumerate(samples):
            fields = [name, name, "0", "0", "0", "-9"]
            for i, r in enumerate(recs):
                ref, alt = r.variant.alleles[:2]
                d = int(dos[i, s])
                pair = {0: (ref, ref), 1: (ref, alt), 2: (alt, alt)}.get(d, ("0", "0"))
                fields.extend(pair)
            fh.write("\t".join(fields) + "\n")


def convert_structure(records, out_prefix: str) -> None:
    """STRUCTURE two-row-per-sample format (ref: printStructure)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_structure.txt", "w") as fh:
        for s, name in enumerate(samples):
            rows = [[], []]
            for i in range(len(recs)):
                d = int(dos[i, s])
                a = {0: (1, 1), 1: (1, 2), 2: (2, 2)}.get(d, (-9, -9))
                rows[0].append(str(a[0]))
                rows[1].append(str(a[1]))
            fh.write(name + " " + " ".join(rows[0]) + "\n")
            fh.write(name + " " + " ".join(rows[1]) + "\n")


def convert_hapmap(records, out_prefix: str) -> None:
    """HapMap format (ref: printHapmap)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_hmp.txt", "w") as fh:
        header = [
            "rs#", "alleles", "chrom", "pos", "strand", "assembly#", "center",
            "protLSID", "assayLSID", "panelLSID", "QCcode",
        ] + samples
        fh.write("\t".join(header) + "\n")
        for i, r in enumerate(recs):
            v = r.variant
            row = [
                v.var_id or f"{v.sequence_name}_{v.first}",
                f"{v.alleles[0]}/{v.alleles[1]}",
                v.sequence_name,
                str(v.first),
                "+", "NA", "NA", "NA", "NA", "NA", "NA",
            ]
            for s in range(len(samples)):
                d = int(dos[i, s])
                ref, alt = v.alleles[:2]
                g = {0: ref + ref, 1: ref + alt, 2: alt + alt}.get(d, "NN")
                row.append(g)
            fh.write("\t".join(row) + "\n")


def convert_rrblup(records, out_prefix: str) -> None:
    """rrBLUP -1/0/1 coding (ref: printrrBLUP)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_rrBLUP.in", "w") as fh:
        fh.write("MARKER\tCHR\tPOS\t" + "\t".join(samples) + "\n")
        for i, r in enumerate(recs):
            v = r.variant
            vals = ["NA" if d < 0 else str(int(d) - 1) for d in dos[i]]
            fh.write(
                f"{v.var_id or f'{v.sequence_name}_{v.first}'}\t{v.sequence_name}\t{v.first}\t"
                + "\t".join(vals) + "\n"
            )


def convert_emma(records, out_prefix: str) -> None:
    """EMMA 0/0.5/1 matrix (ref: printEmma)."""
    recs = _biallelic_snvs(records)
    dos, _ = dosage_matrix(recs)
    with open(out_prefix + "_emma.in", "w") as fh:
        for i in range(len(recs)):
            vals = ["NA" if d < 0 else str(d / 2.0) for d in dos[i]]
            fh.write(" ".join(vals) + "\n")


def convert_treemix(records, populations: dict[str, str], out_prefix: str) -> None:
    """TreeMix allele counts per population (ref: printTreeMix)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    pops = sorted(set(populations.values()))
    import gzip

    with gzip.open(out_prefix + "_treemix.txt.gz", "wt") as fh:
        fh.write(" ".join(pops) + "\n")
        for i in range(len(recs)):
            cols = []
            for p in pops:
                alt = ref = 0
                for s, name in enumerate(samples):
                    if populations.get(name) != p:
                        continue
                    d = int(dos[i, s])
                    if d >= 0:
                        alt += d
                        ref += 2 - d
                cols.append(f"{ref},{alt}")
            fh.write(" ".join(cols) + "\n")


def convert_eigensoft(records, out_prefix: str) -> None:
    """EIGENSOFT geno/snp/ind files (ref: printEigensoft)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + ".eigenstratgeno", "w") as fh:
        for i in range(len(recs)):
            fh.write(
                "".join("9" if d < 0 else str(2 - int(d)) for d in dos[i]) + "\n"
            )
    with open(out_prefix + ".snp", "w") as fh:
        for r in recs:
            v = r.variant
            fh.write(
                f"{v.var_id or f'{v.sequence_name}_{v.first}'}\t{v.sequence_name}\t0.0\t{v.first}\t{v.alleles[0]}\t{v.alleles[1]}\n"
            )
    with open(out_prefix + ".ind", "w") as fh:
        for s in samples:
            fh.write(f"{s}\tU\tControl\n")


def convert_genepop(records, populations: dict[str, str], out_prefix: str) -> None:
    """GenePop format (ref: printGenePop)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    pops: dict[str, list[int]] = {}
    for s, name in enumerate(samples):
        pops.setdefault(populations.get(name, "pop1"), []).append(s)
    with open(out_prefix + "_genepop.txt", "w") as fh:
        fh.write("Converted by ngsepcore_tpu\n")
        for r in recs:
            v = r.variant
            fh.write(f"{v.var_id or f'{v.sequence_name}_{v.first}'}\n")
        for pop, members in pops.items():
            fh.write("Pop\n")
            for s in members:
                codes = []
                for i in range(len(recs)):
                    d = int(dos[i, s])
                    g = {0: "0101", 1: "0102", 2: "0202"}.get(d, "0000")
                    codes.append(g)
                fh.write(f"{samples[s]}, " + " ".join(codes) + "\n")


def convert_darwin(records, out_prefix: str) -> None:
    """DARwin .don/.var files (ref: printDarwin)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + ".don", "w") as fh:
        fh.write(f"@DARwin 5.0 - DON\n{len(samples)}\t1\nN°\tName\n")
        for s, name in enumerate(samples):
            fh.write(f"{s + 1}\t{name}\n")
    with open(out_prefix + ".var", "w") as fh:
        fh.write(f"@DARwin 5.0 - ALLELIC - 2\n{len(samples)}\t{len(recs)}\n")
        fh.write("N°\t" + "\t".join(
            f"{r.variant.sequence_name}_{r.variant.first}" for r in recs
        ) + "\n")
        for s in range(len(samples)):
            vals = []
            for i in range(len(recs)):
                d = int(dos[i, s])
                vals.append({0: "1/1", 1: "1/2", 2: "2/2"}.get(d, "?/?"))
            fh.write(f"{s + 1}\t" + "\t".join(vals) + "\n")


def convert_flapjack(records, out_prefix: str) -> None:
    """Flapjack map + genotype files (ref: printFlapjack)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + ".fjmap", "w") as fh:
        for r in recs:
            v = r.variant
            fh.write(
                f"{v.var_id or f'{v.sequence_name}_{v.first}'}\t{v.sequence_name}\t{v.first}\n"
            )
    with open(out_prefix + ".fjgenotype", "w") as fh:
        fh.write(
            "\t" + "\t".join(
                r.variant.var_id or f"{r.variant.sequence_name}_{r.variant.first}"
                for r in recs
            ) + "\n"
        )
        for s, name in enumerate(samples):
            vals = []
            for i, r in enumerate(recs):
                ref, alt = r.variant.alleles[:2]
                d = int(dos[i, s])
                vals.append({0: ref, 1: ref + "/" + alt, 2: alt}.get(d, "-"))
            fh.write(name + "\t" + "\t".join(vals) + "\n")


def convert_phase(records, out_prefix: str) -> None:
    """PHASE input (ref: printPhase)."""
    recs = _biallelic_snvs(records)
    dos, samples = dosage_matrix(recs)
    with open(out_prefix + "_phase.inp", "w") as fh:
        fh.write(f"{len(samples)}\n{len(recs)}\n")
        fh.write("P " + " ".join(str(r.variant.first) for r in recs) + "\n")
        fh.write("S" * len(recs) + "\n")
        for s, name in enumerate(samples):
            fh.write(f"#{name}\n")
            rows = [[], []]
            for i, r in enumerate(recs):
                ref, alt = r.variant.alleles[:2]
                d = int(dos[i, s])
                a = {0: (ref, ref), 1: (ref, alt), 2: (alt, alt)}.get(d, ("?", "?"))
                rows[0].append(a[0])
                rows[1].append(a[1])
            fh.write(" ".join(rows[0]) + "\n")
            fh.write(" ".join(rows[1]) + "\n")


CONVERTERS = {
    "Matrix": convert_matrix,
    "Fasta": convert_fasta,
    "Plink": convert_plink,
    "Structure": convert_structure,
    "Hapmap": convert_hapmap,
    "rrBLUP": convert_rrblup,
    "Emma": convert_emma,
    "Eigensoft": convert_eigensoft,
    "Darwin": convert_darwin,
    "Flapjack": convert_flapjack,
    "Phase": convert_phase,
}

POPULATION_CONVERTERS = {
    "TreeMix": convert_treemix,
    "GenePop": convert_genepop,
}

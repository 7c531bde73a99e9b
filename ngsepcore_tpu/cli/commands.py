"""Command implementations wired into the registry.

Command ids, groups, and flags mirror the reference's CommandsDescriptor.xml
(Appendix B of SURVEY.md is the full 44-command parity checklist; commands
not yet implemented raise a clear not-implemented-yet error and are tracked
there).
"""
from __future__ import annotations

import sys

from .registry import Command, Option, register


# ---- Reads group ---------------------------------------------------------

def _run_kmers_extractor(opts: dict, args: list[str]) -> None:
    from ..index.kmers_extractor import KmersExtractor

    out = opts.pop("output_prefix", None) or (args[0] + "_out" if args else "kmers")
    text = opts.pop("text_output", False)
    ex = KmersExtractor(**opts)
    ex.run(args, out, text_output=bool(text))
    print(f"Processed {len(args)} file(s); distinct {ex.kmers_map.size} kmers")


register(
    Command(
        id="KmersExtractor",
        former_id="KmersCounter",
        group="Reads",
        description="Counts k-mers from sequencing reads or assembled sequences",
        runner=_run_kmers_extractor,
        options=[
            Option("k", "kmer_length", "int", 15, "K-mer length (default 15)"),
            Option("m", "min_kmer_count", "int", 5, "Minimum count to report"),
            Option("s", "only_forward_strand", "bool", False, "Only forward strand"),
            Option("o", "output_prefix", "str", None, "Output prefix"),
            Option("t", "text_output", "bool", False, "Write kmers as text"),
        ],
    )
)


def _run_genome_indexer(opts: dict, args: list[str]) -> None:
    from ..core.genome import ReferenceGenome
    from ..index.minimizer_table import MinimizerTable

    if not args:
        raise SystemExit("Usage: GenomeIndexer <genome.fa> [-o outprefix]")
    genome = ReferenceGenome.load(args[0])
    out = opts.pop("output_prefix", None) or args[0]
    t = MinimizerTable.build_from_genome(genome, **opts)
    t.save(out + "_minimizers.npz")
    print(f"Indexed {genome.total_length} bp; {t.size} minimizer entries")


register(
    Command(
        id="GenomeIndexer",
        group="Reads",
        description="Builds and saves the minimizer seed index of a genome",
        runner=_run_genome_indexer,
        options=[
            Option("k", "k", "int", 25, "K-mer length"),
            Option("w", "window", "int", 20, "Minimizer window"),
            Option("o", "output_prefix", "str", None, "Output prefix"),
        ],
    )
)


def _run_reads_aligner(opts: dict, args: list[str]) -> None:
    from ..align.reads_aligner import ReadsAligner
    from ..core.genome import ReferenceGenome
    from ..io.fastq import FastqFileReader
    from ..io.sam import ReadAlignmentFileWriter

    genome_path = opts.pop("genome", None)
    out = opts.pop("output_file", None)
    sample = opts.pop("sample_id", None) or "Sample"
    if not genome_path or not args:
        raise SystemExit("Usage: ReadsAligner -r <genome.fa> -o <out.sam> <reads.fastq>")
    genome = ReferenceGenome.load(genome_path)
    aligner = ReadsAligner(genome, **opts)
    n_out = 0
    with ReadAlignmentFileWriter(genome.sequences, out or "-", sample_id=sample) as w:
        for path in args:
            for batch in FastqFileReader(path).iter_batches(4096):
                for alns in aligner.align_batch(batch):
                    for a in alns:
                        w.write(a)
                        n_out += 1
    print(
        f"Reads: {aligner.total_reads} Aligned: {aligner.aligned_reads} "
        f"records: {n_out}",
        file=sys.stderr,
    )


register(
    Command(
        id="ReadsAligner",
        group="Reads",
        description="Aligns reads to a reference genome",
        runner=_run_reads_aligner,
        options=[
            Option("r", "genome", "str", None, "Reference genome FASTA"),
            Option("o", "output_file", "str", None, "Output SAM file"),
            Option("s", "sample_id", "str", None, "Sample id for read group"),
            Option("k", "kmer_length", "int", 25, "Seed k-mer length"),
            Option("w", "window_length", "int", 20, "Minimizer window"),
            Option("a", "max_alns_per_read", "int", 1, "Max alignments per read"),
        ],
    )
)


# ---- Discovery group -----------------------------------------------------

def _run_single_sample_detector(opts: dict, args: list[str]) -> None:
    from ..call.single_sample import SingleSampleVariantsDetector
    from ..core.genome import ReferenceGenome

    genome_path = opts.pop("genome", None)
    inp = opts.pop("input_file", None) or (args[0] if args else None)
    out = opts.pop("output_prefix", None)
    if not genome_path or not inp or not out:
        raise SystemExit(
            "Usage: SingleSampleVariantsDetector -r <genome.fa> -i <alns.sam> -o <prefix>"
        )
    genome = ReferenceGenome.load(genome_path)
    det = SingleSampleVariantsDetector(genome, **opts)
    n = det.run(inp, out + ".vcf")
    print(f"Called {n} variants -> {out}.vcf", file=sys.stderr)


register(
    Command(
        id="SingleSampleVariantsDetector",
        former_id="FindVariants",
        group="Discovery",
        description="Detects and genotypes variants in alignments of one sample",
        runner=_run_single_sample_detector,
        options=[
            Option("r", "genome", "str", None, "Reference genome FASTA"),
            Option("i", "input_file", "str", None, "Input SAM file"),
            Option("o", "output_prefix", "str", None, "Output prefix"),
            Option("sampleId", "sample_id", "str", "Sample", "Sample id"),
            Option("h", "heterozygosity_rate", "float", 0.001, "Heterozygosity rate"),
            Option("minQuality", "min_quality", "int", 40, "Min genotype quality"),
            Option("minMQ", "min_mq", "int", 20, "Min mapping quality"),
            Option("ploidy", "ploidy", "int", 2, "Sample ploidy"),
        ],
    )
)


# ---- Benchmark group -----------------------------------------------------

def _run_reads_simulator(opts: dict, args: list[str]) -> None:
    from ..core.genome import ReferenceGenome
    from ..io.fastq import write_fastq
    from ..simulation.reads_simulator import SingleReadsSimulator

    if len(args) < 2:
        raise SystemExit("Usage: SingleReadsSimulator <genome.fa> <out.fastq> [-n N]")
    n = int(opts.pop("num_reads", 10000) or 10000)
    genome = ReferenceGenome.load(args[0])
    sim = SingleReadsSimulator(genome, **opts)
    write_fastq(sim.simulate(n), args[1])
    print(f"Simulated {n} reads -> {args[1]}")


register(
    Command(
        id="SingleReadsSimulator",
        group="Benchmark",
        description="Simulates sequencing reads from a genome",
        runner=_run_reads_simulator,
        options=[
            Option("n", "num_reads", "int", 10000, "Number of reads"),
            Option("l", "read_length", "int", 100, "Read length"),
            Option("e", "substitution_error_rate", "float", 0.005, "Substitution rate"),
            Option("s", "seed", "int", 1, "Random seed"),
        ],
    )
)


def _run_individual_simulator(opts: dict, args: list[str]) -> None:
    from ..core.genome import ReferenceGenome
    from ..io.fasta import save_fasta
    from ..simulation.individual_simulator import SingleIndividualSimulator

    if len(args) < 2:
        raise SystemExit(
            "Usage: SingleIndividualSimulator <genome.fa> <out_prefix> [-s rate]"
        )
    genome = ReferenceGenome.load(args[0])
    sim = SingleIndividualSimulator(genome, **opts)
    sim.simulate()
    sim.write_truth_vcf(args[1] + "_truth.vcf")
    haps = sim.build_haplotype_genomes()
    for h, hg in enumerate(haps):
        for s in hg.sequences:
            s.name = f"{s.name}_hap{h}"
        save_fasta(hg.sequences, f"{args[1]}_hap{h}.fa")
    print(f"Simulated {len(sim.calls)} variants -> {args[1]}_truth.vcf")


register(
    Command(
        id="SingleIndividualSimulator",
        group="Benchmark",
        description="Simulates a mutated individual genome with truth VCF",
        runner=_run_individual_simulator,
        options=[
            Option("s", "snv_rate", "float", 0.001, "SNV rate"),
            Option("i", "indel_rate", "float", 0.0001, "Indel rate"),
            Option("p", "ploidy", "int", 2, "Ploidy"),
            Option("seed", "seed", "int", 1, "Random seed"),
            Option("id", "sample_id", "str", "simulated", "Sample id"),
        ],
    )
)


# ---- not-yet-implemented command ids (full parity checklist) -------------

_PENDING: dict[str, tuple[str, str]] = {
    # Reads
    "Demultiplex": ("Reads", "Demultiplexes pooled reads by barcodes"),
    "ReadsFileErrorsCorrector": ("Reads", "K-mer spectrum read error correction"),
    "DeNovoGBS": ("Reads", "De-novo GBS clustering and variant calling"),
    "Assembler": ("Reads", "De-novo long-read assembly"),
    "AssemblyGraphStatistics": ("Reads", "Assembly graph benchmark statistics"),
    "IndividualGenomeBuilder": ("Reads", "Applies VCF variants to a genome FASTA"),
    # Discovery
    "BasePairQualStats": ("Discovery", "Per-read-position error bias from alignments"),
    "CoverageStats": ("Discovery", "Coverage uniformity histogram"),
    "MultisampleVariantsDetector": ("Discovery", "Joint population variant calling"),
    "SIH": ("Discovery", "Single individual haplotyping"),
    "MergeVariants": ("Discovery", "Merge variant lists across samples"),
    "VCFMerge": ("Discovery", "Merge per-sample VCFs into population VCF"),
    "TillingPoolsIndividualGenotyper": ("Discovery", "TILLING pool genotyping"),
    "RelativeAlleleCountsCalculator": ("Discovery", "Relative allele count stats"),
    "ReadDepthComparator": ("Discovery", "Case-control read-depth CNV"),
    # Genomes
    "TranscriptomeAnalyzer": ("Genomes", "Transcriptome statistics"),
    "TranscriptomeFilter": ("Genomes", "Filter gene annotations"),
    "GenomesAligner": ("Genomes", "Whole-genome ortholog/synteny comparison"),
    "CDNACatalogAligner": ("Genomes", "Orthogroups from cDNA catalogs"),
    "TransposonsFinder": ("Genomes", "Transposable element annotation"),
    "GenomeAssemblyMask": ("Genomes", "Mask genome regions"),
    # VariantsDownstream
    "VCFAnnotate": ("VariantsDownstream", "Functional annotation vs gene models"),
    "VCFFilter": ("VariantsDownstream", "Site/genotype filters"),
    "VCFConverter": ("VariantsDownstream", "Export to population-genetics formats"),
    "VCFComparator": ("VariantsDownstream", "Genotype concordance between VCFs"),
    "VCFSummaryStats": ("VariantsDownstream", "Variant count reports"),
    "VCFDiversityStats": ("VariantsDownstream", "Per-site diversity statistics"),
    "VCFVariantDensityCalculator": ("VariantsDownstream", "Variant density in windows"),
    "VCFDistanceMatrixCalculator": ("VariantsDownstream", "Genetic distance matrix"),
    "DistanceClusteringService": ("VariantsDownstream", "NJ/UPGMA tree building"),
    "NeighborJoining": ("VariantsDownstream", "Neighbor joining dendrogram"),
    "VCFAlleleSharingStats": ("VariantsDownstream", "Allele sharing statistics"),
    "VCFImpute": ("VariantsDownstream", "HMM genotype imputation"),
    "VCFIntrogressionAnalysis": ("VariantsDownstream", "Window introgression detection"),
    "VCFRelativeCoordinatesTranslator": ("VariantsDownstream", "GBS coordinate translation"),
    "MutatedPeptidesExtractor": ("VariantsDownstream", "Mutated peptide extraction"),
    # Benchmark
    "TillingPopulationSimulator": ("Benchmark", "Simulate TILLING pools"),
    "VCFGoldStandardComparator": ("Benchmark", "TP/FP/FN vs gold standard"),
}


def _make_pending_runner(cmd_id: str):
    def runner(opts: dict, args: list[str]) -> None:
        raise SystemExit(
            f"Command {cmd_id} is on the parity roadmap but not implemented yet "
            f"in ngsepcore_tpu (see SURVEY.md Appendix B)."
        )

    return runner


for _cid, (_grp, _desc) in _PENDING.items():
    register(
        Command(id=_cid, group=_grp, description=_desc, runner=_make_pending_runner(_cid))
    )

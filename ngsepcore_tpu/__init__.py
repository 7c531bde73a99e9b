"""ngsepcore_tpu — TPU-native NGS analysis framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of NGSEP
(Next Generation Sequencing Experience Platform, reference: acastem15/NGSEPcore,
pure Java).  Host-side Python handles file formats (FASTA/FASTQ/SAM/VCF/GFF);
all heavy compute — k-mer counting, minimizer indexing, seed-and-extend
alignment DP, pileup genotype-likelihood math, HMMs — runs on TPU through
jnp/XLA and Pallas kernels over dense padded tensors.

Layer map (mirrors SURVEY.md §7 build plan):
  core/       sequence model + encodings        (ref: src/ngsep/sequences)
  io/         FASTA/FASTQ/SAM/VCF/GFF readers+writers (ref: */io)
  math/       log-space math, Phred, Fisher     (ref: src/ngsep/math)
  kernels/    Pallas/XLA device kernels (kmers, DP, pileup, HMM scans)
  index/      k-mer spectrum, minimizer table   (ref: FMIndex/ShortKmerCodesTable)
  align/      ReadsAligner engine               (ref: src/ngsep/alignments)
  call/       variant discovery + genotyping    (ref: src/ngsep/discovery)
  variants/   variant model                     (ref: src/ngsep/variants)
  vcf/        VCF model + downstream analytics  (ref: src/ngsep/vcf)
  hmm/        log-space HMMs                    (ref: src/ngsep/hmm)
  distribute/ device-mesh sharding helpers (data-parallel read batches)
  cli/        command registry + dispatch       (ref: src/ngsep/main)
  simulation/ individual/read simulators        (ref: src/ngsep/simulation)
  ...long tail: assembly, gbs, haplotyping, clustering, transcriptome,
  genome (comparative), sequencing (demux/trim), benchmark, gwas, graphs.
"""

__version__ = "0.1.0"

# Genomic coordinates and packed k-mer codes (4^25 ~ 2^50 for seed k-mers)
# need true 64-bit integers on device.  Hot floating-point kernels request
# float32/bfloat16 explicitly, so enabling x64 does not slow the math paths.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU compiles in this environment go over a
# tunnel and cost minutes; caching them on disk makes repeat runs (tests,
# bench, CLI invocations) start fast.  Accelerator backends only — CPU
# runs never persist compilations because XLA:CPU AOT reloads trip the
# loader's machine-feature check structurally (utils/jaxcache.py).
_cache_dir = _os.environ.get(
    "NGSEP_TPU_COMPILE_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    from .utils.jaxcache import enable_persistent_cache as _epc

    _epc(_os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

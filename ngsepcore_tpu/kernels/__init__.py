"""Device kernels (JAX/XLA + Pallas) for the hot compute paths.

Each module replaces a hot loop identified in SURVEY.md §3:
  kmers.py       rolling 2-bit k-mer codes + sorted counting
                 (ref: DNASequence.java:164-178, KmersExtractor.java:393-426)
  minimizers.py  window-minimizer selection
                 (ref: ShortKmerCodesTable.java:261-335)
  pairwise.py    batched affine-gap / banded DP aligners
                 (ref: alignments/PairwiseAligner*.java)
  pileup.py      allele-count tensor construction (scatter-add)
                 (ref: discovery/AlignmentsPileupGenerator.java:377-453)
  genotyping.py  genotype log-likelihood + posterior batch math
                 (ref: discovery/CountsHelper.java:135-520)
  hmm.py         log-space forward/backward/Viterbi scans
                 (ref: hmm/AbstractHMM.java:106-276)
"""

import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.multisample import MultisampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator


def test_multisample_joint_genotyping():
    rng = np.random.default_rng(77)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence.from_string(
            "chr1", "".join(rng.choice(list("ACGT"), size=30000))
        )
    )
    genome = ReferenceGenome(seqs)
    aligner = ReadsAligner(genome)

    truth_per_sample = []
    alns_per_sample = []
    for si in range(3):
        sim = SingleIndividualSimulator(
            genome, snv_rate=0.001, indel_rate=0.0, het_fraction=0.4, seed=100 + si
        )
        sim.simulate()
        truth_per_sample.append({c.first: c for c in sim.calls})
        reads = []
        for h, hg in enumerate(sim.build_haplotype_genomes()):
            reads.extend(
                SingleReadsSimulator(
                    hg, read_length=100, substitution_error_rate=0.002,
                    seed=200 + 10 * si + h,
                ).simulate(5000)
            )
        alns = []
        for i in range(0, len(reads), 4096):
            for r in aligner.align_batch(reads[i : i + 4096]):
                alns.extend(r)
        alns_per_sample.append(alns)

    det = MultisampleVariantsDetector(genome)
    samples = ["s0", "s1", "s2"]
    records = det.find_variants(alns_per_sample, samples)
    assert records, "no population variants called"
    all_truth = set()
    for t in truth_per_sample:
        all_truth.update(t.keys())
    called_pos = {r.variant.first for r in records}
    tp = len(called_pos & all_truth)
    sens = tp / len(all_truth)
    prec = tp / len(called_pos)
    assert sens > 0.9, f"sensitivity {sens}"
    assert prec > 0.9, f"precision {prec}"
    # per-sample genotype concordance at truth sites
    checked = concordant = 0
    for r in records:
        p = r.variant.first
        if p not in all_truth:
            continue
        for si, call in enumerate(r.calls):
            t = truth_per_sample[si].get(p)
            if call.is_undecided:
                continue
            expected_state = 0 if t is None else t.genotype_state
            checked += 1
            if call.genotype_state == expected_state:
                concordant += 1
    assert checked > 50
    assert concordant / checked > 0.95, f"{concordant}/{checked}"
    # every record carries one call per sample
    assert all(len(r.calls) == 3 for r in records)


def test_multisample_indel_genotyping():
    """A deletion present in sample B but not sample A is discovered from
    the pooled spanning calls and genotyped per sample."""
    from ngsepcore_tpu.align.read_alignment import ReadAlignment, cigar_from_string
    from ngsepcore_tpu.core.sequences import encode_dna

    rng = np.random.default_rng(5)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=encode_dna(ref)))
    genome = ReferenceGenome(seqs)

    def mk(first, cigar, read, name):
        return ReadAlignment(
            sequence_name="chr1", first=first, cigar=cigar_from_string(cigar),
            read_chars=read, qualities="I" * len(read), read_name=name,
            alignment_quality=60,
        )

    # sample A: reads matching the reference across pos 100-199
    alns_a = [
        mk(60 + 7 * i, "100M", ref[59 + 7 * i : 159 + 7 * i], f"a{i}")
        for i in range(12)
    ]
    # sample B: same span but with a 3bp deletion of ref[120:123] (1-based
    # 121-123), event call first=120
    alns_b = []
    for i in range(12):
        first = 60 + 7 * (i % 6)
        pre = 120 - first + 1
        read = ref[first - 1 : 120] + ref[123 : first + 102]
        cig = f"{pre}M3D{len(read) - pre}M"
        alns_b.append(mk(first, cig, read, f"b{i}"))
    det = MultisampleVariantsDetector(genome, min_quality=20)
    recs = det.find_variants([alns_a, alns_b], ["A", "B"])
    indels = [r for r in recs if any(len(a) != len(r.variant.alleles[0]) for a in r.variant.alleles)]
    assert len(indels) == 1
    rec = indels[0]
    assert rec.variant.first == 120
    call_a, call_b = rec.calls
    assert call_a.is_homozygous_reference
    assert not call_b.is_homozygous_reference and not call_b.is_undecided

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

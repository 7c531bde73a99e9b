"""Fused align+call pipeline must emit records identical to the classic
two-stage flow (ReadsAligner.align_batch -> SingleSampleVariantsDetector
.find_variants) — same sites, alleles, genotypes, qualities and depths."""
import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.simulation.individual_simulator import SingleIndividualSimulator
from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator


def _simulate(with_indels: bool, seed: int = 3):
    rng = np.random.default_rng(seed)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence(
            name="chrA", codes=rng.integers(0, 4, size=30000).astype(np.int8)
        )
    )
    seqs.add(
        QualifiedSequence(
            name="chrB", codes=rng.integers(0, 4, size=20000).astype(np.int8)
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome,
        snv_rate=0.002,
        indel_rate=0.0005 if with_indels else 0.0,
        seed=seed + 1,
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = []
    for h, hg in enumerate(hap):
        reads.extend(
            SingleReadsSimulator(
                hg,
                read_length=100,
                substitution_error_rate=0.004,
                seed=seed + 10 + h,
            ).simulate(2500)
        )
    # sprinkle N bases into some reads to exercise the N-call semantics
    for i in range(0, len(reads), 97):
        s = list(reads[i].sequence)
        s[len(s) // 2] = "N"
        reads[i] = type(reads[i])(
            name=reads[i].name, sequence="".join(s), qualities=reads[i].qualities
        )
    return genome, reads


def _record_key(rec):
    v = rec.variant
    c = rec.calls[0]
    return (
        v.sequence_name,
        v.first,
        tuple(v.alleles),
        tuple(c.indexes_called_alleles),
        int(c.genotype_quality),
        int(round(v.quality)),
        int(c.total_read_depth),
        tuple(c.acgt_depths or []),
        tuple(c.genotype_likelihoods or []),
    )


@pytest.mark.parametrize("with_indels", [False, True])
def test_fused_equals_classic(with_indels):
    genome, reads = _simulate(with_indels)

    aligner_c = ReadsAligner(genome)
    det_c = SingleSampleVariantsDetector(genome, sample_id="s1")
    alns = []
    for i in range(0, len(reads), 1024):
        for r in aligner_c.align_batch(reads[i : i + 1024]):
            alns.extend(r)
    classic = det_c.find_variants(alns)

    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome, table=aligner_c.table),
        detector=SingleSampleVariantsDetector(genome, sample_id="s1"),
        batch_size=1024,
    )
    fused = pipe.run_reads(reads)

    assert len(classic) > 10
    ck = [_record_key(r) for r in classic]
    fk = [_record_key(r) for r in fused]
    assert ck == fk


def test_fused_equals_classic_with_known_strs():
    """Config #4 (known STRs supplied): the fused path must no longer
    disable itself; STR-overlapping reads demote to the host path where
    tier-2 split alignment + STR realignment run, and the records equal
    the classic flow's exactly."""
    from ngsepcore_tpu.core.regions import GenomicRegion
    from ngsepcore_tpu.core.sequences import RawRead, decode_dna

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=40000).astype(np.int8)
    # two tandem arrays: chr1:15001 (4bp x 12) and chr1:30001 (3bp x 10)
    unit1 = np.array([0, 1, 3, 3], np.int8)
    codes[15000 : 15000 + 48] = np.tile(unit1, 12)
    unit2 = np.array([2, 0, 1], np.int8)
    codes[30000 : 30000 + 30] = np.tile(unit2, 10)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)
    strs = {
        "chr1": [
            GenomicRegion("chr1", 15001, 15048),
            GenomicRegion("chr1", 30001, 30030),
        ]
    }
    # individual: first STR expanded by 2 units (homozygous)
    ind = np.concatenate(
        [codes[:15000], np.tile(unit1, 14), codes[15048:]]
    )
    sim_reads = []
    rr = np.random.default_rng(5)
    starts = [int(rr.integers(0, len(ind) - 100)) for _ in range(3000)]
    # dense coverage over the expanded array so spanning reads exist
    starts += [int(rr.integers(14880, 15010)) for _ in range(300)]
    for i, start in enumerate(starts):
        rc = ind[start : start + 100]
        if rr.random() < 0.5:
            rc = np.where(rc[::-1] < 4, 3 - rc[::-1], rc[::-1]).astype(np.int8)
        sim_reads.append(
            RawRead(
                name=f"r_{i}", sequence=decode_dna(rc), qualities="F" * 100
            )
        )

    aligner_c = ReadsAligner(genome, known_strs=strs)
    det_c = SingleSampleVariantsDetector(genome, sample_id="s1")
    det_c.known_strs = strs
    alns = []
    for i in range(0, len(sim_reads), 1024):
        for r in aligner_c.align_batch(sim_reads[i : i + 1024]):
            alns.extend(r)
    classic = det_c.find_variants(alns)

    det_f = SingleSampleVariantsDetector(genome, sample_id="s1")
    det_f.known_strs = strs
    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome, table=aligner_c.table),
        detector=det_f,
        batch_size=1024,
    )
    assert pipe._fusable, "known STRs must no longer disable the fused path"
    fused = pipe.run_reads(sim_reads)
    ck = [_record_key(r) for r in classic]
    fk = [_record_key(r) for r in fused]
    assert ck == fk
    # the expanded STR is genotyped as a homozygous insertion at the array
    ins = [
        r
        for r in classic
        if 14950 <= r.variant.first <= 15050
        and max(len(a) for a in r.variant.alleles) > 1
    ]
    assert ins, "expanded STR produced no indel call"


def test_fused_falls_back_when_not_fusable():
    genome, reads = _simulate(False, seed=11)
    det = SingleSampleVariantsDetector(genome, sample_id="s1", min_mq=0)
    pipe = AlignCallPipeline(genome, detector=det, batch_size=1024)
    assert not pipe._fusable
    recs = pipe.run_reads(reads[:500])
    assert isinstance(recs, list)


def test_read_block_path_identical():
    """ReadBlock (dense matrices from IO/simulator) must produce exactly
    the records of the per-object RawRead path on the same reads."""
    import numpy as np

    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import (
        QualifiedSequence,
        QualifiedSequenceList,
        ReadBlock,
    )
    from ngsepcore_tpu.simulation.individual_simulator import (
        SingleIndividualSimulator,
    )
    from ngsepcore_tpu.simulation.reads_simulator import SingleReadsSimulator

    rng = np.random.default_rng(3)
    seqs = QualifiedSequenceList()
    seqs.add(
        QualifiedSequence(
            name="chr1", codes=rng.integers(0, 4, size=40_000).astype(np.int8)
        )
    )
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(genome, snv_rate=0.002, indel_rate=0.0, seed=9)
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    blk = ReadBlock.concatenate(
        [
            SingleReadsSimulator(
                hg, read_length=150, substitution_error_rate=0.003, seed=50 + h
            ).simulate_block(2500)
            for h, hg in enumerate(hap)
        ]
    )

    def run(reads):
        pipe = AlignCallPipeline(
            genome,
            aligner=ReadsAligner(genome),
            detector=SingleSampleVariantsDetector(genome, sample_id="t"),
            batch_size=4096,
        )
        return pipe.run_reads(reads)

    def key(r):
        c = r.calls[0]
        a = c.called_alleles
        return (
            r.variant.sequence_name,
            r.variant.first,
            tuple(r.variant.alleles),
            tuple(sorted(a() if callable(a) else a)),
            c.genotype_quality,
        )

    rl = run(list(blk))
    rb = run(blk)
    assert [key(r) for r in rl] == [key(r) for r in rb]
    assert len(rl) > 20


def test_fused_equals_classic_repeat_genome():
    """Multi-mapping reads from repeat families resolve on the device path
    (classify's multi-candidate tier-1 resolution) — records must still be
    identical to the classic flow, which builds host objects for them."""
    rng = np.random.default_rng(77)
    codes = rng.integers(0, 4, size=60000).astype(np.int8)
    # dispersed repeat family: 6 copies of a 1.5 kb segment at ~95-99% id
    seg = codes[5000:6500].copy()
    for dst, div in ((12000, 0.01), (22000, 0.02), (31000, 0.05),
                     (40000, 0.0), (52000, 0.03)):
        cp = seg.copy()
        nm = int(div * len(cp))
        if nm:
            mp = rng.choice(len(cp), size=nm, replace=False)
            cp[mp] = (cp[mp] + rng.integers(1, 4, size=nm)) % 4
        codes[dst : dst + len(cp)] = cp
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chrR", codes=codes))
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(genome, snv_rate=0.002,
                                    indel_rate=0.0003, seed=5)
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    reads = []
    for h, hg in enumerate(hap):
        reads.extend(
            SingleReadsSimulator(
                hg, read_length=100, substitution_error_rate=0.004,
                seed=60 + h,
            ).simulate(3000)
        )

    aligner_c = ReadsAligner(genome)
    det_c = SingleSampleVariantsDetector(genome, sample_id="s1")
    alns = []
    for i in range(0, len(reads), 1024):
        for r in aligner_c.align_batch(reads[i : i + 1024]):
            alns.extend(r)
    classic = det_c.find_variants(alns)

    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome, table=aligner_c.table),
        detector=SingleSampleVariantsDetector(genome, sample_id="s1"),
        batch_size=1024,
    )
    fused = pipe.run_reads(reads)

    assert len(classic) > 10
    assert [_record_key(r) for r in classic] == [_record_key(r) for r in fused]


def test_fused_equals_classic_repeat_genome():
    """Bench-shaped workload at test scale: dispersed repeat families +
    tandem arrays + indels (multi-candidate device resolution, DP
    fallback, realigner trims on device-path reads).  Records must equal
    the classic flow exactly."""
    rng = np.random.default_rng(77)
    L = 300_000
    codes = rng.integers(0, 4, size=L).astype(np.int8)
    for _fam in range(6):
        slen = int(rng.integers(500, 2000))
        src = int(rng.integers(0, L - slen))
        seg = codes[src : src + slen].copy()
        for _copy in range(int(rng.integers(3, 8))):
            dst = int(rng.integers(0, L - slen))
            cp = seg.copy()
            nmut = int(rng.binomial(slen, float(rng.uniform(0.01, 0.08))))
            if nmut:
                mpos = rng.choice(slen, size=nmut, replace=False)
                cp[mpos] = (cp[mpos] + rng.integers(1, 4, size=nmut)) % 4
            codes[dst : dst + slen] = cp
    for _t in range(20):
        mlen = int(rng.integers(2, 7))
        ncopies = int(rng.integers(8, 30))
        dst = int(rng.integers(0, L - mlen * ncopies))
        codes[dst : dst + mlen * ncopies] = np.tile(
            rng.integers(0, 4, size=mlen).astype(np.int8), ncopies
        )
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)
    sim = SingleIndividualSimulator(
        genome, snv_rate=0.001, indel_rate=0.0001, seed=8
    )
    sim.simulate()
    hap = sim.build_haplotype_genomes()
    from ngsepcore_tpu.core.sequences import ReadBlock

    blocks = [
        SingleReadsSimulator(
            hg, read_length=150, substitution_error_rate=0.003, seed=31 + h
        ).simulate_block(11000)
        for h, hg in enumerate(hap)
    ]
    reads_blk = ReadBlock.concatenate(blocks)
    reads = list(reads_blk)

    aligner_c = ReadsAligner(genome)
    det_c = SingleSampleVariantsDetector(genome, sample_id="s1")
    alns = []
    for i in range(0, len(reads), 4096):
        for r in aligner_c.align_batch(reads[i : i + 4096]):
            alns.extend(r)
    classic = det_c.find_variants(alns)

    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome, table=aligner_c.table),
        detector=SingleSampleVariantsDetector(genome, sample_id="s1"),
        batch_size=4096,
    )
    fused = pipe.run_reads(reads_blk)

    assert len(classic) > 100
    ck = [_record_key(r) for r in classic]
    fk = [_record_key(r) for r in fused]
    assert ck == fk

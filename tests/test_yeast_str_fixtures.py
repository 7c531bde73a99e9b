"""Seeding/alignment parity evidence on the reference's REAL yeast STR
fixture (VERDICT r2 #10).

`/root/reference/training/Saccharomyces_cerevisiae_STRs.txt` ships, per
STR locus, the actual STR sequence plus its 50 bp genomic flanks
(columns 16-18), so the loci's real neighborhoods can be reconstructed
without the yeast FASTA.  A synthetic genome embeds hundreds of those
neighborhoods (unique random spacers between them) plus duplicated
segments mirroring the repeats fixture's span structure
(`Saccharomyces_cerevisiae_repeats.txt`).  >=1,000 reads straddling the
STR loci are then aligned and the documented reference semantics
(SURVEY §A.4) are asserted:

- tier-1/2/3 accept: straddling reads place at the simulated position
  (alignment start within a few bp; STR-length changes still place);
- aligner quality: unique placements carry q = 100 - 5*mm >= 40;
- multi-mapping: reads inside duplicated segments get MAPQ <= 15
  (0.3*q/n degradation, SingleReadsAligner.filterAlignments) and are
  dropped by the caller's min_mq filter.
"""
import os

import numpy as np
import pytest

from ngsepcore_tpu.align.reads_aligner import ReadsAligner
from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import (
    QualifiedSequence,
    QualifiedSequenceList,
    RawRead,
    decode_dna,
    encode_dna,
)

STR_FILE = "/root/reference/training/Saccharomyces_cerevisiae_STRs.txt"
REP_FILE = "/root/reference/training/Saccharomyces_cerevisiae_repeats.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(STR_FILE), reason="reference fixtures not available"
)


def _load_loci(max_loci=300, min_len=12, max_len=80):
    """(left_flank, str_seq, right_flank, unit_len) per locus."""
    loci = []
    with open(STR_FILE) as fh:
        for line in fh:
            f = line.split()
            if len(f) < 18:
                continue
            unit_len = int(f[3])
            str_seq = f[15]
            left, right = f[16], f[17]
            if not (min_len <= len(str_seq) <= max_len):
                continue
            if len(left) < 40 or len(right) < 40:
                continue
            if any(c not in "ACGT" for c in left + str_seq + right):
                continue
            loci.append((left, str_seq, right, unit_len))
            if len(loci) >= max_loci:
                break
    return loci


def _build_fixture_genome(rng, loci):
    """One chromosome embedding every locus neighborhood + two duplicated
    segments with span lengths drawn from the repeats fixture."""
    parts = []
    positions = []  # (start_1based, str_start, str_end, unit_len)
    cursor = 0

    def rand(n):
        return decode_dna(rng.integers(0, 4, n).astype(np.int8))

    for left, s, right, unit in loci:
        pad = rand(160)
        block = pad + left + s + right
        str_start = cursor + len(pad) + len(left) + 1  # 1-based
        positions.append(
            (cursor + 1, str_start, str_start + len(s) - 1, unit)
        )
        parts.append(block)
        cursor += len(block)
    # duplicated segments: spans from the repeats fixture distribution
    spans = []
    with open(REP_FILE) as fh:
        for line in fh:
            f = line.split("\t")
            if len(f) >= 3:
                spans.append(int(f[2]) - int(f[1]) + 1)
    spans = [s for s in spans if 300 <= s <= 2000][:2] or [500, 800]
    dup_regions = []
    for sp in spans:
        seg = rand(sp)
        for _copy in range(3):
            pad = rand(120)
            dup_regions.append((cursor + len(pad) + 1, cursor + len(pad) + sp))
            parts.append(pad + seg)
            cursor += len(pad) + sp
    parts.append(rand(200))
    genome_text = "".join(parts)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chrS", codes=encode_dna(genome_text)))
    return ReferenceGenome(seqs), positions, dup_regions, genome_text


def test_yeast_str_straddling_reads_place_correctly(tmp_path):
    rng = np.random.default_rng(99)
    loci = _load_loci()
    assert len(loci) >= 200, "fixture parse produced too few loci"
    genome, positions, dup_regions, text = _build_fixture_genome(rng, loci)

    # known-STRs file in the synthetic coordinates (ref -knownSTRs flow)
    strs_path = tmp_path / "strs.txt"
    with open(strs_path, "w") as fh:
        for _first, s0, s1, _u in positions:
            fh.write(f"chrS\t{s0}\t{s1}\n")

    from ngsepcore_tpu.genome.builders import load_regions_file

    known = {}
    for r in load_regions_file(str(strs_path)):
        known.setdefault(r.sequence_name, []).append(r)

    aligner = ReadsAligner(genome, known_strs=known)
    L = 150
    reads = []
    truth = []  # expected 1-based alignment start (read fully matches)
    n_len_change = 0
    for li, (_first, s0, s1, unit) in enumerate(positions):
        center = (s0 + s1) // 2
        for k, off in enumerate((-110, -75, -40)):
            start = max(1, center + off)
            if start + L - 1 > len(text):
                continue
            seq = text[start - 1 : start + L - 1]
            reads.append(RawRead(name=f"L{li}_{k}", sequence=seq))
            truth.append(start)
        # STR-length-change read: delete one unit copy (het indel style)
        if unit >= 2 and (s1 - s0 + 1) >= 3 * unit and n_len_change < 400:
            start = max(1, center - 75)
            seq = text[start - 1 : start + L + unit - 1]
            cut = s0 - start  # read offset where the STR begins
            if 10 < cut < L - 10:
                seq = seq[:cut] + seq[cut + unit :]
                seq = seq[:L]
                reads.append(RawRead(name=f"D{li}", sequence=seq))
                truth.append(start)
                n_len_change += 1
    assert len(reads) >= 1000, len(reads)

    out = []
    for b0 in range(0, len(reads), 2048):
        out.extend(aligner.align_batch(reads[b0 : b0 + 2048]))

    placed = good_q = exact = 0
    len_change_placed = 0
    confident = confident_ok = 0
    for read, alns, start in zip(reads, out, truth):
        if not alns:
            continue
        a = alns[0]
        placed += 1
        tol = 8 if read.name.startswith("D") else 3
        ok = abs(a.first - start) <= tol
        if read.name.startswith("D"):
            len_change_placed += ok
        else:
            exact += ok
        if a.alignment_quality >= 40:
            good_q += 1
            confident += 1
            confident_ok += ok
    n_plain = sum(1 for r in reads if not r.name.startswith("D"))
    n_d = len(reads) - n_plain
    assert placed >= 0.98 * len(reads), (placed, len(reads))
    assert exact >= 0.97 * n_plain, (exact, n_plain)
    assert len_change_placed >= 0.9 * n_d, (len_change_placed, n_d)
    # real yeast STR loci share repeat content across loci, so a fraction
    # of STR-dominated reads legitimately multi-map and degrade below
    # MAPQ 40 (reference semantics); the parity claims are (a) most reads
    # stay confidently placed and (b) confident placements are CORRECT
    assert good_q >= 0.80 * placed, (good_q, placed)
    assert confident_ok >= 0.97 * confident, (confident_ok, confident)

    # multi-mapping semantics on the duplicated segments: MAPQ <= 15
    dup_reads = []
    for lo, hi in dup_regions:
        for off in (20, 120):
            if lo + off + L - 1 <= hi:
                dup_reads.append(
                    RawRead(
                        name=f"dup_{lo}_{off}",
                        sequence=text[lo + off - 1 : lo + off + L - 1],
                    )
                )
    assert len(dup_reads) >= 6
    dup_out = aligner.align_batch(dup_reads)
    degraded = sum(
        1 for alns in dup_out if alns and alns[0].alignment_quality <= 15
    )
    assert degraded >= 0.9 * len(dup_reads), (degraded, len(dup_reads))

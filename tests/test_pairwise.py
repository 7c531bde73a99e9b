import numpy as np
import pytest

from ngsepcore_tpu.core.sequences import decode_dna, encode_dna, pack_reads
from ngsepcore_tpu.kernels.pairwise import (
    OP_DEL,
    OP_INS,
    OP_MATCH,
    affine_gap_align_batch,
    ops_to_cigar_and_strings,
)
from tests.reference_gotoh import gotoh_align


def _mutate(rng, s, n_sub=2, n_indel=1):
    s = list(s)
    for _ in range(n_sub):
        i = int(rng.integers(0, len(s)))
        s[i] = rng.choice([c for c in "ACGT" if c != s[i]])
    for _ in range(n_indel):
        i = int(rng.integers(1, len(s) - 1))
        if rng.random() < 0.5 and len(s) > 10:
            del s[i : i + int(rng.integers(1, 4))]
        else:
            s.insert(i, "".join(rng.choice(list("ACGT"), size=int(rng.integers(1, 4)))))
    return "".join(s)


def _ops_to_strings(ops, n_ops, q, s, start_j):
    sb1, sb2 = [], []
    qi, sj = 0, start_j
    for op in ops[:n_ops]:
        if op == OP_MATCH:
            sb1.append(q[qi]); sb2.append(s[sj]); qi += 1; sj += 1
        elif op == OP_INS:
            sb1.append(q[qi]); sb2.append("-"); qi += 1
        elif op == OP_DEL:
            sb1.append("-"); sb2.append(s[sj]); sj += 1
    return "".join(sb1), "".join(sb2)


def _run_batch(pairs, free_start2, free_end2):
    qs = [encode_dna(q) for q, _ in pairs]
    ss = [encode_dna(s) for _, s in pairs]
    qc, ql, _ = pack_reads(qs, pad_multiple=16)
    sc, sl, _ = pack_reads(ss, pad_multiple=16)
    return affine_gap_align_batch(
        qc, ql, sc, sl, free_start2=free_start2, free_end2=free_end2
    )


def _strip_end_deletions(a1, a2):
    # mirror emits free subject ends as leading/trailing deletion runs; the
    # kernel reports them as start_j/end_j offsets instead
    start = 0
    while start < len(a1) and a1[start] == "-":
        start += 1
    end = len(a1)
    while end > start and a1[end - 1] == "-":
        end -= 1
    return a1[start:end], a2[start:end], start


@pytest.mark.parametrize("free", [False, True])
def test_affine_gap_matches_reference_mirror(free):
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(12):
        L = int(rng.integers(30, 60))
        s = "".join(rng.choice(list("ACGT"), size=L))
        q = _mutate(rng, s)
        if free:
            # embed query region inside a longer window
            s = "".join(rng.choice(list("ACGT"), size=5)) + s + "".join(
                rng.choice(list("ACGT"), size=5)
            )
        pairs.append((q, s))
    out = _run_batch(pairs, free_start2=free, free_end2=free)
    ops = np.asarray(out["ops"]); n_ops = np.asarray(out["n_ops"])
    score = np.asarray(out["score"]); start_j = np.asarray(out["start_j"])
    for i, (q, s) in enumerate(pairs):
        a1, a2, ref_score = gotoh_align(
            q, s, force_start2=not free, force_end2=not free
        )
        assert score[i] == ref_score, f"case {i}: score {score[i]} != {ref_score}"
        g1, g2 = _ops_to_strings(ops[i], int(n_ops[i]), q, s, int(start_j[i]))
        r1, r2, r_start = _strip_end_deletions(a1, a2)
        assert g1 == r1, f"case {i}\n{g1}\n{r1}"
        assert g2 == r2, f"case {i}\n{g2}\n{r2}"
        if free:
            assert int(start_j[i]) == r_start


def test_identical_sequences_score():
    out = _run_batch([("ACGTACGTAC", "ACGTACGTAC")], False, False)
    assert int(out["score"][0]) == 10
    assert int(out["n_ops"][0]) == 10


def test_single_mismatch():
    out = _run_batch([("ACGTACGTAC", "ACGTTCGTAC")], False, False)
    assert int(out["score"][0]) == 8  # 9 matches - 1 mismatch


def test_free_subject_ends_finds_embedded_query():
    q = "ACGTACGTACGTACGTACGT"
    s = "TTTTT" + q + "GGGGGC"
    out = _run_batch([(q, s)], True, True)
    assert int(out["score"][0]) == len(q)
    assert int(out["start_j"][0]) == 5
    assert int(out["end_j"][0]) == 5 + len(q)


def test_cigar_and_mismatch_count():
    q = "ACGTACGTACGTACGTACGT"
    s = "ACGTACGTAAACGTACGTACGT"  # 2-base insertion in subject (deletion in read)
    out = _run_batch([(q, s)], False, False)
    ops = np.asarray(out["ops"][0])
    cigar, mism = ops_to_cigar_and_strings(
        ops, int(out["n_ops"][0]), encode_dna(q), encode_dna(s), int(out["start_j"][0])
    )
    cigar_str = "".join(f"{l}{op}" for l, op in cigar)
    assert "D" in cigar_str and "I" not in cigar_str
    total_q = sum(l for l, op in cigar if op in "MI")
    total_s = sum(l for l, op in cigar if op in "MD")
    assert total_q == len(q) and total_s == len(s)
    assert mism == 2  # one internal gap run costs 2 (ref countMismatches)

"""left_align_indels closed-form shift must match the reference
restart-scan implementation on random gapped alignments."""
import numpy as np

from ngsepcore_tpu.align.read_alignment import left_align_indels


def _left_align_reference(cigar, read_codes, ref_codes, ref_offset=0):
    """The original restart-on-every-shift implementation (kept as the
    semantic mirror for the closed-form version)."""
    runs = [list(r) for r in cigar]
    changed = True
    while changed:
        changed = False
        qi = 0
        sj = ref_offset
        for i, (l, op) in enumerate([tuple(r) for r in runs]):
            if op in ("I", "D") and i > 0 and runs[i - 1][1] == "M" and runs[i - 1][0] > 0:
                if op == "I":
                    seq = read_codes[qi : qi + l]
                    prev_q = read_codes[qi - 1] if qi > 0 else -1
                    can = qi > 0 and len(seq) > 0 and prev_q == seq[-1]
                else:
                    seq = ref_codes[sj : sj + l]
                    prev_s = ref_codes[sj - 1] if sj > 0 else -1
                    can = sj > 0 and len(seq) > 0 and prev_s == seq[-1]
                if can:
                    runs[i - 1][0] -= 1
                    if i + 1 < len(runs) and runs[i + 1][1] == "M":
                        runs[i + 1][0] += 1
                    else:
                        runs.insert(i + 1, [1, "M"])
                    if runs[i - 1][0] == 0:
                        del runs[i - 1]
                    changed = True
                    break
            if op in ("M", "=", "X"):
                qi += l
                sj += l
            elif op in ("I", "S"):
                qi += l
            elif op in ("D", "N"):
                sj += l
    merged = []
    for l, op in runs:
        if l == 0:
            continue
        if merged and merged[-1][1] == op:
            merged[-1] = (merged[-1][0] + l, op)
        else:
            merged.append((l, op))
    return merged


def _random_case(rng):
    """Random low-entropy sequences (alphabet of 2 -> long shifts) with a
    random M/I/D/S cigar consistent with the sequence lengths."""
    ops = []
    q = s = 0
    n_runs = rng.integers(2, 8)
    if rng.random() < 0.3:
        l = int(rng.integers(1, 6))
        ops.append((l, "S"))
        q += l
    last_gap = False
    for _ in range(n_runs):
        if not ops or last_gap or rng.random() < 0.5:
            l = int(rng.integers(1, 12))
            ops.append((l, "M"))
            q += l
            s += l
            last_gap = False
        else:
            op = "I" if rng.random() < 0.5 else "D"
            l = int(rng.integers(1, 6))
            ops.append((l, op))
            if op == "I":
                q += l
            else:
                s += l
            last_gap = True
    if ops[-1][1] in ("I", "D") and rng.random() < 0.5:
        ops.append((int(rng.integers(1, 8)), "M"))
        q += ops[-1][0]
        s += ops[-1][0]
    nb = int(rng.integers(2, 5))  # small alphabet: frequent borders
    read = rng.integers(0, nb, size=q).astype(np.int8)
    off = int(rng.integers(0, 5))
    ref = rng.integers(0, nb, size=s + off + 5).astype(np.int8)
    return ops, read, ref, off


def test_left_align_matches_reference():
    rng = np.random.default_rng(11)
    for _ in range(3000):
        cigar, read, ref, off = _random_case(rng)
        got = left_align_indels(list(cigar), read, ref, off)
        want = _left_align_reference([list(c) for c in cigar], read, ref, off)
        assert got == want, (cigar, read.tolist(), ref.tolist(), off, got, want)


def test_left_align_homopolymer():
    # classic: 1bp deletion inside AAAA shifts to the leftmost A
    read = np.array([0, 0, 0, 1], np.int8)  # AAAC
    ref = np.array([0, 0, 0, 0, 0, 1], np.int8)  # AAAAAC
    # M3 D1 M2 aligned at offset 0 -> deletion should move left
    got = left_align_indels([(3, "M"), (1, "D"), (2, "M")], read, ref, 0)
    want = _left_align_reference([[3, "M"], [1, "D"], [2, "M"]], read, ref, 0)
    assert got == want

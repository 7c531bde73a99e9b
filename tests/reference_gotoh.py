"""Slow, trusted host mirror of the reference Gotoh aligner semantics
(PairwiseAlignerAffineGap.java) used ONLY to validate the device kernel.
Returns aligned strings exactly like calculateAlignment."""
import numpy as np

NEG_FACTOR = 1000
GAP = "-"


def gotoh_align(
    s1: str,
    s2: str,
    match=1,
    mismatch=1,
    open_gap=3,
    ext_gap=1,
    force_start1=True,
    force_start2=True,
    force_end1=True,
    force_end2=True,
):
    n, m = len(s1), len(s2)
    M = np.zeros((n + 1, m + 1), dtype=np.int64)
    I = np.zeros((n + 1, m + 1), dtype=np.int64)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    M[0][0] = 0
    for i in range(1, n + 1):
        I[i][0] = -open_gap - ext_gap * (i - 1) if force_start1 else 0
        D[i][0] = n * -open_gap * NEG_FACTOR
        M[i][0] = D[i][0]
    for j in range(1, m + 1):
        D[0][j] = -open_gap - ext_gap * (j - 1) if force_start2 else 0
        I[0][j] = m * -open_gap * NEG_FACTOR
        M[0][j] = I[0][j]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if s1[i - 1] == s2[j - 1] else -mismatch
            M[i][j] = max(M[i - 1][j - 1], I[i - 1][j - 1], D[i - 1][j - 1]) + s
            I[i][j] = max(M[i - 1][j] - open_gap, I[i - 1][j] - ext_gap, D[i - 1][j] - open_gap)
            D[i][j] = max(M[i][j - 1] - open_gap, I[i][j - 1] - open_gap, D[i][j - 1] - ext_gap)

    i, j, k = n, m, 0
    val = M[i][j]
    if force_end1 and force_end2:
        if val < I[i][j]:
            k, val = 1, I[i][j]
        if val < D[i][j]:
            # Java sets only k here (getAlignedStrings:189-191) because it
            # never returns val; this mirror does, so val must follow k
            k, val = 2, D[i][j]
    if not force_end1:
        for h in range(i, -1, -1):
            if M[h][m] > val:
                i, k, val = h, 0, M[h][m]
    if not force_end2:
        for h in range(j, -1, -1):
            if M[n][h] > val:
                i, j, k, val = n, h, 0, M[n][h]
    sb1, sb2 = [], []
    for h in range(n, i, -1):
        sb1.append(s1[h - 1])
        sb2.append(GAP)
    for h in range(m, j, -1):
        sb1.append(GAP)
        sb2.append(s2[h - 1])
    while i > 0 and j > 0:
        s = match if s1[i - 1] == s2[j - 1] else -mismatch
        if k == 0:
            sb1.append(s1[i - 1])
            sb2.append(s2[j - 1])
            sc = M[i][j]
            if sc == M[i - 1][j - 1] + s:
                k = 0
            elif sc == I[i - 1][j - 1] + s:
                k = 1
            elif sc == D[i - 1][j - 1] + s:
                k = 2
            else:
                raise RuntimeError("score error")
            i -= 1
            j -= 1
        elif k == 1:
            sb1.append(s1[i - 1])
            sb2.append(GAP)
            sc = I[i][j]
            if sc == M[i - 1][j] - open_gap:
                k = 0
            elif sc == I[i - 1][j] - ext_gap:
                k = 1
            elif sc == D[i - 1][j] - open_gap:
                k = 2
            else:
                raise RuntimeError("score error")
            i -= 1
        else:
            sb1.append(GAP)
            sb2.append(s2[j - 1])
            sc = D[i][j]
            if sc == M[i][j - 1] - open_gap:
                k = 0
            elif sc == I[i][j - 1] - open_gap:
                k = 1
            elif sc == D[i][j - 1] - ext_gap:
                k = 2
            else:
                raise RuntimeError("score error")
            j -= 1
    while i > 0:
        sb1.append(s1[i - 1])
        sb2.append(GAP)
        i -= 1
    while j > 0:
        sb1.append(GAP)
        sb2.append(s2[j - 1])
        j -= 1
    return "".join(reversed(sb1)), "".join(reversed(sb2)), int(val)

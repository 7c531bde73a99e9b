from collections import Counter

import numpy as np

from ngsepcore_tpu.core.sequences import encode_dna, pack_reads, reverse_complement
from ngsepcore_tpu.index.kmers_extractor import KmersExtractor
from ngsepcore_tpu.index.kmers_map import KmersMap
from ngsepcore_tpu.kernels.kmers import (
    count_batch_kmers,
    decode_kmer,
    encode_kmer,
    kmer_codes,
    kmer_codes_both_strands,
)


def brute_force_kmers(seqs, k, both=True):
    c = Counter()
    for s in seqs:
        variants = [s, reverse_complement(s)] if both else [s]
        for v in variants:
            for i in range(len(v) - k + 1):
                km = v[i : i + k]
                if set(km) <= set("ACGT"):
                    c[km] += 1
    return c


def test_kmer_codes_simple():
    codes, lengths, _ = pack_reads([encode_dna("ACGTA")])
    kc, ok = kmer_codes(codes, lengths, 3)
    kc, ok = np.asarray(kc), np.asarray(ok)
    # ACG=0*16+1*4+2=6, CGT=1*16+2*4+3=27, GTA=2*16+3*4+0=44
    assert list(kc[0, :3]) == [6, 27, 44]
    assert list(ok[0, :3]) == [True, True, True]
    assert not ok[0, 3]  # window past read end


def test_kmer_codes_n_breaks_window():
    codes, lengths, _ = pack_reads([encode_dna("ACNGT")])
    _, ok = kmer_codes(codes, lengths, 3)
    ok = np.asarray(ok)
    assert not ok[0, 0] and not ok[0, 1] and not ok[0, 2]


def test_encode_decode_kmer():
    assert decode_kmer(encode_kmer("ACGTACGTACGTACG"), 15) == "ACGTACGTACGTACG"


def test_count_batch_matches_bruteforce():
    rng = np.random.default_rng(42)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(20)]
    seqs.append("ACGTN" + "ACGT" * 10)
    k = 15
    truth = brute_force_kmers(seqs, k, both=True)
    codes, lengths, _ = pack_reads([encode_dna(s) for s in seqs])
    uniq, counts, n_unique = count_batch_kmers(codes, lengths, k, both_strands=True)
    n = int(n_unique)
    got = {
        decode_kmer(int(c), k): int(v)
        for c, v in zip(np.asarray(uniq[:n]), np.asarray(counts[:n]))
    }
    assert got == dict(truth)


def test_kmers_map_merge_and_lookup():
    m = KmersMap(3)
    m.merge_batch(np.array([5, 9, 20]), np.array([2, 3, 1]))
    m.merge_batch(np.array([5, 21]), np.array([4, 7]))
    assert m.get_count(5) == 6
    assert m.get_count(9) == 3
    assert m.get_count(21) == 7
    assert m.get_count(99) == 0
    assert list(m.lookup(np.array([5, 99, 21]))) == [6, 0, 7]


def test_kmers_map_saturation():
    m = KmersMap(3)
    m.merge_batch(np.array([1]), np.array([30000]))
    m.merge_batch(np.array([1]), np.array([30000]))
    assert m.get_count(1) == 32767  # saturates like short[4^k] (ref)


def test_extractor_on_fasta(tmp_path):
    fa = tmp_path / "toy.fa"
    seq = "ACGTACGTACGTACGTACGTGGGG"
    fa.write_text(f">s1\n{seq}\n")
    ex = KmersExtractor(kmer_length=15, only_forward_strand=False)
    ex.process_file(str(fa))
    truth = brute_force_kmers([seq], 15, both=True)
    assert ex.kmers_map.size == len(truth)
    for km, cnt in truth.items():
        assert ex.kmers_map.get_count(km) == cnt


def test_extractor_chunking_long_sequence():
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), size=70000))  # > CHUNK
    ex = KmersExtractor(kmer_length=15, only_forward_strand=True)
    ex.process_codes_list([encode_dna(seq)])
    # total kmer occurrences must equal L-k+1
    assert int(ex.kmers_map.counts.sum()) == len(seq) - 15 + 1

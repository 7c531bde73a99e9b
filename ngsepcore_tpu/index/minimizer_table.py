"""Genome minimizer table — the seed index for read mapping.

Ref: src/ngsep/sequences/ShortKmerCodesTable.java:16-420 (window minimizer
selection :261-307, open-addressing long[] rows, matchCompressed query
:344-420).  TPU redesign: minimizers of the whole genome are selected on
device in chunks (kernels/minimizers.py two-reduce_window trick), then laid
out as a CSR structure sorted by k-mer code:

    entry_codes  (E,) int64  sorted
    entry_pos    (E,) int64  0-based concatenated genome position
    unique_codes (U,) int64
    row_offsets  (U+1,) int64

Queries are vectorized searchsorted + slice — no open addressing, no
pointer chasing.  Overrepresented codes (repeats) are dropped at build
time like the reference's per-code hit cap.
"""
from __future__ import annotations

import numpy as np

from ..core.genome import ReferenceGenome
from ..core.sequences import pack_reads

DEF_KMER_LENGTH = 25  # ref: ReadsAligner.java:62
DEF_WINDOW_LENGTH = 20  # ref: ReadsAligner.java:63
DEF_MAX_HITS_PER_CODE = 500

_COMPACT_JIT = []


def _minimizers_compact(mat, lengths, bases, *, k, window, cap):
    """Select minimizers over a (R, chunk) genome-chunk batch and compact
    the selected entries on device: returns ((cap, 4) int32 [hi, lo, pos,
    strand] rows, selected count).  Only the compacted rows cross the
    host link."""
    import jax
    import jax.numpy as jnp

    if not _COMPACT_JIT:
        from functools import partial

        from ..kernels.minimizers import extract_minimizers_canonical

        @partial(jax.jit, static_argnames=("k", "window", "cap"))
        def fn(codes, lengths, bases, k, window, cap):
            hi, lo, flag, sel, _valid = extract_minimizers_canonical(
                codes, lengths, k, window
            )
            R, nk = sel.shape
            pos = bases[:, None] + jax.lax.broadcasted_iota(
                jnp.int32, (R, nk), 1
            )
            self_ = sel.reshape(-1)
            dst = jnp.cumsum(self_.astype(jnp.int32)) - 1
            count = dst[-1] + 1
            dst = jnp.where(self_, dst, cap)  # cap = dropped (mode="drop")
            lanes = jnp.stack(
                [
                    hi.reshape(-1),
                    lo.reshape(-1),
                    pos.reshape(-1),
                    flag.reshape(-1).astype(jnp.int32),
                ],
                axis=-1,
            )
            out = jnp.zeros((cap, 4), jnp.int32).at[dst].set(
                lanes, mode="drop"
            )
            return out, count

        _COMPACT_JIT.append(fn)
    return _COMPACT_JIT[0](mat, lengths, bases, k=k, window=window, cap=cap)


class MinimizerTable:
    def __init__(
        self,
        k: int = DEF_KMER_LENGTH,
        window: int = DEF_WINDOW_LENGTH,
        max_hits_per_code: int = DEF_MAX_HITS_PER_CODE,
    ):
        self.k = k
        self.window = window
        self.max_hits_per_code = max_hits_per_code
        self.unique_codes = np.empty(0, np.int64)  # canonical codes, sorted
        self.row_offsets = np.zeros(1, np.int64)
        self.entry_pos = np.empty(0, np.int64)  # fwd-genome kmer start
        self.entry_strand = np.empty(0, np.int8)  # 1 = canonical is rc

    # ---- build -----------------------------------------------------------
    @classmethod
    def build_from_genome(
        cls,
        genome: ReferenceGenome,
        k: int = DEF_KMER_LENGTH,
        window: int = DEF_WINDOW_LENGTH,
        max_hits_per_code: int = DEF_MAX_HITS_PER_CODE,
        chunk: int = 1 << 20,
    ) -> "MinimizerTable":
        """One batched device pass over the whole genome.

        All chunks ride a single (R, chunk) upload; selection AND
        compaction happen on device (_minimizers_compact), so only the
        ~2L/(w+1) selected entries cross the host link — the previous
        per-chunk dispatch+fetch paid ~46 blocking link round trips of
        full-chunk arrays on a 12 Mbp genome (141 s); this build is one
        round trip of ~20 MB."""
        t = cls(k, window, max_hits_per_code)
        lo_bits = 2 * min(k, 15)
        overlap = k + window - 1
        # pow2 chunk sized to the genome (tiny test genomes stay tiny; big
        # genomes batch 1 Mbp rows) so jit shapes repeat across builds
        longest = max(
            (len(genome.sequences[si].codes) for si in range(genome.num_sequences)),
            default=0,
        )
        chunk = 1 << 12
        while chunk < min(longest, 1 << 20):
            chunk <<= 1
        rows: list[np.ndarray] = []
        row_base: list[int] = []
        row_len: list[int] = []
        for si in range(genome.num_sequences):
            seq = genome.sequences[si].codes
            base = int(genome.offsets[si])
            L = len(seq)
            step = chunk - overlap
            for s in range(0, max(1, L - k + 1), step):
                piece = seq[s : s + chunk]
                if len(piece) < k:
                    continue
                rows.append(piece)
                row_base.append(base + s)
                row_len.append(len(piece))
        if not rows:
            return t
        R = 1
        while R < len(rows):  # pow2 row bucket: shapes repeat across builds
            R <<= 1
        mat = np.full((R, chunk), 4, np.int8)
        for i, piece in enumerate(rows):
            mat[i, : len(piece)] = piece
        lengths = np.zeros(R, np.int32)
        lengths[: len(rows)] = row_len
        bases = np.zeros(R, np.int32)
        bases[: len(rows)] = row_base
        # density ~2/(window+1) plus seam duplicates; retry on overflow
        cap = max(4096, int(mat.size * 2.5 / (window + 1)))
        while True:
            out, count = _minimizers_compact(
                mat, lengths, bases, k=k, window=window, cap=cap
            )
            count = int(count)
            if count <= cap:
                break
            cap = int(count * 1.1) + 1024
        out = np.asarray(out[:count])
        hi = out[:, 0].astype(np.int64)
        lo = out[:, 1].astype(np.int64) & 0xFFFFFFFF
        codes = (hi << lo_bits) | lo
        pos = out[:, 2].astype(np.int64)
        strand = out[:, 3].astype(np.int64)
        # dedupe seam duplicates, then CSR by code
        pairs = np.stack([codes, pos, strand], axis=1)
        pairs = np.unique(pairs, axis=0)
        codes, pos, strand = pairs[:, 0], pairs[:, 1], pairs[:, 2]
        order = np.argsort(codes, kind="stable")
        codes, pos, strand = codes[order], pos[order], strand[order]
        starts = np.empty(len(codes), bool)
        starts[0] = True
        np.not_equal(codes[1:], codes[:-1], out=starts[1:])
        uniq = codes[starts]
        offs = np.concatenate([np.nonzero(starts)[0], [len(codes)]]).astype(np.int64)
        counts = np.diff(offs)
        keep_row = counts <= max_hits_per_code
        # rebuild arrays without overrepresented rows
        keep_mask = np.repeat(keep_row, counts)
        t.entry_pos = pos[keep_mask]
        t.entry_strand = strand[keep_mask].astype(np.int8)
        kept_counts = counts[keep_row]
        t.unique_codes = uniq[keep_row]
        t.row_offsets = np.zeros(len(t.unique_codes) + 1, np.int64)
        np.cumsum(kept_counts, out=t.row_offsets[1:])
        return t

    # ---- query -----------------------------------------------------------
    def lookup_rows(self, query_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """For each query code return (row_start, row_end) into entry_pos
        (empty rows for absent codes)."""
        if len(self.unique_codes) == 0:
            z = np.zeros(len(query_codes), np.int64)
            return z, z
        r = np.searchsorted(self.unique_codes, query_codes)
        r = np.clip(r, 0, len(self.unique_codes) - 1)
        hit = self.unique_codes[r] == query_codes
        starts = np.where(hit, self.row_offsets[r], 0)
        ends = np.where(hit, self.row_offsets[r + 1], 0)
        return starts, ends

    def collect_hits(
        self, query_codes: np.ndarray, query_positions: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Expand CSR rows for a single read's forward-strand minimizer codes.

        Queries are canonicalized internally and hits filtered to entries
        whose canonical strand matches the query's, i.e. forward-strand
        genome matches — callers keep the same forward-coordinate view they
        had when the table stored forward codes.  Returns
        (subject_concat_pos, query_pos) — the equivalent of the reference's
        UngappedSearchHit lists (ShortKmerCodesTable.matchCompressed).
        """
        from ..kernels.kmers import rc_code_int64

        rc = rc_code_int64(query_codes, self.k)
        canon = np.minimum(query_codes, rc)
        qflag = (rc < query_codes).astype(np.int8)
        starts, ends = self.lookup_rows(canon)
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        qp = np.repeat(query_positions, counts)
        qf = np.repeat(qflag, counts)
        # ragged gather: build index vector
        idx = np.concatenate(
            [np.arange(s, e, dtype=np.int64) for s, e in zip(starts, ends) if e > s]
        )
        keep = self.entry_strand[idx] == qf
        return self.entry_pos[idx][keep], qp[keep]

    def collect_hits_batch(
        self,
        query_codes: np.ndarray,
        query_positions: np.ndarray,
        query_rows: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """collect_hits over MANY reads at once: one canonicalize, one
        lookup, one fully-vectorized ragged CSR expansion (the per-read
        variant builds its index vector from ~2k tiny aranges per read —
        a visible host cost on long-read batches).  `query_rows` labels
        each query with its read row; hits come back row-major as
        (subject_concat_pos, query_pos, row)."""
        from ..kernels.kmers import rc_code_int64

        rc = rc_code_int64(query_codes, self.k)
        canon = np.minimum(query_codes, rc)
        qflag = (rc < query_codes).astype(np.int8)
        starts, ends = self.lookup_rows(canon)
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            z = np.empty(0, np.int64)
            return z, z, z
        qp = np.repeat(query_positions, counts)
        qf = np.repeat(qflag, counts)
        qr = np.repeat(query_rows, counts)
        off = np.cumsum(counts) - counts
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, counts)
            + np.repeat(starts, counts)
        )
        keep = self.entry_strand[idx] == qf
        return self.entry_pos[idx][keep], qp[keep], qr[keep]

    @property
    def size(self) -> int:
        return len(self.entry_pos)

    # bucketized tables beyond this many unique codes would not fit HBM;
    # fall back to the sorted-key searchsorted layout there
    MAX_BUCKETIZED_CODES = 1 << 24
    BUCKET_WIDTH = 8

    def device_arrays(self):
        """Device-resident lookup structure for the fused seeding kernel —
        uploaded once and cached.  int32 positions require a <2^31-bp
        concatenated genome (the reference's int coordinates have the same
        bound).

        Two layouts, distinguished by the kernel via array rank:

        * bucketized (default): (b_hi (NB, W) int32, b_lo (NB, W) int32,
          b_start (NB, W) int32, b_cnt (NB, W) int32, entry_packed).  A
          query computes bucket = lookup_hash32 & (NB-1) and row-gathers
          the 4 bucket rows — row gathers move whole 32-byte lanes, vs the
          ~24 dependent per-element gathers of a binary search.  NB is
          sized (and doubled on overflow) so every bucket holds <= W codes;
          exactness still comes from the per-slot (hi, lo) compare.
        * sorted-key fallback for tables over MAX_BUCKETIZED_CODES unique
          codes: (hash32 uint32 sorted, ver_hi, ver_lo, row_offsets,
          entry_packed) queried by searchsorted; hash-colliding codes
          (~U^2/2^32) are culled at build."""
        if getattr(self, "_device_arrays", None) is None:
            if len(self.unique_codes) <= self.MAX_BUCKETIZED_CODES:
                self._device_arrays = self._build_bucketized()
                return self._device_arrays
            import jax.numpy as jnp

            from ..kernels.minimizers import lookup_hash32

            assert len(self.entry_pos) == 0 or int(self.entry_pos.max()) < (
                1 << 31
            ), "genome too large for int32 seed positions"
            lo_bits = 2 * min(self.k, 15)
            code_hi = (self.unique_codes >> lo_bits).astype(np.int32)
            code_lo = (self.unique_codes & ((1 << lo_bits) - 1)).astype(np.int32)
            with np.errstate(over="ignore"):
                h = lookup_hash32(code_hi, code_lo)
            order = np.argsort(h, kind="stable")
            hs = h[order]
            dup = np.zeros(len(hs), bool)
            if len(hs) > 1:
                eq = hs[1:] == hs[:-1]
                dup[1:] |= eq
                dup[:-1] |= eq
            keep = ~dup
            counts = np.diff(self.row_offsets)
            starts = self.row_offsets[:-1][order][keep]
            cnts = counts[order][keep]
            total = int(cnts.sum())
            if total:
                out_off = np.concatenate([[0], np.cumsum(cnts)[:-1]])
                idx = (
                    np.repeat(starts, cnts)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(out_off, cnts)
                )
                # pack canonical strand into bit 31 of the int32 position
                entries = self.entry_pos[idx] | (
                    self.entry_strand[idx].astype(np.int64) << 31
                )
            else:
                entries = np.empty(0, np.int64)
            offs = np.zeros(keep.sum() + 1, np.int64)
            np.cumsum(cnts, out=offs[1:])
            self._device_arrays = (
                jnp.asarray(hs[keep], jnp.uint32),
                jnp.asarray(code_hi[order][keep], jnp.int32),
                jnp.asarray(code_lo[order][keep], jnp.int32),
                jnp.asarray(offs, jnp.int32),
                jnp.asarray(entries.astype(np.uint32).view(np.int32)),
            )
        return self._device_arrays

    def _build_bucketized(self):
        import jax.numpy as jnp

        from ..kernels.minimizers import lookup_hash32

        U = len(self.unique_codes)
        assert len(self.entry_pos) == 0 or int(self.entry_pos.max()) < (
            1 << 31
        ), "genome too large for int32 seed positions"
        lo_bits = 2 * min(self.k, 15)
        code_hi = (self.unique_codes >> lo_bits).astype(np.int32)
        code_lo = (self.unique_codes & ((1 << lo_bits) - 1)).astype(np.int32)
        with np.errstate(over="ignore"):
            h = lookup_hash32(code_hi, code_lo)
        W = self.BUCKET_WIDTH
        NB = 1 << max(int(U - 1).bit_length(), 4) if U else 16
        while True:
            b = (h & np.uint32(NB - 1)).astype(np.int64)
            order = np.argsort(b, kind="stable")
            bs = b[order]
            # slot within bucket = rank within equal-bucket run
            run_start = np.concatenate([[0], np.nonzero(bs[1:] != bs[:-1])[0] + 1])
            gid = np.zeros(U, np.int64)
            gid[run_start] = 1
            gid = np.cumsum(gid) - 1
            slot = np.arange(U, dtype=np.int64) - run_start[gid]
            if U == 0 or slot.max() < W:
                break
            NB *= 2  # a bucket overflowed (skewed hashes); re-spread
        # ONE combined (NB, 4W + W*KH) row per bucket — cols [hi | lo |
        # row | cnt | entries] — so a query is a SINGLE row gather (gather
        # cost on this chip is per ROW: four separate (NB, W) tables
        # quadrupled it, and the former separate (U, KH) entry-row table
        # cost a second dependent row gather per minimizer, ~25ms per 32k
        # batch).  Slot w's <= KH entries live at [4W + w*KH, ...); the
        # kernel selects the matching slot's block with the same match
        # mask it uses for row/cnt.  b_cnt keeps the TRUE count for hit
        # weighting.
        from ..kernels.seeding import SEED_HITS_PER_KMER as KH

        b_all = np.zeros((NB, 4 * W + W * KH), np.int32)
        b_all[:, :W] = -1
        b_all[:, W : 2 * W] = -1
        counts = np.diff(self.row_offsets)
        if U:
            b_all[bs, slot] = code_hi[order]
            b_all[bs, W + slot] = code_lo[order]
            b_all[bs, 2 * W + slot] = order.astype(np.int32)  # code row
            b_all[bs, 3 * W + slot] = counts[order].astype(np.int32)
        entries = (
            self.entry_pos | (self.entry_strand.astype(np.int64) << 31)
        ).astype(np.uint32).view(np.int32)
        if U:
            take = np.minimum(counts, KH)[order]
            rows = np.repeat(bs, take)
            base = 4 * W + slot * KH
            cols = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(take)[:-1]]), take
            )
            src = np.repeat(self.row_offsets[:-1][order], take) + cols
            b_all[rows, np.repeat(base, take) + cols] = entries[src]
        return (
            jnp.asarray(b_all),
            jnp.zeros(0, jnp.int32),
            jnp.zeros(0, jnp.int32),
            jnp.zeros(0, jnp.int32),
            jnp.zeros((0, KH), jnp.int32),
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            k=self.k,
            window=self.window,
            max_hits=self.max_hits_per_code,
            unique_codes=self.unique_codes,
            row_offsets=self.row_offsets,
            entry_pos=self.entry_pos,
            entry_strand=self.entry_strand,
        )

    @classmethod
    def load(cls, path: str) -> "MinimizerTable":
        d = np.load(path)
        t = cls(int(d["k"]), int(d["window"]), int(d["max_hits"]))
        t.unique_codes = d["unique_codes"]
        t.row_offsets = d["row_offsets"]
        t.entry_pos = d["entry_pos"]
        t.entry_strand = (
            d["entry_strand"]
            if "entry_strand" in d
            else np.zeros(len(t.entry_pos), np.int8)
        )
        return t

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
from ..kernels.minimizers import extract_minimizers

DEF_KMER_LENGTH = 25  # ref: ReadsAligner.java:62
DEF_WINDOW_LENGTH = 20  # ref: ReadsAligner.java:63
DEF_MAX_HITS_PER_CODE = 500


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
        self.unique_codes = np.empty(0, np.int64)
        self.row_offsets = np.zeros(1, np.int64)
        self.entry_pos = np.empty(0, np.int64)

    # ---- build -----------------------------------------------------------
    @classmethod
    def build_from_genome(
        cls,
        genome: ReferenceGenome,
        k: int = DEF_KMER_LENGTH,
        window: int = DEF_WINDOW_LENGTH,
        max_hits_per_code: int = DEF_MAX_HITS_PER_CODE,
        chunk: int = 1 << 18,
    ) -> "MinimizerTable":
        t = cls(k, window, max_hits_per_code)
        all_codes: list[np.ndarray] = []
        all_pos: list[np.ndarray] = []
        overlap = k + window - 1
        for si in range(genome.num_sequences):
            seq = genome.sequences[si].codes
            base = int(genome.offsets[si])
            L = len(seq)
            step = chunk - overlap
            starts = range(0, max(1, L - k + 1), step)
            for s in starts:
                piece = seq[s : s + chunk]
                if len(piece) < k:
                    continue
                # always pad to the full chunk length: one shape -> one compile
                codes, lengths, _ = pack_reads([piece], pad_to=chunk, pad_multiple=chunk)
                kcodes, sel, valid = extract_minimizers(codes, lengths, k, window)
                sel = np.asarray(sel[0])
                kcodes = np.asarray(kcodes[0])
                # avoid double-selection in the overlap zone: keep positions
                # >= s+overlap only for continuation chunks... but a minimizer
                # near the seam may be selected in either chunk; dedupe later.
                idx = np.nonzero(sel)[0]
                all_codes.append(kcodes[idx].astype(np.int64))
                all_pos.append(base + s + idx.astype(np.int64))
        if not all_codes:
            return t
        codes = np.concatenate(all_codes)
        pos = np.concatenate(all_pos)
        # dedupe seam duplicates, then CSR by code
        pairs = np.stack([codes, pos], axis=1)
        pairs = np.unique(pairs, axis=0)
        codes, pos = pairs[:, 0], pairs[:, 1]
        order = np.argsort(codes, kind="stable")
        codes, pos = codes[order], pos[order]
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
        """Expand CSR rows for a single read's minimizer codes.

        Returns (subject_concat_pos, query_pos) hit pair arrays — the
        equivalent of the reference's UngappedSearchHit lists
        (ShortKmerCodesTable.matchCompressed, UngappedSearchHit.java).
        """
        starts, ends = self.lookup_rows(query_codes)
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        qp = np.repeat(query_positions, counts)
        # ragged gather: build index vector
        idx = np.concatenate(
            [np.arange(s, e, dtype=np.int64) for s, e in zip(starts, ends) if e > s]
        )
        return self.entry_pos[idx], qp

    @property
    def size(self) -> int:
        return len(self.entry_pos)

    def device_arrays(self):
        """Device-resident (hash32 uint32 sorted, ver_hi int32, ver_lo int32,
        row_offsets int32, entry_pos int32) for the fused seeding kernel —
        uploaded once and cached.  The key is `lookup_hash32` of the two
        int32 code halves (TPU int64 compares are emulated); queries verify
        (hi, lo) exactly.  Hash-colliding codes (~U^2/2^32, a handful per
        genome) are dropped at build time — equivalent to a slightly
        stricter max_hits_per_code cull.  int32 positions require a <2^31-bp
        concatenated genome (the reference's int coordinates have the same
        bound)."""
        if getattr(self, "_device_arrays", None) is None:
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
                entries = self.entry_pos[idx]
            else:
                entries = np.empty(0, np.int64)
            offs = np.zeros(keep.sum() + 1, np.int64)
            np.cumsum(cnts, out=offs[1:])
            self._device_arrays = (
                jnp.asarray(hs[keep], jnp.uint32),
                jnp.asarray(code_hi[order][keep], jnp.int32),
                jnp.asarray(code_lo[order][keep], jnp.int32),
                jnp.asarray(offs, jnp.int32),
                jnp.asarray(entries, jnp.int32),
            )
        return self._device_arrays

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            k=self.k,
            window=self.window,
            max_hits=self.max_hits_per_code,
            unique_codes=self.unique_codes,
            row_offsets=self.row_offsets,
            entry_pos=self.entry_pos,
        )

    @classmethod
    def load(cls, path: str) -> "MinimizerTable":
        d = np.load(path)
        t = cls(int(d["k"]), int(d["window"]), int(d["max_hits"]))
        t.unique_codes = d["unique_codes"]
        t.row_offsets = d["row_offsets"]
        t.entry_pos = d["entry_pos"]
        return t

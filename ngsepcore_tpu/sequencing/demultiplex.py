"""Read demultiplexing by barcodes.

Ref: src/ngsep/sequencing/ReadsDemultiplex.java (command `Demultiplex`:
barcode trie lookup per read, per-lane fastq demux, dual barcodes, adapter
trimming, gzip outputs) and BarcodeMap.java.

The barcode "trie" becomes a sorted-prefix numpy array: reads are encoded
and their prefixes matched against all barcodes at once (longest match
wins, like the reference trie).
"""
from __future__ import annotations

from dataclasses import dataclass


from ..core.degenerate import compile_degenerate
from ..core.sequences import RawRead
from ..io.fastq import FastqFileReader, write_fastq


class BarcodeMap:
    def __init__(self, barcode_to_sample: dict[str, str]):
        # longest barcode first so the longest match wins (trie semantics)
        self.barcodes = sorted(barcode_to_sample, key=len, reverse=True)
        self.samples = {b: barcode_to_sample[b] for b in self.barcodes}

    def match(self, sequence: str) -> tuple[str, str] | None:
        """Returns (barcode, sample) of the longest matching barcode."""
        for b in self.barcodes:
            if sequence.startswith(b):
                return b, self.samples[b]
        return None


@dataclass
class DemuxStats:
    total: int = 0
    assigned: int = 0
    per_sample: dict = None

    def __post_init__(self):
        if self.per_sample is None:
            self.per_sample = {}


class ReadsDemultiplex:
    def __init__(
        self,
        barcode_map: BarcodeMap,
        trim_barcode: bool = True,
        min_read_length: int = 40,
        adapter: str | None = None,
    ):
        self.barcode_map = barcode_map
        self.trim_barcode = trim_barcode
        self.min_read_length = min_read_length
        self.adapter = adapter
        # trim sequences may carry IUPAC degenerate bases (ref
        # ReadsDemultiplex.java:174 compiles them to regexes)
        self._adapter_pattern = (
            compile_degenerate(adapter) if adapter else None
        )
        self.stats = DemuxStats()

    def demultiplex_file(self, fastq_path: str, out_prefix: str, gzip_out: bool = True):
        """Split one lane fastq into per-sample files."""
        buckets: dict[str, list[RawRead]] = {}
        for read in FastqFileReader(fastq_path):
            self.stats.total += 1
            m = self.barcode_map.match(read.sequence)
            if m is None:
                continue
            barcode, sample = m
            seq = read.sequence
            qual = read.qualities
            if self.trim_barcode:
                seq = seq[len(barcode) :]
                qual = qual[len(barcode) :] if qual else None
            if self._adapter_pattern is not None:
                m = self._adapter_pattern.search(seq)
                if m is not None:
                    seq = seq[: m.start()]
                    qual = qual[: m.start()] if qual else None
            if len(seq) < self.min_read_length:
                continue
            self.stats.assigned += 1
            self.stats.per_sample[sample] = self.stats.per_sample.get(sample, 0) + 1
            buckets.setdefault(sample, []).append(RawRead(read.name, seq, qual))
        ext = ".fastq.gz" if gzip_out else ".fastq"
        paths = {}
        for sample, reads in buckets.items():
            path = f"{out_prefix}_{sample}{ext}"
            write_fastq(reads, path)
            paths[sample] = path
        return paths


def load_barcode_file(path: str) -> dict[str, str]:
    """Barcode file: <barcode><TAB><sampleId> (ref: io/BarcodesFileLoader)."""
    out = {}
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2 and not line.startswith("#"):
                out[parts[0].upper()] = parts[1]
    return out

"""Dual-barcode, per-lane, streaming demultiplexing
(ref: ReadsDemultiplex.java:244, BarcodeMap.java, io/BarcodesFileLoader,
io/LaneFilesLoader)."""
import gzip

from ngsepcore_tpu.sequencing.demultiplex import (
    BarcodeMap,
    ReadsDemultiplex,
    load_lane_files,
    load_lanes_index,
)


def _fastq(path, reads):
    with open(path, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def _read_fastq_gz(path):
    out = []
    with gzip.open(path, "rt") as fh:
        lines = fh.read().splitlines()
    for i in range(0, len(lines), 4):
        out.append((lines[i][1:], lines[i + 1]))
    return out


def test_longest_barcode_wins():
    bm = BarcodeMap()
    bm.add_single_barcode("ACGT", "s1")
    bm.add_single_barcode("ACGTTT", "s2")
    assert bm.match("ACGTTTAAAA") == ("ACGTTT", "s2")
    assert bm.match("ACGTAAAA") == ("ACGT", "s1")
    assert bm.match("TTTTAAAA") is None


def test_dual_barcode_pairs():
    bm = BarcodeMap()
    bm.add_dual_barcode("ACGT", "GGCC", "sA")
    bm.add_dual_barcode("ACGT", "TTAA", "sB")
    assert bm.match_pair("ACGTAAAA", "GGCCAAAA") == ("ACGT", "GGCC", "sA")
    assert bm.match_pair("ACGTAAAA", "TTAAAAAA") == ("ACGT", "TTAA", "sB")
    # unregistered pair of registered halves -> None
    bm.add_dual_barcode("CCCC", "GGCC", "sC")
    assert bm.match_pair("CCCCAAAA", "TTAAAAAA") is None


def test_lane_index_and_descriptor(tmp_path):
    idx = tmp_path / "index.txt"
    idx.write_text(
        "flowcell\tlane\tbarcode\tsample\n"
        "FC1\t1\tACGT\ts1\n"
        "FC1\t1\tGGGG\ts2\n"
        "FC2\t3\tTTTT\ts3\n"
    )
    lanes = load_lanes_index(str(idx), dual_barcode=False)
    assert [l.unique_key for l in lanes] == ["FC1_1", "FC2_3"]
    f1 = tmp_path / "l1.fastq"
    f2 = tmp_path / "l2.fastq"
    _fastq(f1, [("r1", "ACGT" + "A" * 20), ("r2", "GGGG" + "C" * 20)])
    _fastq(f2, [("r3", "ACGT" + "G" * 20)])
    desc = tmp_path / "lanes.txt"
    desc.write_text(f"FC1\t1\t{f1}\nFC1\t1\t{f2}\nFC9\t9\tmissing.fastq\n")
    load_lane_files(str(desc), lanes)
    assert lanes[0].files_forward == [str(f1), str(f2)]

    d = ReadsDemultiplex(
        min_read_length=10, out_directory=str(tmp_path)
    )
    d.demultiplex_lanes(lanes[:1])
    # sample s1 got reads from BOTH files of the lane group (appended)
    s1 = _read_fastq_gz(str(tmp_path / "s1.fastq.gz"))
    assert [n for n, _ in s1] == ["r1", "r3"]
    assert s1[0][1] == "A" * 20  # barcode trimmed
    s2 = _read_fastq_gz(str(tmp_path / "s2.fastq.gz"))
    assert [n for n, _ in s2] == ["r2"]


def test_paired_dual_barcode_demux(tmp_path):
    idx = tmp_path / "index.txt"
    idx.write_text(
        "flowcell\tlane\tb1\tb2\tsample\n"
        "FC1\t1\tACGT\tGGCC\tsA\n"
        "FC1\t1\tACGT\tTTAA\tsB\n"
    )
    lanes = load_lanes_index(str(idx), dual_barcode=True)
    r1 = tmp_path / "r1.fastq"
    r2 = tmp_path / "r2.fastq"
    _fastq(
        r1,
        [
            ("p1", "ACGT" + "A" * 30),
            ("p2", "ACGT" + "C" * 30),
            ("p3", "NNNN" + "G" * 30),
        ],
    )
    _fastq(
        r2,
        [
            ("p1", "GGCC" + "T" * 30),
            ("p2", "TTAA" + "G" * 30),
            ("p3", "GGCC" + "A" * 30),
        ],
    )
    d = ReadsDemultiplex(
        dual_barcode=True, min_read_length=10, out_directory=str(tmp_path)
    )
    d.barcode_map = lanes[0].barcode_map
    paths = d.demultiplex_paired(str(r1), str(r2))
    assert set(paths) == {"sA", "sB"}
    a1 = _read_fastq_gz(str(tmp_path / "sA_1.fastq.gz"))
    a2 = _read_fastq_gz(str(tmp_path / "sA_2.fastq.gz"))
    assert a1 == [("p1", "A" * 30)]
    assert a2 == [("p1", "T" * 30)]  # read2 barcode trimmed too
    b1 = _read_fastq_gz(str(tmp_path / "sB_1.fastq.gz"))
    assert b1 == [("p2", "C" * 30)]
    assert d.stats.not_found == 1
    assert d.stats.total == 3


def test_adapter_trims_mate_to_length(tmp_path):
    bm = BarcodeMap({"ACGT": "s"})
    r1 = tmp_path / "a1.fastq"
    r2 = tmp_path / "a2.fastq"
    # read1 carries the adapter CCCCC after 12 bases of payload
    _fastq(r1, [("x", "ACGT" + "A" * 12 + "CCCCC" + "T" * 5)])
    _fastq(r2, [("x", "G" * 26)])
    d = ReadsDemultiplex(
        bm, min_read_length=5, adapter="CCCCC",
        out_directory=str(tmp_path), uncompressed_output=True,
    )
    paths = d.demultiplex_paired(str(r1), str(r2))
    p1, p2 = paths["s"]
    lines1 = open(p1).read().splitlines()
    lines2 = open(p2).read().splitlines()
    assert lines1[1] == "A" * 12
    assert lines2[1] == "G" * 12  # mate trimmed to read1's length


def test_stats_report(tmp_path):
    bm = BarcodeMap({"ACGT": "s1"})
    f = tmp_path / "l.fastq"
    _fastq(f, [("a", "ACGT" + "A" * 30), ("b", "TTTT" + "A" * 30),
               ("c", "ACGT" + "A" * 3)])
    d = ReadsDemultiplex(bm, min_read_length=10,
                         out_directory=str(tmp_path))
    d.demultiplex_file(str(f))
    rep = d.stats.report()
    assert "Total fragments\t3" in rep
    assert "s1\t1" in rep
    assert "Not found\t1" in rep
    assert "Fragment too short\t1" in rep

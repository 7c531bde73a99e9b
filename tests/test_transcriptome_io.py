"""Transcriptome format readers (GTF2, UCSC, CCDS) and GFF3 writer."""
import os

from ngsepcore_tpu.transcriptome.io_formats import (
    combine_annotations,
    load_transcriptome,
    load_transcriptome_ccds,
    load_transcriptome_gtf2,
    load_transcriptome_ucsc,
    write_transcriptome_gff3,
)
from ngsepcore_tpu.transcriptome.model import CODING


def test_gtf2_reader(tmp_path):
    p = tmp_path / "x.gtf"
    p.write_text(
        'chr1\tsrc\ttranscript\t100\t500\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tsrc\texon\t100\t200\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tsrc\tCDS\t150\t200\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tsrc\texon\t300\t500\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
    )
    t = load_transcriptome_gtf2(str(p))
    assert "t1" in t.transcripts and "g1" in t.genes
    tr = t.transcripts["t1"]
    assert tr.first == 100 and tr.last == 500
    assert any(s.status == CODING and s.first == 150 for s in tr.segments)


def test_ucsc_reader(tmp_path):
    p = tmp_path / "x.txt"
    # name chrom strand txStart txEnd cdsStart cdsEnd exonCount starts ends gene
    p.write_text(
        "t1\tchr1\t+\t99\t500\t149\t400\t2\t99,299,\t200,500,\tGENE1\n"
    )
    t = load_transcriptome_ucsc(str(p))
    tr = t.transcripts["t1"]
    assert tr.first == 100 and tr.last == 500 and tr.gene_id == "GENE1"
    cds = [s for s in tr.segments if s.status == CODING]
    assert cds and cds[0].first == 150
    assert t.genes["GENE1"].name == "GENE1"


def test_ccds_reader(tmp_path):
    p = tmp_path / "ccds.txt"
    p.write_text(
        "#chromosome\tnc\tgene\tgene_id\tccds_id\tstatus\tstrand\tfrom\tto\tlocations\tmatch\n"
        "1\tNC_1\tGENE1\tg1\tCCDS1.1\tPublic\t+\t99\t499\t[99-199, 299-499]\tIdentical\n"
        "1\tNC_1\tGENE2\tg2\tCCDS2.1\tWithdrawn\t+\t99\t499\t[99-199]\tIdentical\n"
    )
    t = load_transcriptome_ccds(str(p))
    assert "CCDS1.1" in t.transcripts and "CCDS2.1" not in t.transcripts
    tr = t.transcripts["CCDS1.1"]
    assert tr.sequence_name == "chr1" and tr.first == 100
    assert all(s.status == CODING for s in tr.segments)


def test_gff3_writer_roundtrip(tmp_path):
    p = tmp_path / "x.gtf"
    p.write_text(
        'chr1\tsrc\ttranscript\t100\t500\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tsrc\tCDS\t150\t200\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
    )
    t = load_transcriptome_gtf2(str(p))
    out = tmp_path / "x.gff3"
    write_transcriptome_gff3(t, str(out))
    t2 = load_transcriptome(str(out))
    assert "t1" in t2.transcripts
    assert t2.transcripts["t1"].coding


def test_combine_annotations(tmp_path):
    p = tmp_path / "a.gtf"
    p.write_text(
        'chr1\tsrc\ttranscript\t100\t500\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tsrc\texon\t100\t500\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
    )
    q = tmp_path / "b.gtf"
    q.write_text(
        'chr1\tsrc\ttranscript\t700\t900\t.\t-\t.\tgene_id "g2"; transcript_id "t2";\n'
        'chr1\tsrc\texon\t700\t900\t.\t-\t.\tgene_id "g2"; transcript_id "t2";\n'
    )
    a = load_transcriptome_gtf2(str(p))
    b = load_transcriptome_gtf2(str(q))
    c = combine_annotations(a, b)
    assert set(c.transcripts) == {"t1", "t2"}

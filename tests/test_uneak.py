"""UneakToVCFConverter: HapMap + consensus tag pairs -> VCF + consensus fa.

Ref semantics: src/ngsep/gbs/UneakToVCFConverter.java:31-101.
"""
from ngsepcore_tpu.gbs.uneak import convert_uneak
from ngsepcore_tpu.vcf.io import VCFFileReader


def _write_inputs(tmp_path):
    # two sites, three samples; tag pairs differ at one base
    hap = tmp_path / "hap.txt"
    cols = [
        "rs#", "alleles", "chrom", "pos", "strand", "assembly#", "center",
        "protLSID", "assayLSID", "panelLSID", "QCcode", "S1", "S2", "S3",
    ]
    rows = [
        ["TP1", "A/G", "0", "1", "+", "-", "-", "-", "-", "-", "-",
         "A", "G", "R"],  # homref / homalt / het (IUPAC R = A/G)
        ["TP2", "C/T", "0", "2", "+", "-", "-", "-", "-", "-", "-",
         "N", "C", "T"],  # undecided / homref / homalt
    ]
    hap.write_text(
        "\t".join(cols) + "\n" + "\n".join("\t".join(r) for r in rows) + "\n"
    )
    fa = tmp_path / "cons.fa"
    fa.write_text(
        ">TP1_q\nTTACGT\n>TP1_h\nTTGCGT\n"  # differ at offset 2 (A vs G)
        ">TP2_q\nGGGGC\n>TP2_h\nGGGGT\n"    # differ at offset 4 (C vs T)
    )
    return str(hap), str(fa)


def test_uneak_conversion(tmp_path):
    hap, fa = _write_inputs(tmp_path)
    prefix = str(tmp_path / "out")
    n_sites, n_samples = convert_uneak(hap, fa, prefix)
    assert (n_sites, n_samples) == (2, 3)

    reader = VCFFileReader(prefix + ".vcf")
    records = reader.load_all()
    assert reader.sample_ids == ["S1", "S2", "S3"]
    r1, r2 = records
    assert (r1.variant.sequence_name, r1.variant.first) == ("TP1", 3)
    assert r1.variant.alleles == ["A", "G"]
    gts = [c.indexes_called_alleles for c in r1.calls]
    assert gts == [[0, 0], [1, 1], [0, 1]]
    assert (r2.variant.sequence_name, r2.variant.first) == ("TP2", 5)
    assert r2.calls[0].is_undecided
    assert r2.calls[1].indexes_called_alleles == [0, 0]
    assert r2.calls[2].indexes_called_alleles == [1, 1]

    # consensus fasta: one sequence per site, named by the site, tag-1 seq
    fa_lines = open(prefix + "_consensus.fa").read().split()
    assert fa_lines[0] == ">TP1" and fa_lines[1] == "TTACGT"
    assert fa_lines[2] == ">TP2" and fa_lines[3] == "GGGGC"


def test_uneak_cli_registered():
    import ngsepcore_tpu.cli.commands  # noqa: F401  (populates registry)
    from ngsepcore_tpu.cli.registry import get_command

    assert get_command("UneakToVCFConverter") is not None

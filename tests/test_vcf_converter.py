import gzip

import numpy as np

from ngsepcore_tpu.variants.model import CalledGenomicVariant
from ngsepcore_tpu.vcf.converter import CONVERTERS, POPULATION_CONVERTERS
from ngsepcore_tpu.vcf.io import VCFRecord


def _records():
    recs = []
    for pos, genos in [(100, [0, 1, 2]), (200, [2, 2, 0]), (300, [1, None, 0])]:
        calls = []
        for i, g in enumerate(genos):
            idxs = [] if g is None else ([0, 0] if g == 0 else [0, 1] if g == 1 else [1, 1])
            calls.append(
                CalledGenomicVariant(
                    sequence_name="chr1", first=pos, alleles=["A", "G"],
                    sample_id=f"s{i}", indexes_called_alleles=idxs,
                )
            )
        recs.append(VCFRecord(variant=calls[0], calls=calls))
    return recs


def test_all_converters_produce_output(tmp_path):
    recs = _records()
    for name, fn in CONVERTERS.items():
        prefix = str(tmp_path / name)
        fn(recs, prefix)
        produced = [p for p in tmp_path.iterdir() if p.name.startswith(name)]
        assert produced, f"{name} produced no files"
        for p in produced:
            assert p.stat().st_size > 0, f"{name}: {p.name} empty"
    pops = {"s0": "p1", "s1": "p1", "s2": "p2"}
    for name, fn in POPULATION_CONVERTERS.items():
        prefix = str(tmp_path / name)
        fn(recs, pops, prefix)


def test_plink_ped_contents(tmp_path):
    recs = _records()
    CONVERTERS["Plink"](recs, str(tmp_path / "out"))
    ped = (tmp_path / "out.ped").read_text().splitlines()
    assert len(ped) == 3
    f0 = ped[0].split("\t")
    assert f0[6:8] == ["A", "A"]  # s0 at pos100: hom ref
    assert f0[8:10] == ["G", "G"]  # s0 at pos200: hom alt
    mapf = (tmp_path / "out.map").read_text().splitlines()
    assert len(mapf) == 3


def test_fasta_iupac(tmp_path):
    recs = _records()
    CONVERTERS["Fasta"](recs, str(tmp_path / "o"))
    text = (tmp_path / "o_aln.fa").read_text()
    # sample s0: pos100=A (hom ref), pos200=G (hom alt), pos300=R (het A/G)
    assert ">s0\nAGR" in text


def test_treemix_counts(tmp_path):
    recs = _records()
    pops = {"s0": "p1", "s1": "p1", "s2": "p2"}
    POPULATION_CONVERTERS["TreeMix"](recs, pops, str(tmp_path / "t"))
    with gzip.open(tmp_path / "t_treemix.txt.gz", "rt") as fh:
        lines = fh.read().splitlines()
    assert lines[0].split() == ["p1", "p2"]
    # site 100: p1 = s0(0)+s1(1) -> ref 3, alt 1 ; p2 = s2(2) -> ref 0 alt 2
    assert lines[1].split() == ["3,1", "0,2"]


def test_gwaspoly_contents(tmp_path):
    recs = _records()
    CONVERTERS["GWASPoly"](recs, str(tmp_path / "g"))
    lines = (tmp_path / "g_GWASPoly.csv").read_text().splitlines()
    assert lines[0] == "Marker,Chrom,Position,s0,s1,s2"
    assert lines[1] == "1,chr1,100,AA,AG,GG"
    assert lines[3].endswith("AG,NA,AA")


def test_spagedi_contents(tmp_path):
    recs = _records()
    CONVERTERS["Spagedi"](recs, str(tmp_path / "sp"))
    lines = (tmp_path / "sp_spagedi.in").read_text().splitlines()
    assert lines[0] == "3\t0\t0\t3\t1\t2"
    assert lines[-1] == "END"
    s1 = [l for l in lines if l.startswith("s1\t")][0]
    assert s1 == "s1\t1,2\t2,2\t0,0"


def test_powermarker_contents(tmp_path):
    recs = _records()
    CONVERTERS["PowerMarker"](recs, str(tmp_path / "pm"))
    snp = (tmp_path / "pm_powermarker.snp").read_text().splitlines()
    assert snp == ["1\tchr1\t100", "2\tchr1\t200", "3\tchr1\t300"]
    rows = (tmp_path / "pm_powermarker.in").read_text().splitlines()
    s2 = [l for l in rows if l.startswith("s2\t")][0]
    assert s2 == "s2\t1\t1\t0\t0\t0\t0"


def test_joinmap_contents(tmp_path):
    recs = _records()
    from ngsepcore_tpu.vcf.converter import convert_joinmap

    convert_joinmap(recs, str(tmp_path / "jm"), parent1="s0", parent2="s1")
    lines = (tmp_path / "jm_joinmap.txt").read_text().splitlines()
    assert lines[0].startswith("SNPID\tSegregation\tClasification\ts0\ts1\ts2")
    # pos100: P1 homref, P2 het -> <nnxnp>; s2 homalt is inconsistent with
    # the cross (nn x np offspring can only be nn or np) -> unknown "--"
    l100 = [l for l in lines if l.startswith("chr1_100")][0]
    assert "<nnxnp>" in l100 and l100.split("\t")[3:] == ["nn", "np", "--"]
    # pos200: both parents hom -> not segregating
    assert not any(l.startswith("chr1_200") for l in lines)
    # pos300: P2 undecided -> skipped
    assert not any(l.startswith("chr1_300") for l in lines)


def test_finestructure_contents(tmp_path):
    recs = _records()
    from ngsepcore_tpu.vcf.converter import convert_finestructure

    convert_finestructure(recs, str(tmp_path / "fs"))
    lines = (tmp_path / "fs_fineStructure.phase").read_text().splitlines()
    assert lines[0] == "6"
    assert lines[1] == "3"
    assert lines[2] == "P 100 200 300"
    assert lines[3] == "010"  # s0 hap1: homref, homalt, het(0)
    assert lines[4] == "011"  # s0 hap2


def test_haploview_contents(tmp_path):
    recs = _records()
    CONVERTERS["Haploview"](recs, str(tmp_path / "hv"))
    info = (tmp_path / "hv_haploview.info").read_text().splitlines()
    assert info[0] == "chr1_100\t100"
    ped = (tmp_path / "hv_haploview.ped").read_text().splitlines()
    assert len(ped) == 3

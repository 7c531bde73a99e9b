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

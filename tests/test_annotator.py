import numpy as np
import pytest

from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.transcriptome.annotator import VariantFunctionalAnnotator
from ngsepcore_tpu.transcriptome.gff3 import load_transcriptome_gff3
from ngsepcore_tpu.transcriptome.protein import ProteinTranslator
from ngsepcore_tpu.variants.model import GenomicVariant


def test_protein_translator():
    t = ProteinTranslator()
    assert t.translate("ATGGCTTAA") == "MA"
    assert t.translate_codon("TGG") == "W"
    assert t.is_stop("TAG")
    assert t.translate("ATGAAACCC", trim_at_stop=False) == "MKP"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    # genome: 3000bp; gene on + strand: exon1 1001-1100 (CDS 1001-1100),
    # intron 1101-1200, exon2 1201-1300 (CDS)
    rng = np.random.default_rng(30)
    seq = list("".join(rng.choice(list("ACGT"), size=3000)))
    # make the CDS start with ATG
    seq[1000:1003] = list("ATG")
    seq = "".join(seq)
    genome = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", seq)])
    )
    gff = tmp_path_factory.mktemp("gff") / "genes.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\ttest\tgene\t1001\t1300\t.\t+\t.\tID=gene1;Name=G1\n"
        "chr1\ttest\tmRNA\t1001\t1300\t.\t+\t.\tID=t1;Parent=gene1\n"
        "chr1\ttest\tCDS\t1001\t1100\t.\t+\t0\tID=c1;Parent=t1\n"
        "chr1\ttest\tCDS\t1201\t1300\t.\t+\t1\tID=c2;Parent=t1\n"
    )
    transcriptome = load_transcriptome_gff3(str(gff))
    ann = VariantFunctionalAnnotator(genome, transcriptome)
    return genome, seq, ann


def _snv(pos, ref, alt):
    return GenomicVariant("chr1", pos, [ref, alt])


def test_intergenic(setup):
    genome, seq, ann = setup
    a = ann.annotate(_snv(2900, seq[2899], "A" if seq[2899] != "A" else "C"))
    assert a.annotation == "intergenic_variant"


def test_upstream_downstream(setup):
    genome, seq, ann = setup
    a = ann.annotate(_snv(500, seq[499], "A" if seq[499] != "A" else "C"))
    assert a.annotation == "upstream_transcript_variant"
    b = ann.annotate(_snv(1450, seq[1449], "A" if seq[1449] != "A" else "C"))
    assert b.annotation == "downstream_transcript_variant"


def test_intron_and_splice(setup):
    genome, seq, ann = setup
    assert ann.annotate(_snv(1101, seq[1100], "A" if seq[1100] != "A" else "C")).annotation == "splice_donor_variant"
    assert ann.annotate(_snv(1200, seq[1199], "A" if seq[1199] != "A" else "C")).annotation == "splice_acceptor_variant"
    assert ann.annotate(_snv(1150, seq[1149], "A" if seq[1149] != "A" else "C")).annotation == "intron_variant"


def test_start_lost(setup):
    genome, seq, ann = setup
    a = ann.annotate(_snv(1001, "A", "G"))
    assert a.annotation == "start_lost"


def test_synonymous_and_missense(setup):
    genome, seq, ann = setup
    from ngsepcore_tpu.transcriptome.protein import ProteinTranslator

    tr = ProteinTranslator()
    # find a codon where a third-base change is synonymous
    found_syn = found_mis = None
    for ci in range(1, 33):
        codon = seq[1000 + 3 * ci : 1003 + 3 * ci]
        for alt in "ACGT":
            if alt == codon[2]:
                continue
            new = codon[:2] + alt
            if tr.translate_codon(new) == tr.translate_codon(codon) and found_syn is None:
                found_syn = (1003 + 3 * ci, codon[2], alt)
            ref_aa, alt_aa = tr.translate_codon(codon), tr.translate_codon(new)
            if alt_aa not in (ref_aa, "*") and ref_aa != "*" and found_mis is None:
                found_mis = (1003 + 3 * ci, codon[2], alt)
    pos, ref, alt = found_syn
    assert ann.annotate(_snv(pos, ref, alt)).annotation == "synonymous_variant"
    pos, ref, alt = found_mis
    a = ann.annotate(_snv(pos, ref, alt))
    assert a.annotation == "missense_variant"
    assert a.aa_change is not None


def test_frameshift_and_inframe(setup):
    genome, seq, ann = setup
    a = ann.annotate(GenomicVariant("chr1", 1050, [seq[1049] + seq[1050], seq[1049]]))
    assert a.annotation == "frameshift_variant"
    b = ann.annotate(
        GenomicVariant("chr1", 1050, [seq[1049:1053], seq[1049]])
    )
    assert b.annotation == "inframe_deletion"

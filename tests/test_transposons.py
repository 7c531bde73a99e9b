import numpy as np

from ngsepcore_tpu.core.genome import ReferenceGenome
from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
from ngsepcore_tpu.genome.transposons import (
    find_repeats_by_library,
    find_repeats_denovo,
)


def test_denovo_repeat_discovery():
    rng = np.random.default_rng(6)
    unique = lambda n: "".join(rng.choice(list("ACGT"), size=n))
    te = unique(500)
    # genome with 15 copies of the same TE
    genome_str = unique(2000)
    for _ in range(15):
        genome_str += te + unique(1000)
    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", genome_str)])
    )
    anns = find_repeats_denovo(g, min_multiplicity=10, min_length=200)
    assert len(anns) >= 10
    total_repeat = sum(a.length() for a in anns)
    assert total_repeat > 10 * 400


def test_library_search():
    rng = np.random.default_rng(9)
    unique = lambda n: "".join(rng.choice(list("ACGT"), size=n))
    te = unique(600)
    genome_str = unique(3000) + te + unique(3000) + te + unique(2000)
    g = ReferenceGenome(
        QualifiedSequenceList([QualifiedSequence.from_string("chr1", genome_str)])
    )
    lib = QualifiedSequenceList([QualifiedSequence.from_string("TE1", te)])
    anns = find_repeats_by_library(g, list(lib), min_hits=5)
    assert len(anns) == 2
    assert abs(anns[0].first - 3001) < 50
    assert abs(anns[1].first - (3000 + 600 + 3000 + 1)) < 50
    assert all(a.te_id == "TE1" for a in anns)

from .sequences import (
    DNA_ALPHABET,
    encode_dna,
    decode_dna,
    reverse_complement_codes,
    reverse_complement,
    pack_reads,
    QualifiedSequence,
    QualifiedSequenceList,
    RawRead,
)
from .regions import GenomicRegion, GenomicRegionSortedCollection
from .genome import ReferenceGenome

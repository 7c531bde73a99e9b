from .read_alignment import ReadAlignment
from .reads_aligner import ReadsAligner

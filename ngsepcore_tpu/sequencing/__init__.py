from .demultiplex import ReadsDemultiplex, BarcodeMap
from .trimmer import RawReadsTrimmer

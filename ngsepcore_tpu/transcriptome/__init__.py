from .model import Gene, Transcript, Transcriptome
from .gff3 import load_transcriptome_gff3
from .protein import ProteinTranslator

from .fasta import load_fasta, save_fasta, FastaFileReader
from .fastq import FastqFileReader, write_fastq

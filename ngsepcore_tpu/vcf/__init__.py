from .io import VCFFileReader, VCFFileWriter, VCFRecord

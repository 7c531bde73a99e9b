from .kmers_map import KmersMap
from .kmers_extractor import KmersExtractor
from .kmers_analyzer import KmersMapAnalyzer

from .logmath import log10_sum, log10_sum_array, power10
from .phred import phred_score, phred_probability
from .fisher import fisher_exact_2x2
from .distribution import Distribution

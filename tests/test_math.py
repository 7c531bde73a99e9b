import io
import math

import numpy as np

from ngsepcore_tpu.math.distribution import Distribution
from ngsepcore_tpu.math.fisher import fisher_exact_2x2
from ngsepcore_tpu.math.logmath import log10_sum, log10_sum_array, power10
from ngsepcore_tpu.math.phred import phred_probability, phred_score


def test_log10_sum():
    assert abs(log10_sum(0.0, 0.0) - math.log10(2)) < 1e-12
    assert log10_sum(None, -1.0) == -1.0
    assert log10_sum(-1.0, None) == -1.0
    # huge difference: dominated by the larger term
    assert log10_sum(0.0, -100.0) == 0.0


def test_log10_sum_array():
    vals = np.log10(np.array([0.1, 0.2, 0.7]))
    assert abs(log10_sum_array(vals) - 0.0) < 1e-12


def test_power10():
    assert power10(None) == 0.0
    assert abs(power10(-1.0) - 0.1) < 1e-15


def test_phred():
    assert phred_score(0.001) == 30
    assert phred_score(1.0) == 0
    assert phred_score(0.0) == 255
    assert abs(phred_probability(30) - 0.001) < 1e-12
    # ref clamps at 255
    assert phred_score(1e-40) == 255


def test_fisher_balanced_is_high_p():
    p = fisher_exact_2x2(10, 10, 10, 10)
    assert p > 0.99


def test_fisher_skewed_is_low_p():
    p = fisher_exact_2x2(20, 0, 0, 20)
    assert p < 1e-8


def test_fisher_vs_scipy_values():
    # precomputed two-sided values
    assert abs(fisher_exact_2x2(8, 2, 1, 5) - 0.03496503496503495) < 1e-9


def test_distribution():
    d = Distribution(0, 10, 1)
    d.process_array(np.array([1.0, 1.0, 2.0, 15.0]))
    assert d.counts[1] == 2
    assert d.counts[2] == 1
    assert d.outliers_more == 1
    assert abs(d.average - 4.75) < 1e-12
    buf = io.StringIO()
    d.print_distribution(buf)
    assert "More\t1" in buf.getvalue()


def test_distribution_local_mode():
    d = Distribution(0, 100, 1)
    d.process_array(np.array([20.0] * 5 + [30.0] * 10 + [40.0] * 3))
    assert d.local_mode(10, 50) == 30

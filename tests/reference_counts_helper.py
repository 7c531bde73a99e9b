"""Trusted host mirror of CountsHelper (CountsHelper.java) for kernel tests."""
import math

import numpy as np

NUM_FREQ = 501
MIN_BASE_QS = 3
MAX_BASE_QS = 30


class CountsHelperMirror:
    def __init__(self, alleles, het_proportion=0.5, max_base_qs=MAX_BASE_QS):
        self.alleles = list(alleles)
        n = len(alleles)
        self.n = n
        self.counts = np.zeros(n, dtype=int)
        self.log_cond = np.zeros((n, n))
        self.total = 0
        self.low_qual = 0
        self.het_proportion = het_proportion
        self.max_base_qs = max_base_qs

    def update(self, allele, qual):
        self.total += 1
        f = round(self.het_proportion * (NUM_FREQ - 1))
        g = round((1 - self.het_proportion) * (NUM_FREQ - 1))
        if qual <= MIN_BASE_QS:
            self.low_qual += 1
            return
        qual = min(qual, self.max_base_qs)
        if allele not in self.alleles:
            return
        idx = self.alleles.index(allele)
        self.counts[idx] += 1
        n = self.n
        err = 10.0 ** (-0.1 * qual)
        log_err_n = -0.1 * qual - math.log10(n - 1)
        af_f = f / (NUM_FREQ - 1)
        af_g = g / (NUM_FREQ - 1)
        log_gt0 = math.log10(1 - err)
        log_gt_f = math.log10(af_f * (1 - err) + (1 - af_f) * err / (n - 1))
        log_gt_g = math.log10(af_g * (1 - err) + (1 - af_g) * err / (n - 1))
        for i in range(n):
            if i == idx:
                self.log_cond[i][i] += log_gt0
            else:
                self.log_cond[i][i] += log_err_n
            for j in range(n):
                if i != j:
                    if j == idx:
                        self.log_cond[i][j] += log_gt_f
                    elif i == idx:
                        self.log_cond[i][j] += log_gt_g
                    else:
                        self.log_cond[i][j] += log_err_n

    def posteriors(self, het_rate):
        n = self.n
        log_prior_het = math.log10(het_rate / (n * (n - 1)))
        log_prior_homo = math.log10((1 - het_rate) / n)
        ev = self.log_cond + np.where(
            np.eye(n, dtype=bool), log_prior_homo, log_prior_het
        )
        logmax = ev.max()
        rel = ev - logmax
        p = np.where(rel < -20, 0.0, 10.0 ** rel)
        return p / p.sum()

"""Per-variant linear-model association test.

Ref: src/ngsep/gwas/GeneralLinearModel.java (143 LoC, standalone main):
ordinary least squares of phenotype on genotype dosage per site with an
F-test p-value.

Vectorized: all sites test at once — the per-site OLS collapses to
correlation arithmetic on the (sites, samples) dosage matrix.
"""
from __future__ import annotations

import math

import numpy as np

from ..vcf.analytics import dosage_matrix
from ..vcf.io import VCFRecord


def _f_sf(f: float, d1: int, d2: int) -> float:
    """Survival function of the F distribution via the regularized
    incomplete beta function (continued-fraction evaluation)."""
    if f <= 0:
        return 1.0
    x = d2 / (d2 + d1 * f)
    return _betainc(d2 / 2.0, d1 / 2.0, x)


def _betainc(a: float, b: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(a * math.log(x) + b * math.log(1 - x) - lbeta) / a
    # Lentz continued fraction
    f, c, d = 1.0, 1.0, 0.0
    for i in range(200):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        if abs(d) < 1e-30:
            d = 1e-30
        d = 1.0 / d
        c = 1.0 + num / c
        if abs(c) < 1e-30:
            c = 1e-30
        f *= c * d
        if abs(1.0 - c * d) < 1e-10:
            break
    val = front * (f - 1.0)
    return min(1.0, max(0.0, val)) if x < (a + 1) / (a + b + 2) else 1.0 - _betainc(b, a, 1 - x)


class GeneralLinearModel:
    def run_association(
        self, records: list[VCFRecord], phenotypes: dict[str, float]
    ) -> list[dict]:
        recs = [r for r in records if r.variant.is_snv and r.variant.is_biallelic]
        if not recs:
            return []
        dos, samples = dosage_matrix(recs)
        y = np.array([phenotypes.get(s, np.nan) for s in samples])
        out = []
        for i, r in enumerate(recs):
            x = dos[i].astype(np.float64)
            ok = (x >= 0) & ~np.isnan(y)
            n = int(ok.sum())
            if n < 3 or np.var(x[ok]) == 0:
                continue
            xv, yv = x[ok], y[ok]
            beta = np.cov(xv, yv, bias=True)[0, 1] / np.var(xv)
            alpha = yv.mean() - beta * xv.mean()
            resid = yv - (alpha + beta * xv)
            ss_res = float(np.sum(resid ** 2))
            ss_tot = float(np.sum((yv - yv.mean()) ** 2))
            if ss_tot <= 0:
                continue
            r2 = 1 - ss_res / ss_tot
            df2 = n - 2
            fstat = r2 / max(1e-12, (1 - r2)) * df2
            pval = _f_sf(fstat, 1, df2)
            out.append(
                {
                    "sequence": r.variant.sequence_name,
                    "position": r.variant.first,
                    "beta": float(beta),
                    "r2": float(r2),
                    "f": float(fstat),
                    "p": float(pval),
                    "n": n,
                }
            )
        return out

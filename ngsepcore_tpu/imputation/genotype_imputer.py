"""Genotype imputation with a haplotype-cluster HMM (fastPHASE family).

Ref: src/ngsep/variants/imputation/GenotypeImputer.java (command
`VCFImpute`; defaults k=8 haplotype clusters, window 5000 sites, overlap
50, avgCMPerKbp 0.001 at :52-55), GenotypeImputationHMM.java /
DiploidGenotypeImputationHMM.java (k^2 product states),
HaplotypeClusterHMMState.java:30-80 (emission 0.99/0.01 with GQ-scaled
success prob), RecombinationHMM.java:51-67 (per-interval switch
probability from physical distance), trained by Baum-Welch
(AbstractHMM.java Baum-Welch consts).

TPU redesign: one dense (samples, sites) dosage matrix per window; the
diploid product-state forward/backward runs vmapped across samples on
device (kernels/hmm.py); EM updates the cluster allele-frequency matrix
theta (sites, k) from batched posteriors — all matrix ops, no per-sample
object graphs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.hmm import posterior_log
from ..variants.model import CalledGenomicVariant
from ..vcf.io import VCFFileReader, VCFFileWriter, VCFRecord

DEF_NUM_HAPLOTYPE_CLUSTERS = 8  # ref: GenotypeImputer.java:52
DEF_WINDOW_SIZE = 5000  # ref :53
DEF_OVERLAP = 50  # ref :54
DEF_AVG_CM_PER_KBP = 0.001  # ref :55
GENO_ERROR = 0.01  # ref: HaplotypeClusterHMMState LOGPROB_UNEXPECTED=log10(0.01)


def _diploid_emissions(theta: jnp.ndarray, dosages: jnp.ndarray) -> jnp.ndarray:
    """log10 emission matrix for one sample.

    theta: (T, K) allele-1 frequency per cluster; dosages: (T,) int8 with
    0/1/2 and -1 for missing.  Returns (T, K*K) log10 emissions.
    """
    T, K = theta.shape
    t1 = theta[:, :, None]  # (T, K, 1)
    t2 = theta[:, None, :]  # (T, 1, K)
    p0 = (1 - t1) * (1 - t2)
    p1 = t1 * (1 - t2) + (1 - t1) * t2
    p2 = t1 * t2
    probs = jnp.stack([p0, p1, p2], axis=-1)  # (T, K, K, 3)
    # genotype observation error mixture
    e = GENO_ERROR
    obs = jnp.where(dosages < 0, 0, dosages)
    onehot = jax.nn.one_hot(obs, 3)  # (T, 3)
    lik = jnp.einsum("tkld,td->tkl", probs, onehot)
    lik = (1 - e) * lik + e / 3.0
    lik = jnp.where(dosages[:, None, None] < 0, 1.0, lik)
    return jnp.log10(lik).reshape(T, K * K)


def _transition_matrix(recomb_p: np.ndarray, K: int) -> np.ndarray:
    """Per-interval diploid transitions: kron of haploid switch models.

    Haploid: (1-p)·I + p/K (uniform jump; ref RecombinationHMM).
    """
    T1 = len(recomb_p)
    eye = np.eye(K)
    out = np.empty((T1, K * K, K * K))
    for t in range(T1):
        p = recomb_p[t]
        H = (1 - p) * eye + p / K
        out[t] = np.kron(H, H)
    with np.errstate(divide="ignore"):
        return np.log10(out)


@dataclass
class _WindowModel:
    theta: np.ndarray  # (T, K)
    log_start: np.ndarray
    log_trans: np.ndarray


class GenotypeImputer:
    def __init__(
        self,
        k: int = DEF_NUM_HAPLOTYPE_CLUSTERS,
        window_size: int = DEF_WINDOW_SIZE,
        overlap: int = DEF_OVERLAP,
        avg_cm_per_kbp: float = DEF_AVG_CM_PER_KBP,
        n_iterations: int = 10,
        seed: int = 1,
    ):
        self.k = k
        self.window_size = window_size
        self.overlap = overlap
        self.avg_cm_per_kbp = avg_cm_per_kbp
        self.n_iterations = n_iterations
        self.rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------
    def impute_matrix(
        self, dosages: np.ndarray, positions: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Impute a (samples, sites) dosage matrix (-1 = missing).

        Returns (imputed dosages, posterior probability of the chosen
        genotype).  Sites are processed in overlapping windows; overlap
        region keeps the later window's calls (ref streaming re-emit).
        """
        n, T = dosages.shape
        out = dosages.copy()
        conf = np.ones((n, T))
        step = self.window_size - self.overlap
        for w0 in range(0, T, step):
            w1 = min(T, w0 + self.window_size)
            di, ci = self._impute_window(dosages[:, w0:w1], positions[w0:w1])
            out[:, w0:w1] = di
            conf[:, w0:w1] = ci
            if w1 >= T:
                break
        return out, conf

    # ------------------------------------------------------------------
    def _impute_window(self, dosages: np.ndarray, positions: np.ndarray):
        n, T = dosages.shape
        K = self.k
        theta = np.clip(self.rng.uniform(0.05, 0.95, size=(T, K)), 1e-3, 1 - 1e-3)
        # initialize clusters near observed allele frequencies
        with np.errstate(invalid="ignore"):
            af = np.nanmean(np.where(dosages < 0, np.nan, dosages), axis=0) / 2.0
        af = np.nan_to_num(af, nan=0.5)
        theta = 0.5 * theta + 0.5 * af[:, None]
        # recombination probabilities from physical distance (ref :51-67)
        d_kbp = np.maximum(np.diff(positions), 1) / 1000.0
        d_morgans = self.avg_cm_per_kbp * d_kbp / 100.0
        recomb_p = np.clip(1.0 - np.exp(-d_morgans), 1e-6, 0.49)
        log_trans = _transition_matrix(recomb_p, K)
        log_start = np.full(K * K, -np.log10(K * K))

        dos_j = jnp.asarray(dosages)

        @jax.jit
        def e_step(theta_j):
            def per_sample(d):
                emit = _diploid_emissions(theta_j, d)
                post_log, ll = posterior_log(
                    jnp.asarray(log_start), jnp.asarray(log_trans), emit
                )
                return 10.0 ** post_log, ll

            post, lls = jax.vmap(per_sample)(dos_j)  # (n, T, K*K)
            return post, jnp.sum(lls)

        @jax.jit
        def m_step(post, theta_j):
            # expected allele-1 content per cluster slot: for state (k1,k2)
            # and genotype g, E[a1 | g, k1, k2] (symmetric for a2)
            pk = post.reshape(post.shape[0], post.shape[1], K, K)
            t1 = theta_j[:, :, None]  # (T, K, 1)
            t2 = theta_j[:, None, :]
            p_het = t1 * (1 - t2) + (1 - t1) * t2
            ea1_het = t1 * (1 - t2) / jnp.maximum(p_het, 1e-12)  # (T, K, K)
            d = dos_j  # (n, T)
            g0 = (d == 0)[:, :, None, None]
            g1 = (d == 1)[:, :, None, None]
            g2 = (d == 2)[:, :, None, None]
            miss = (d < 0)[:, :, None, None]
            ea1 = jnp.where(
                g2, 1.0, jnp.where(g1, ea1_het[None], jnp.where(miss, t1[None], 0.0))
            )
            ea2 = jnp.where(
                g2, 1.0,
                jnp.where(g1, 1.0 - ea1_het[None], jnp.where(miss, t2[None], 0.0)),
            )
            w = jnp.where(miss, 0.0, pk)  # missing sites don't update theta
            num = jnp.einsum("ntkl,ntkl->tk", w, ea1) + jnp.einsum(
                "ntkl,ntkl->tl", w, ea2
            )
            den = jnp.sum(w, axis=(0, 3)) + jnp.sum(w, axis=(0, 2))
            return jnp.clip(num / jnp.maximum(den, 1e-9), 1e-3, 1 - 1e-3)

        for _ in range(self.n_iterations):
            tj = jnp.asarray(theta)
            post, _ = e_step(tj)
            theta = np.asarray(m_step(post, tj))

        post, _ = e_step(jnp.asarray(theta))
        post = np.asarray(post)  # (n, T, K*K)
        # genotype posterior: P(g) = sum_states post * P(g|state)
        t1 = theta[:, :, None]
        t2 = theta[:, None, :]
        pg = np.stack(
            [(1 - t1) * (1 - t2), t1 * (1 - t2) + (1 - t1) * t2, t1 * t2], axis=-1
        ).reshape(T, K * K, 3)
        geno_post = np.einsum("nts,tsg->ntg", post, pg)
        best = np.argmax(geno_post, axis=2).astype(np.int8)
        best_p = np.take_along_axis(geno_post, best[:, :, None].astype(int), axis=2)[
            :, :, 0
        ]
        out = np.where(dosages < 0, best, dosages)
        return out, best_p

    # ------------------------------------------------------------------
    def run(self, input_vcf: str, output_prefix: str) -> None:
        """CLI surface: impute undecided genotypes of biallelic SNVs."""
        reader = VCFFileReader(input_vcf)
        records = reader.load_all()
        sample_ids = reader.sample_ids
        snv_idx = [
            i
            for i, r in enumerate(records)
            if r.variant.is_snv and r.variant.is_biallelic
        ]
        by_seq: dict[str, list[int]] = {}
        for i in snv_idx:
            by_seq.setdefault(records[i].variant.sequence_name, []).append(i)
        for seq, idxs in by_seq.items():
            T = len(idxs)
            n = len(sample_ids)
            dosages = np.full((n, T), -1, np.int8)
            positions = np.array([records[i].variant.first for i in idxs])
            for t, i in enumerate(idxs):
                for s, call in enumerate(records[i].calls):
                    if not call.is_undecided:
                        dosages[s, t] = sum(
                            1 for a in call.indexes_called_alleles if a == 1
                        ) * (2 // max(1, len(call.indexes_called_alleles)))
            imputed, conf = self.impute_matrix(dosages, positions)
            for t, i in enumerate(idxs):
                for s, call in enumerate(records[i].calls):
                    if call.is_undecided and dosages[s, t] < 0:
                        g = int(imputed[s, t])
                        call.indexes_called_alleles = (
                            [0, 0] if g == 0 else ([0, 1] if g == 1 else [1, 1])
                        )
                        from ..math.phred import phred_score

                        call.genotype_quality = phred_score(
                            max(0.0, 1.0 - float(conf[s, t]))
                        )
        with VCFFileWriter(output_prefix + "_imputed.vcf", sample_ids) as w:
            for r in records:
                w.write(r)

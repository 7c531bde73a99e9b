import numpy as np

from ngsepcore_tpu.imputation.genotype_imputer import GenotypeImputer


def _simulate_population(n_samples=40, n_sites=300, k_haps=4, seed=3):
    """Population from a small pool of founder haplotypes with recombination."""
    rng = np.random.default_rng(seed)
    founders = rng.integers(0, 2, size=(k_haps, n_sites)).astype(np.int8)
    positions = np.sort(rng.choice(10_000_000, size=n_sites, replace=False))

    def sample_haplotype():
        hap = np.empty(n_sites, np.int8)
        cur = rng.integers(0, k_haps)
        for t in range(n_sites):
            if rng.random() < 0.01:
                cur = rng.integers(0, k_haps)
            hap[t] = founders[cur, t]
        return hap

    genotypes = np.stack(
        [sample_haplotype() + sample_haplotype() for _ in range(n_samples)]
    ).astype(np.int8)
    return genotypes, positions


def test_imputation_recovers_masked_genotypes():
    genotypes, positions = _simulate_population()
    rng = np.random.default_rng(7)
    mask = rng.random(genotypes.shape) < 0.15
    observed = genotypes.copy()
    observed[mask] = -1
    imputer = GenotypeImputer(k=4, window_size=400, n_iterations=15, seed=2)
    imputed, conf = imputer.impute_matrix(observed, positions)
    assert not np.any(imputed < 0)
    acc = float(np.mean(imputed[mask] == genotypes[mask]))
    # mode baseline: always guessing the per-site major genotype
    baseline = 0.55
    assert acc > 0.9, f"imputation accuracy {acc}"
    assert acc > baseline


def test_imputation_vcf_roundtrip(tmp_path):
    from ngsepcore_tpu.variants.model import CalledGenomicVariant
    from ngsepcore_tpu.vcf.io import VCFFileReader, VCFFileWriter, VCFRecord

    genotypes, positions = _simulate_population(n_samples=10, n_sites=60)
    rng = np.random.default_rng(1)
    mask = rng.random(genotypes.shape) < 0.2
    p = str(tmp_path / "pop.vcf")
    samples = [f"s{i}" for i in range(genotypes.shape[0])]
    with VCFFileWriter(p, samples) as w:
        for t in range(genotypes.shape[1]):
            calls = []
            for s in range(genotypes.shape[0]):
                g = int(genotypes[s, t])
                idxs = [] if mask[s, t] else ([0, 0] if g == 0 else [0, 1] if g == 1 else [1, 1])
                calls.append(
                    CalledGenomicVariant(
                        sequence_name="chr1",
                        first=int(positions[t]),
                        alleles=["A", "C"],
                        sample_id=samples[s],
                        indexes_called_alleles=idxs,
                        genotype_quality=60,
                    )
                )
            calls_v = calls[0]
            rec = VCFRecord(variant=calls_v, calls=calls)
            w.write(rec)
    imputer = GenotypeImputer(k=4, window_size=100, n_iterations=8, seed=5)
    imputer.run(p, str(tmp_path / "out"))
    back = VCFFileReader(str(tmp_path / "out_imputed.vcf")).load_all()
    assert len(back) == genotypes.shape[1]
    n_undecided = sum(1 for r in back for c in r.calls if c.is_undecided)
    assert n_undecided == 0

"""Micro-bench of the two dominant kernels at bench shapes (not a test)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import QualifiedSequence, QualifiedSequenceList
    from ngsepcore_tpu.index.minimizer_table import MinimizerTable
    from ngsepcore_tpu.kernels.seeding import seed_cluster_screen

    rng = np.random.default_rng(0)
    L = 12_000_000
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=rng.integers(0, 4, size=L).astype(np.int8)))
    genome = ReferenceGenome(seqs)
    t0 = time.time()
    table = MinimizerTable.build_from_genome(genome)
    print(f"table build: {time.time()-t0:.2f}s")
    hk, vhi, vlo, ro, ep = table.device_arrays()
    gp, gn2 = genome.device_packed()

    B, Lp = 65536, 160
    codes = rng.integers(0, 4, size=(B, Lp)).astype(np.uint8)
    # fake packed code|qual
    pq = jax.device_put((codes | (25 << 3)).astype(np.uint8))
    lengths = jnp.full((B,), 150, jnp.int32)

    def run():
        return seed_cluster_screen(
            pq, lengths, hk, vhi, vlo, ro, ep, gp, gn2,
            k=15, window=10, genome_len=L,
        )

    r = run()
    jax.block_until_ready(r)
    t0 = time.time()
    N = 5
    for _ in range(N):
        r = run()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / N
    print(f"seed_cluster_screen B={B}: {dt*1000:.1f} ms -> {B/dt:.0f} reads/s")

    # genotype_window_span at typical shapes: window=2^20? check
    from ngsepcore_tpu.call.single_sample import _window_for
    from ngsepcore_tpu.kernels.genotyping import (
        META_COLS, genotype_window_span, snv_contribution_table,
    )

    W = _window_for(L)
    print(f"window={W}, n_windows={-(-L // W)}")
    # fused span: coverage ~ 300000*150/12e6 = 3.75x; reads per window ~ W*3.75/150
    F = 300000
    rows = 1 << 13
    pq2 = jax.device_put(rng.integers(0, 256, size=(F + rows, 160)).astype(np.uint8))
    meta = np.zeros((F + rows, META_COLS), np.int32)
    meta[:, 0] = np.sort(rng.integers(0, L, size=F + rows))
    meta[:, 4] = 150
    meta_d = jax.device_put(meta)
    contribution = snv_contribution_table()
    ref = rng.integers(0, 4, size=W).astype(np.int8)
    pk = np.full(1 << 16, -1, np.int32)
    het = np.float64(0.001)
    minq = np.int32(40)

    def run2(start):
        return genotype_window_span(
            pq2, meta_d, np.int32(start), np.int32(rows - 64), np.int32(0),
            pk, ref, contribution, het, minq, out_size=W, rows=rows,
        )

    r = run2(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(N):
        r = run2(i * 64)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / N
    n_win = -(-L // W)
    reads_per_win = rows - 64
    print(f"genotype_window_span rows={rows} W={W}: {dt*1000:.1f} ms"
          f" -> {reads_per_win/dt:.0f} reads/s; full genome ~{n_win*dt:.2f}s")


if __name__ == "__main__":
    main()

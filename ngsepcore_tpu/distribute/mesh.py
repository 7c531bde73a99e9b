"""Device-mesh distribution: data-parallel reads, replicated index,
psum-merged allele counts.

The reference's only parallelism is a single-JVM thread pool
(ref: src/ngsep/main/ThreadPoolManager.java:31-100; units = one read /
one chunk) with synchronized merges into shared maps
(ref: KmersExtractor.java:419-424).  Multi-node runs are shell scripts per
sample (ref: training/runMapping).

TPU-native design (SURVEY §2.14): one mesh axis `reads` — read batches are
sharded across devices, the reference index and genome windows are
replicated, and per-window allele-count tensors merge with `psum` before
genotyping, so the genotype posterior (and therefore VCF output) is
deterministic regardless of device count.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.genotyping import (
    MAX_BASE_QS,
    MIN_BASE_QS,
    N_QBINS,
    genotype_posteriors,
)
from ..kernels.pairwise import affine_gap_align_batch
from ..kernels.tier1 import tier1_stats


def make_reads_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("reads",))


def sharded_call_step(mesh: Mesh, window_size: int, contribution: np.ndarray):
    """Build the jitted data-parallel align+genotype step over `mesh`.

    Per shard: tier-1 ungapped screen + affine-gap DP scores for a read
    batch against its candidate windows, then scatter of the ungapped
    allele calls into this shard's (window, allele, qbin) count tensor.
    Counts merge across the `reads` axis with psum (the deterministic
    reduction replacing the reference's synchronized map updates); the
    genotype posterior then runs identically on every device.
    """
    contribution = jnp.asarray(contribution)

    def _shard_step(reads, qlens, subjects, slens, quals, win_off):
        # tier-1 screen + DP scores (the alignment compute)
        total_mm, clip_s, clip_e = tier1_stats(reads, qlens, subjects)
        dp = affine_gap_align_batch(
            reads, qlens, subjects, slens, free_start2=True, free_end2=True
        )
        # ungapped allele calls: read base b at window position win_off+i
        B, L = reads.shape
        pos = win_off[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        valid = (idx < qlens[:, None]) & (reads >= 0) & (reads < 4)
        q = jnp.clip(quals, 0, MAX_BASE_QS).astype(jnp.int32)
        ok = valid & (quals > MIN_BASE_QS) & (pos >= 0) & (pos < window_size)
        counts = jnp.zeros((window_size, 4, N_QBINS), jnp.int32)
        counts = counts.at[
            jnp.where(ok, pos, 0),
            jnp.where(valid, reads, 0).astype(jnp.int32),
            q,
        ].add(ok.astype(jnp.int32))
        # deterministic cross-device merge of allele counts
        counts = jax.lax.psum(counts, axis_name="reads")
        post, logcond = genotype_posteriors(counts, contribution)
        return dp["score"], total_mm, counts, post

    sharded = jax.shard_map(
        _shard_step,
        mesh=mesh,
        # the tier-1/DP scans carry non-varying initial state; skip the
        # varying-manual-axes check rather than pcast every carry
        check_vma=False,
        in_specs=(
            P("reads", None),  # read codes
            P("reads"),  # lengths
            P("reads", None),  # subject windows
            P("reads"),  # subject lengths
            P("reads", None),  # qualities
            P("reads"),  # window offsets
        ),
        out_specs=(
            P("reads"),  # DP scores stay sharded
            P("reads"),  # tier-1 mismatch counts stay sharded
            P(),  # merged counts replicated
            P(),  # posteriors replicated
        ),
    )
    return jax.jit(sharded)

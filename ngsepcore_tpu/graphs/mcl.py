"""Markov clustering (MCL) on dense similarity matrices.

Ref: src/ngsep/graphs/MCLJob.java:31-286 — expansion (matrix square) +
inflation (elementwise power, column renormalize) loop until convergence.
The expansion step is a matmul — MXU-shaped, run on device via jnp.
"""
from __future__ import annotations

import numpy as np


def mcl_cluster(
    similarity: np.ndarray,
    inflation: float = 2.0,
    max_iters: int = 100,
    tol: float = 1e-6,
    self_loops: float = 1.0,
) -> list[list[int]]:
    """Cluster nodes of a weighted graph; returns list of node-index lists."""
    import jax.numpy as jnp

    n = similarity.shape[0]
    if n == 0:
        return []
    M = jnp.asarray(similarity, jnp.float32)
    M = M + self_loops * jnp.eye(n, dtype=jnp.float32)
    M = M / jnp.maximum(M.sum(axis=0, keepdims=True), 1e-12)
    for _ in range(max_iters):
        expanded = M @ M
        inflated = expanded ** inflation
        new = inflated / jnp.maximum(inflated.sum(axis=0, keepdims=True), 1e-12)
        change = float(jnp.max(jnp.abs(new - M)))
        M = new
        if change < tol:
            break
    Mn = np.asarray(M)
    # attractors: rows with significant mass; cluster = attractor row support
    clusters: list[list[int]] = []
    assigned = np.full(n, -1)
    for i in range(n):
        members = np.nonzero(Mn[i] > 1e-4)[0]
        if len(members) == 0:
            continue
        free = [int(m) for m in members if assigned[m] < 0]
        if not free:
            continue
        cid = len(clusters)
        for m in free:
            assigned[m] = cid
        clusters.append(free)
    for i in range(n):
        if assigned[i] < 0:
            assigned[i] = len(clusters)
            clusters.append([i])
    return clusters

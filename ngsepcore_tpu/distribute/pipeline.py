"""Production align+call pipeline under a device mesh.

Ref: the reference's only scale-out is shell-level per-sample scripts
(training/runMapping:17-23); SURVEY §2.14 prescribes the TPU-native
replacement: ONE mesh axis `reads` — read batches sharded across devices,
the minimizer index and genome replicated, per-window allele-count tensors
merged with `psum` before genotyping, VCF record order defined by genome
position (windows are processed in genome order and the count merge is an
integer sum, so the emitted record list is IDENTICAL for any device count;
tests/test_distribute.py asserts this for n_devices in {1, 2, 8}).

This wraps the REAL `AlignCallPipeline` (call/fused_pipeline.py) — not a
demo step: seeding kernels run SPMD over row-sharded read batches, and the
window genotyper becomes a shard_map whose tier-1 pileup scatter is split
across devices and psum-merged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..call.fused_pipeline import AlignCallPipeline
from ..kernels.genotyping import (
    META_CE,
    META_CS,
    META_LEN,
    META_PRED,
    META_STRAND,
    N_COLS,
    _span_packed_scatter,
    _span_scatter_counts,
    _sparse_genotype_body_flat,
)
from .mesh import make_reads_mesh


def make_sharded_span_kernel(mesh: Mesh):
    """shard_map-wrapped window genotyper: each device scatters its shard
    of the window's read span into a local count tensor; `psum` over the
    `reads` axis merges them (the deterministic reduction replacing the
    reference's synchronized map updates, ThreadPoolManager.java:69-99);
    the screen+exact genotype math then runs replicated on the merged
    counts, so every device holds the identical per-site results.

    Same signature and semantics as kernels/genotyping.genotype_window_span.
    """
    D = mesh.devices.size

    @partial(
        jax.jit,
        static_argnames=("out_size", "rows", "n_alleles", "max_flag", "max_out"),
    )
    def kernel(
        pq, meta, start, count, w0, packed, ref_codes, contribution,
        het_rate, min_quality,
        *, out_size, rows, n_alleles=4, max_flag=1 << 12, max_out=1024,
    ):
        import jax.lax as lax

        sl = lax.dynamic_slice_in_dim(pq, start, rows, 0)
        mt = lax.dynamic_slice_in_dim(meta, start, rows, 0)
        shard_rows = rows // D

        def body(sl_s, mt_s, count_, w0_, packed_, ref_codes_, contrib_,
                 het_, minq_):
            ax = lax.axis_index("reads")
            counts128 = jnp.zeros((out_size, N_COLS), jnp.int32)
            strand_flat = jnp.zeros((out_size * 8,), jnp.int32)
            c = (sl_s & 7).astype(jnp.int8)
            q = (sl_s >> 3).astype(jnp.int8)
            # global row index: span validity (`count`) refers to rows of
            # the full slice, of which this shard holds rows
            # [ax*shard_rows, (ax+1)*shard_rows)
            gidx = ax * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
            keep = (gidx < count_).astype(jnp.int8)
            pred_rel = mt_s[:, META_PRED] - w0_
            counts128, strand_flat = _span_scatter_counts(
                counts128, strand_flat, c, q, mt_s[:, META_LEN], keep,
                pred_rel, mt_s[:, META_CS], mt_s[:, META_CE],
                mt_s[:, META_STRAND],
            )
            # host-path packed calls are scattered exactly once (shard 0)
            pk = jnp.where(ax == 0, packed_, -1)
            counts128, strand_flat = _span_packed_scatter(
                counts128, strand_flat, pk
            )
            counts128 = lax.psum(counts128, "reads")
            strand_flat = lax.psum(strand_flat, "reads")
            return _sparse_genotype_body_flat(
                counts128, strand_flat, ref_codes_, contrib_, het_, minq_,
                n_alleles, max_flag, max_out,
            )

        return jax.shard_map(
            body,
            mesh=mesh,
            check_vma=False,
            in_specs=(
                P("reads", None),  # span slice of packed reads
                P("reads", None),  # span slice of per-read metadata
                P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=P(),
        )(sl, mt, count, w0, packed, ref_codes, contribution,
          het_rate, min_quality)

    return kernel


class ShardedAlignCallPipeline(AlignCallPipeline):
    """`AlignCallPipeline` over a `jax.sharding.Mesh`.

    - read batches upload row-sharded along the `reads` axis, so the
      seeding/tier-1 kernels (kernels/seeding.py) compile SPMD and each
      device seeds its share of the reads;
    - the minimizer index and packed genome are replicated on every device;
    - window genotyping uses the psum-merged shard_map span kernel above;
    - everything else (host realignment path, record assembly, ordering)
      is byte-identical to the single-device pipeline, so the VCF output
      is invariant to the device count.
    """

    def __init__(
        self,
        genome,
        aligner=None,
        detector=None,
        batch_size: int = 32768,
        mesh: Mesh | None = None,
    ):
        super().__init__(
            genome, aligner=aligner, detector=detector, batch_size=batch_size
        )
        self.mesh = mesh if mesh is not None else make_reads_mesh()
        self._repl = NamedSharding(self.mesh, P())
        self._rows_sharded = NamedSharding(self.mesh, P("reads", None))
        # replicate the read-only index + genome across the mesh (the
        # reference replicates its FM-index per host the same way — one
        # copy per JVM; here one copy per device)
        self.aligner.table._device_arrays = tuple(
            jax.device_put(a, self._repl)
            for a in self.aligner.table.device_arrays()
        )
        self.genome._device_packed = tuple(
            jax.device_put(a, self._repl) for a in self.genome.device_packed()
        )
        self._span_kernel = make_sharded_span_kernel(self.mesh)

    # ---- sharding hooks -------------------------------------------------
    def _put_reads(self, pq: np.ndarray):
        return jax.device_put(pq, self._rows_sharded)

    def _device_put_repl(self, x):
        return jax.device_put(x, self._repl)

    def _genotype(self, batches, host):
        # the shear-histogram path is a single-device optimization; under a
        # mesh the span path runs with psum-merged counts
        return self._genotype_span(batches, host)

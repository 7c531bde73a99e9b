"""Production align+call pipeline under a device mesh.

Ref: the reference's only scale-out is shell-level per-sample scripts
(training/runMapping:17-23); SURVEY §2.14 prescribes the TPU-native
replacement: ONE mesh axis `reads` — read batches sharded across devices,
the minimizer index and genome replicated, window genotyping partitioned
across devices, VCF record order defined by genome position (windows are
processed in genome order and every per-position result is computed from
the identical read set, so the emitted record list is IDENTICAL for any
device count; tests/test_distribute.py asserts this for n_devices in
{1, 2, 8}).

Scaling design (round 4): the original span kernel scattered every
device's read shard into a FULL-window count tensor and psum-merged, so
the count-tensor zero-fill + scatter + collective cost grew linearly
with the device count and the post-merge genotype math ran replicated —
measured 2.02x total-work overhead at 2 virtual devices (SCALING_r03).
Genotyping is position-parallel, so the mesh now partitions the WINDOW
axis instead: reads are sorted by predicted start, each device
searchsorteds its chunk's read span out of the sorted pred column,
scatters only reads touching its window/D chunk into a (window/D, 128)
local tensor, genotypes its chunk, and the compacted per-chunk results
are merged on device in chunk order.  No collective touches the count
tensors at all — total work is independent of D (boundary reads within
one read length of a chunk edge are scattered by both neighbours, a
~coverage*Lp/chunk fraction).  Per-device work shrinks as 1/D for the
scatter, the genotype screen, and the count-tensor traffic alike.
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


def _pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def make_sharded_dp_run_all(mesh: Mesh):
    """Tier-3 DP sweep sharded along the JOBS axis: each device lax.maps
    its contiguous block of chunks against the REPLICATED read matrix +
    genome.  Without this, jnp.take from the row-sharded read upload
    all-gathers the whole matrix once per chunk under GSPMD (measured 4x
    tier-3 time at 4 virtual devices, and the n=8 rendezvous abort)."""
    from ..kernels.pairwise import (
        affine_gap_align_runs,
        dp_gather_inputs,
        dp_stats_runs,
    )

    D = mesh.devices.size

    @partial(jax.jit, static_argnames=("CH", "Lq", "Ls", "n_chunks"))
    def run(bigpq, lengths, concat, rows, strand, firsts, slen,
            *, CH, Lq, Ls, n_chunks):
        import jax.lax as lax

        nc = -(-n_chunks // D) * D
        pad = nc * CH - rows.shape[0]
        if pad:
            z = lambda a: jnp.concatenate(
                [a, jnp.zeros(pad, a.dtype)]
            )
            rows, strand, firsts, slen = z(rows), z(strand), z(firsts), z(slen)
        local = nc // D

        def body(bigpq_, lengths_, concat_, r_, s_, f_, sl_):
            def one(off):
                r = lax.dynamic_slice_in_dim(r_, off, CH, 0)
                st = lax.dynamic_slice_in_dim(s_, off, CH, 0)
                f = lax.dynamic_slice_in_dim(f_, off, CH, 0)
                sln = lax.dynamic_slice_in_dim(sl_, off, CH, 0)
                qc, ln, sc = dp_gather_inputs(
                    bigpq_, lengths_, concat_, r, st, f, sln, Lq=Lq, Ls=Ls
                )
                out = affine_gap_align_runs(
                    qc, ln, sc, sln, free_start2=True, free_end2=True
                )
                return dp_stats_runs(out, qc, sc)

            offs = jnp.arange(local, dtype=jnp.int32) * CH
            return lax.map(one, offs)

        return jax.shard_map(
            body,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(), P(), P(), P("reads"), P("reads"), P("reads"),
                      P("reads")),
            out_specs=P("reads"),
        )(bigpq, lengths, concat, rows, strand, firsts, slen)

    return run


def make_sharded_span_kernel(mesh: Mesh):
    """shard_map-wrapped window genotyper partitioned along the WINDOW
    axis (see module docstring).  Same signature and semantics as
    kernels/genotyping.genotype_window_span; the extra `span_overflow`
    output reports a device whose chunk's read span exceeded the static
    per-device row budget (resolve falls back to the unsharded kernel for
    that window — never observed on read-coverage-uniform data, the
    budget is 2x the even share)."""
    D = mesh.devices.size

    @partial(
        jax.jit,
        static_argnames=(
            "out_size", "rows", "n_alleles", "max_flag", "max_out",
            "exact_f64",
        ),
    )
    def kernel(
        pq, meta, start, count, w0, packed, ref_codes, contribution,
        het_rate, min_quality,
        *, out_size, rows, n_alleles=4, max_flag=1 << 12, max_out=1024,
        exact_f64=False,
    ):
        import jax.lax as lax

        chunk = out_size // D
        rows_shard = min(rows, max(256, _pow2(2 * rows // D)))
        Lp = pq.shape[1]
        # sorted pred column over this window's full candidate span: the
        # only O(rows) object each device touches is this 1-int column
        pred_win = lax.dynamic_slice_in_dim(
            meta[:, META_PRED], start, rows, 0
        )

        def body(pred_win_, start_, count_, w0_, packed_, ref_codes_,
                 contrib_, het_, minq_, pq_, meta_):
            ax = lax.axis_index("reads")
            w0d = w0_ + ax * chunk
            big = jnp.int32(2**31 - 1)
            pw = jnp.where(
                jnp.arange(rows, dtype=jnp.int32) < count_, pred_win_, big
            )
            lo = jnp.searchsorted(pw, w0d - Lp, side="left").astype(jnp.int32)
            hi = jnp.searchsorted(
                pw, w0d + chunk, side="left"
            ).astype(jnp.int32)
            cnt_d = hi - lo
            overflow = (cnt_d > rows_shard).astype(jnp.int32)
            start_d = start_ + lo
            sl = lax.dynamic_slice_in_dim(pq_, start_d, rows_shard, 0)
            mt = lax.dynamic_slice_in_dim(meta_, start_d, rows_shard, 0)
            counts128 = jnp.zeros((chunk, N_COLS), jnp.int32)
            strand_flat = jnp.zeros((chunk * 8,), jnp.int32)
            c = (sl & 7).astype(jnp.int8)
            q = (sl >> 3).astype(jnp.int8)
            keep = (
                jnp.arange(rows_shard, dtype=jnp.int32)
                < jnp.minimum(cnt_d, rows_shard)
            ).astype(jnp.int8)
            pred_rel = mt[:, META_PRED] - w0d
            counts128, strand_flat = _span_scatter_counts(
                counts128, strand_flat, c, q, mt[:, META_LEN], keep,
                pred_rel, mt[:, META_CS], mt[:, META_CE],
                mt[:, META_STRAND],
            )
            # host-path packed calls of this chunk, rebased to chunk-local
            # positions (pos lives in the low 20 bits; rel-ax*chunk never
            # borrows into the flag bits)
            rel = packed_ & 0xFFFFF
            mine = (
                (packed_ >= 0)
                & (rel >= ax * chunk)
                & (rel < (ax + 1) * chunk)
            )
            pk = jnp.where(mine, packed_ - ax * chunk, -1)
            counts128, strand_flat = _span_packed_scatter(
                counts128, strand_flat, pk
            )
            ref_d = lax.dynamic_slice_in_dim(ref_codes_, ax * chunk, chunk, 0)
            res = _sparse_genotype_body_flat(
                counts128, strand_flat, ref_d, contrib_, het_, minq_,
                n_alleles, max_flag, max_out, exact_f64,
            )
            # chunk-local site positions -> window positions
            res["site_idx"] = res["site_idx"] + ax * chunk
            res["span_overflow"] = overflow
            return jax.tree.map(lambda x: jnp.asarray(x)[None], res)

        g = jax.shard_map(
            body,
            mesh=mesh,
            check_vma=False,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P("reads"),
        )(pred_win, start, count, w0, packed, ref_codes, contribution,
          het_rate, min_quality, pq, meta)

        # ---- merge per-chunk compactions in chunk (= position) order ----
        n_d = g["n_sites"].astype(jnp.int32)  # (D,)
        off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(n_d)[:-1].astype(jnp.int32)]
        )
        slot = jnp.arange(max_out, dtype=jnp.int32)[None, :]
        tgt = off[:, None] + slot
        ok = (slot < n_d[:, None]) & (tgt < max_out)
        tgt = jnp.where(ok, tgt, max_out).reshape(-1)

        def merge(field):
            f = field.reshape((D * max_out,) + field.shape[2:])
            out = jnp.zeros(
                (max_out + 1,) + field.shape[2:], field.dtype
            )
            return out.at[tgt].set(f)[:max_out]

        merged = {
            k: merge(g[k])
            for k in (
                "site_idx", "bi", "bj", "gq", "ref_prob", "depths",
                "total", "logcond", "strand_counts",
            )
        }
        merged["n_sites"] = jnp.sum(n_d)
        merged["n_flagged"] = jnp.max(g["n_flagged"])
        merged["span_overflow"] = jnp.max(g["span_overflow"])
        return merged

    return kernel


class ShardedAlignCallPipeline(AlignCallPipeline):
    """`AlignCallPipeline` over a `jax.sharding.Mesh`.

    - read batches upload row-sharded along the `reads` axis, so the
      seeding/tier-1 kernels (kernels/seeding.py) compile SPMD and each
      device seeds its share of the reads;
    - the minimizer index and packed genome are replicated on every device;
    - window genotyping partitions the window axis across devices with
      the kernel above (per-device work ~1/D, no count-tensor
      collectives);
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
        self.aligner.dp_run_all_fn = make_sharded_dp_run_all(self.mesh)

    # ---- sharding hooks -------------------------------------------------
    def _put_reads(self, pq: np.ndarray):
        return jax.device_put(pq, self._rows_sharded)

    def _device_put_repl(self, x):
        return jax.device_put(x, self._repl)

    def _prepare_tier3_arrays(self, bigpq, lengths_dev):
        # the DP job shards gather arbitrary read rows: both operands must
        # be replicated (one resharding collective here instead of one
        # all-gather per DP chunk)
        return (
            jax.device_put(bigpq, self._repl),
            jax.device_put(lengths_dev, self._repl),
        )

    def _genotype(self, batches, host):
        # the shear-histogram path is a single-device optimization; under a
        # mesh the span path runs with the window-partitioned kernel
        return self._genotype_span(batches, host)

"""Isolate genotype_window_span cost components (not a test)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from ngsepcore_tpu.kernels.genotyping import (
        META_COLS, genotype_window_span, snv_contribution_table,
    )

    rng = np.random.default_rng(0)
    W = 1 << 20
    F = 300000
    contribution = snv_contribution_table()
    ref = rng.integers(0, 4, size=W).astype(np.int8)
    het = np.float64(0.001)
    minq = np.int32(40)

    for rows in (256, 8192, 32768):
        pq2 = jax.device_put(
            rng.integers(0, 256, size=(F + rows, 160)).astype(np.uint8)
        )
        meta = np.zeros((F + rows, META_COLS), np.int32)
        meta[:, 0] = np.sort(rng.integers(0, W, size=F + rows))
        meta[:, 4] = 150
        meta_d = jax.device_put(meta)
        for pk_n in (1, 1 << 16):
            pk = np.full(pk_n << 0, -1, np.int32)

            def run(start):
                return genotype_window_span(
                    pq2, meta_d, np.int32(start), np.int32(rows - 64),
                    np.int32(0), pk, ref, contribution, het, minq,
                    out_size=W, rows=rows,
                )

            r = run(0)
            jax.block_until_ready(r)
            N = 5
            t0 = time.time()
            for i in range(N):
                r = run(i * 8)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / N
            print(f"rows={rows:6d} pk={pk_n:6d}: {dt*1000:7.1f} ms")


if __name__ == "__main__":
    main()

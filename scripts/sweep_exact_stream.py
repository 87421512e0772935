#!/usr/bin/env python
"""Tile/query-block sweep for the streaming exact kernel on real TPU,
one process (dataset + compile cache shared across configs).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_exact_stream.py
"""

from __future__ import annotations

import itertools
import time


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = 1_000_000, 128, 1000, 10
    kp, kq = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    fence([X, Y])

    def timeit(name, fn, reps=5):
        out = fn()
        fence(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:36s} {dt*1e3:9.2f} ms  {m/dt:10.0f} QPS", flush=True)

    timeit("grid default", lambda: exact_knn_pallas(X, Y, k, stream=False))
    for qb, t in itertools.product((1024, 512, 256), (4096, 8192, 16384)):
        try:
            timeit(
                f"stream qb={qb} tile={t}",
                lambda qb=qb, t=t: exact_knn_pallas(
                    X, Y, k, stream=True, tile=t, query_block=qb
                ),
            )
        except Exception as e:  # Mosaic/VMEM limits at fat configs
            print(f"stream qb={qb} tile={t} FAILED: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Small-n exact-kernel check: 20k x 128, tile/block sweep.

bench.py's exact_qps at the headline config moved 437k -> ~290k across the
while-merge + pn-hoist changes; this isolates where it went."""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = 20_000, 128, 1000, 10
    kp, kq = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    fence([X, Y])

    def timeit(name, fn, reps=30):
        out = fn()
        fence(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.3f} ms  {m/dt:10.0f} QPS", flush=True)

    for tile in (2048, 4096, 8192):
        for bq in (256, 512, 1024):
            timeit(
                f"tile={tile} bq={bq}",
                lambda tile=tile, bq=bq: exact_knn_pallas(
                    X, Y, k, tile=tile, query_block=bq
                ),
            )


if __name__ == "__main__":
    main()

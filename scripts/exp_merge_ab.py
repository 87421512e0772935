#!/usr/bin/env python
"""A/B the rank-select segmented merge against the rescan merge.

Attribution background (scripts/exp_exact_attrib.py, /tmp/attrib1m.log):
the grid kernel's per-step floor (DMA + matmul + distance + min sweep) is
~12 us while production ran 64 us/step at 1M — ~80% of kernel time was the
rescan top-k merge (data-dependent rounds of block-sized extract +
rewrite).  The rank merge extracts n_seg per-segment minima per round and
folds them in with counting-rank selection (ops stay block-sized and few).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_merge_ab.py
"""

from __future__ import annotations

import argparse
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--big", action="store_true", help="include 10M x 96")
    ap.add_argument("--skip-rescan", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    def timeit(name, fn, reps, steps=None):
        out = fn()
        fence([out])
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        per = f"  {dt / steps * 1e6:8.1f} us/step" if steps else ""
        qps = 1000.0 / dt
        print(f"{name:46s} {dt * 1e3:9.3f} ms{per}  {qps:10.0f} QPS",
              flush=True)
        return dt

    m, k = 1000, 10
    styles = ("rank",) if args.skip_rescan else ("rank", "rescan")
    for n, d in ((20_000, 128), (200_000, 128), (1_000_000, 128)):
        kp, kq = jax.random.split(jax.random.PRNGKey(0))
        X = jax.random.normal(kp, (n, d), jnp.float32)
        Y = jax.random.normal(kq, (m, d), jnp.float32)
        fence([X, Y])
        if not args.skip_rescan:
            ia, da = exact_knn_pallas(X, Y, k, merge="rank")
            ib, db = exact_knn_pallas(X, Y, k, merge="rescan")
            same = float(jnp.mean((ia == ib).astype(jnp.float32)))
            print(f"n={n}: rank-vs-rescan id agreement {same:.5f}",
                  flush=True)
            assert same > 0.999, same
        tile = 8192 if n >= (1 << 19) else min(4096, n)
        bq = 512 if n >= (1 << 19) else 256
        steps = math.ceil(m / bq) * math.ceil(n / tile)
        for st in styles:
            timeit(f"exact {st} n={n}",
                   lambda X=X, Y=Y, st=st: exact_knn_pallas(X, Y, k, merge=st),
                   args.reps, steps=steps)
        if n == 1_000_000:
            for bq_ in (256, 512, 1024):
                steps = math.ceil(m / bq_) * math.ceil(n / 8192)
                try:
                    timeit(f"rank 1M tile=8192 bq={bq_}",
                           lambda b=bq_: exact_knn_pallas(
                               X, Y, k, tile=8192, query_block=b),
                           args.reps, steps=steps)
                except Exception as e:
                    print(f"bq={bq_}: FAIL {type(e).__name__}: "
                          f"{str(e)[:100]}", flush=True)
            timeit("rank 1M k=100",
                   lambda: exact_knn_pallas(X, Y, 100),
                   max(args.reps // 2, 5))
            Xb = X.astype(jnp.bfloat16)
            fence([Xb])
            timeit("rank 1M bf16-stored",
                   lambda: exact_knn_pallas(Xb, Y, k), args.reps)
        del X, Y

    if args.big:
        n, d = 10_000_000, 96
        X = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
        Y = jax.random.normal(jax.random.PRNGKey(2), (m, d), jnp.float32)
        fence([X, Y])
        steps = math.ceil(m / 512) * math.ceil(n / 8192)
        for st in styles:
            timeit(f"exact {st} 10M x 96",
                   lambda st=st: exact_knn_pallas(X, Y, k, merge=st),
                   max(args.reps // 2, 5), steps=steps)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B: streaming exact kernel (in-kernel double-buffered corpus DMA)
vs the block-pipelined grid kernel, on real TPU.

Rule 11 (CLAUDE.md): grid steps cost ~tens of us each on this runtime.
The grid kernel pays nq_blocks x n_tiles steps; the streaming kernel
pays nq_blocks steps and loops the corpus tiles inside the kernel, so
at 1M x 128 (246 steps -> 2) most of the measured 20.6 ms should be
overhead it no longer pays.  Also validates result parity on-TPU (the
offset-divisibility rules only bite on real Mosaic compiles, rule 14).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_exact_stream.py [--n N] [--d D] [--dtype f32|bf16|int8]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16", "int8"])
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--query-block", type=int, default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-grid", action="store_true",
                    help="only run the streaming kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from approximatenn_tpu.ops.pallas_exact import (
        exact_knn_pallas,
        quantize_corpus,
    )
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = args.n, args.d, args.m, args.k
    key = jax.random.PRNGKey(0)
    kp, kq = jax.random.split(key)
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    fence([X, Y])
    kw = {}
    if args.dtype == "bf16":
        X = X.astype(jnp.bfloat16)
        fence([X])
    elif args.dtype == "int8":
        X, scale = quantize_corpus(X)
        kw["scale"] = scale
        fence([X])
    if args.tile:
        kw["tile"] = args.tile
    if args.query_block:
        kw["query_block"] = args.query_block
    print(f"n={n} d={d} m={m} k={k} dtype={args.dtype} kw={kw}", flush=True)

    def timeit(name, fn, reps=args.reps):
        out = fn()
        fence(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.2f} ms  {m/dt:10.0f} QPS", flush=True)
        return out, dt

    (istream, dstream), t_s = timeit(
        "stream", lambda: exact_knn_pallas(X, Y, k, stream=True, **kw)
    )
    if not args.skip_grid:
        (igrid, dgrid), t_g = timeit(
            "grid", lambda: exact_knn_pallas(X, Y, k, stream=False, **kw)
        )
        a, b = np.asarray(istream), np.asarray(igrid)
        same = np.mean([
            len(set(r) & set(s)) / k for r, s in zip(a.tolist(), b.tolist())
        ])
        print(f"stream-vs-grid overlap: {same:.4f}  speedup: {t_g/t_s:.2f}x",
              flush=True)
        if same < 1.0:
            da, db = np.asarray(dstream), np.asarray(dgrid)
            print(f"  max |dd| diff: {np.max(np.abs(da - db)):.3e}", flush=True)


if __name__ == "__main__":
    main()

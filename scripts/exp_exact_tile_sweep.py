#!/usr/bin/env python
"""Tile / query-block sweep of the exact Pallas kernel at scale.

Motivated by the int8 bench anomaly: 24M x 96 int8 ran at the SAME
86 ms/batch as 10M (BASELINE.md int8 section) — per-grid-step overhead
can't explain that (2.4x the steps at equal tile), so something else
bounds the kernel at scale.  This measures ms/batch across (tile,
query_block) at several (n, dtype) operating points to find the binding
constraint and better defaults.

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u \
    scripts/exp_exact_tile_sweep.py > /tmp/tile_sweep.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    import approximatenn_tpu as ann
    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    d, nq, k = args.d, args.nq, args.k
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))

    def synth_int8(n, chunk=8_000_000):
        parts = []
        key = jax.random.PRNGKey(1)
        done = 0
        while done < n:
            m = min(chunk, n - done)
            key, sub = jax.random.split(key)
            x = jax.random.normal(sub, (m, d), jnp.float32)
            q = jnp.clip(jnp.round(x * (127 / 4.5)), -127, 127).astype(jnp.int8)
            fence([q])
            del x
            parts.append(q)
            done += m
        out = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        fence([out])
        return out, jnp.asarray(4.5 / 127, jnp.float32)

    def bench(label, fn):
        try:
            out = fn()
            fence(out)
        except Exception as e:
            print(json.dumps({"config": label, "error": repr(e)[:160]}),
                  flush=True)
            return
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"config": label, "ms": round(dt * 1e3, 2),
                          "qps": round(nq / dt, 1)}), flush=True)

    # --- int8 at 10M and 24M ---
    for n in (10_000_000, 24_000_000):
        Xq, scale = synth_int8(n)
        for tile in (8192, 16384, 32768):
            for bq in (512, 1024):
                bench(f"int8 n={n} tile={tile} bq={bq}",
                      lambda t=tile, b=bq: exact_knn_pallas(
                          Xq, Y, k, tile=t, query_block=b, scale=scale))
        del Xq

    # --- f32 at 1M and 10M ---
    for n in (1_000_000, 10_000_000):
        key = jax.random.PRNGKey(2)
        X = jax.random.normal(key, (n, d), jnp.float32)
        fence([X])
        for tile in (8192, 16384):
            for bq in (512, 1024):
                bench(f"f32 n={n} tile={tile} bq={bq}",
                      lambda t=tile, b=bq: exact_knn_pallas(
                          X, Y, k, tile=t, query_block=b))
        del X


if __name__ == "__main__":
    main()

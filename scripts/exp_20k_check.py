#!/usr/bin/env python
"""Interleaved rank-vs-rescan timing at the headline size (20k x 128):
alternating measurement rounds cancel tunnel/load drift.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_20k_check.py
"""
import time

import jax
import jax.numpy as jnp

from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
from approximatenn_tpu.utils.profiling import fence

kp, kq = jax.random.split(jax.random.PRNGKey(0))
X = jax.random.normal(kp, (20_000, 128), jnp.float32)
Y = jax.random.normal(kq, (1000, 128), jnp.float32)
fence([X, Y])

fns = {
    "rank": lambda: exact_knn_pallas(X, Y, 10, merge="rank"),
    "rescan": lambda: exact_knn_pallas(X, Y, 10, merge="rescan"),
}
for name, fn in fns.items():
    fence([fn()])  # compile

acc = {name: [] for name in fns}
for rnd in range(6):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        outs = [fn() for _ in range(30)]
        fence(outs)
        acc[name].append((time.perf_counter() - t0) / 30)
for name, ts in acc.items():
    ms = [t * 1e3 for t in ts]
    print(f"{name:8s} min {min(ms):.3f} ms  median {sorted(ms)[len(ms)//2]:.3f}"
          f"  rounds {['%.2f' % v for v in ms]}", flush=True)

#!/usr/bin/env python
"""Refresh the 10M exact-tier numbers (f32 / bf16-stored / int8) with the
rank-select merge kernel.  iid Gaussian 10M x 96, m=1000, k=10.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_tiers_10m.py
"""
import time

import jax
import jax.numpy as jnp

from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    quantize_corpus,
)
from approximatenn_tpu.utils.profiling import fence


def timeit(name, fn, reps=10):
    out = fn()
    fence([out])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    fence(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt * 1e3:9.3f} ms  {1000.0 / dt:10.0f} QPS",
          flush=True)
    return dt


n, d, m, k = 10_000_000, 96, 1000, 10
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])

i_f32, _ = exact_knn_pallas(X, Y, k)
fence([i_f32])
timeit("exact f32 10M x 96", lambda: exact_knn_pallas(X, Y, k))

Xb = X.astype(jnp.bfloat16)
fence([Xb])
ib, _ = exact_knn_pallas(Xb, Y, k)
rec_b = float(jnp.mean(jnp.any(
    ib[:, :, None] == i_f32[:, None, :], axis=-1).astype(jnp.float32)))
print(f"bf16 recall vs f32: {rec_b:.4f}", flush=True)
timeit("exact bf16-stored 10M x 96", lambda: exact_knn_pallas(Xb, Y, k))
del Xb
fence([X])

Xq, scale = quantize_corpus(X)
fence([Xq])
iq, _ = exact_knn_pallas(Xq, Y, k, scale=scale)
rec_q = float(jnp.mean(jnp.any(
    iq[:, :, None] == i_f32[:, None, :], axis=-1).astype(jnp.float32)))
print(f"int8 recall vs f32: {rec_q:.4f}", flush=True)
timeit("exact int8 10M x 96",
       lambda: exact_knn_pallas(Xq, Y, k, scale=scale))

#!/usr/bin/env python
"""Tile sweep for the int8 exact tier at 10M/32M — storage is 4x smaller
per row, so the step count (not VMEM) is the binding constraint; bigger
tiles halve the grid.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_int8_tiles.py
"""
import math
import time

import jax
import jax.numpy as jnp

from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    quantize_corpus,
)
from approximatenn_tpu.utils.profiling import fence


def timeit(name, fn, reps=10, steps=None):
    out = fn()
    fence([out])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    fence(outs)
    dt = (time.perf_counter() - t0) / reps
    per = f"  {dt / steps * 1e6:7.1f} us/step" if steps else ""
    print(f"{name:40s} {dt * 1e3:9.3f} ms{per}  {1000.0 / dt:9.0f} QPS",
          flush=True)


n, d, m, k = 10_000_000, 96, 1000, 10
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])
Xq, scale = quantize_corpus(X)
Xb = X.astype(jnp.bfloat16)
fence([Xq, Xb])
del X
for tile in (8192, 16384, 32768):
    for bq in (128, 256):
        steps = math.ceil(m / bq) * math.ceil(n / tile)
        try:
            timeit(f"int8 10M tile={tile} bq={bq}",
                   lambda t=tile, b=bq: exact_knn_pallas(
                       Xq, Y, k, scale=scale, tile=t, query_block=b),
                   steps=steps)
        except Exception as e:
            print(f"int8 tile={tile} bq={bq}: FAIL {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)
for tile in (16384,):
    for bq in (256,):
        steps = math.ceil(m / bq) * math.ceil(n / tile)
        try:
            timeit(f"bf16 10M tile={tile} bq={bq}",
                   lambda t=tile, b=bq: exact_knn_pallas(
                       Xb, Y, k, tile=t, query_block=b),
                   steps=steps)
        except Exception as e:
            print(f"bf16 tile={tile} bq={bq}: FAIL {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)

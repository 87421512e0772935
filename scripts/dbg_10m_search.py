#!/usr/bin/env python
"""Reproduce the 10M-search OOM with a shape-identical random index (no
23-min build needed): tables/graph content doesn't change the memory
profile of the query program."""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import approximatenn_tpu as ann
from approximatenn_tpu.index import ANNIndex
from approximatenn_tpu.utils.profiling import fence

n, d, k, tries, d_short, tmax = 10_000_000, 96, 10, 10, 20, 64
nb = 1 << d_short

key = jax.random.PRNGKey(0)
kx, kt, kg, kq, kb = jax.random.split(key, 5)
X = jax.random.normal(kx, (n, d), jnp.float32)
fence([X])
tables = jax.random.randint(kt, (tries, nb, tmax), 0, n + 1, jnp.int32)
fence([tables])
graph = jax.random.randint(kg, (n, k), 0, n, jnp.int32)
fence([graph])
Y = jax.random.normal(kq, (1000, d), jnp.float32)
bases = jax.random.normal(kb, (tries, d_short, d), jnp.float32)
counts = jnp.full((tries, nb), 10, jnp.int32)
row_means = jnp.zeros((d,), jnp.float32)
idx = ANNIndex(row_means=row_means, bases=bases, tables=tables,
               counts=counts, graph=graph, n=n, k=k, d=d, d_short=d_short,
               tries=tries, tmax=tmax, points=None, metric="l2")


def dump_live(tag):
    tot = sum(a.size * a.dtype.itemsize for a in jax.live_arrays())
    print(json.dumps({"tag": tag, "live_gb": round(tot / 2**30, 2)}),
          flush=True)


dump_live("setup")
try:
    t0 = time.perf_counter()
    ids, dd = ann.search(idx, X, Y)
    fence([ids])
    print(json.dumps({"blind": "ok", "s": round(time.perf_counter() - t0, 1)}),
          flush=True)
except Exception as e:
    print("BLIND FAILED:", repr(e)[:200], flush=True)
    dump_live("fail")

for P in (18,):
    try:
        t0 = time.perf_counter()
        ids, dd = ann.search(idx, X, Y, n_probes=P)
        fence([ids])
        print(json.dumps({"directed": P,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    except Exception as e:
        print(f"DIRECTED {P} FAILED:", repr(e)[:200], flush=True)
        dump_live("fail")

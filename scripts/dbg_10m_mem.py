#!/usr/bin/env python
"""Debug the 10M hash-build OOM: reproduce and dump live device buffers."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import approximatenn_tpu as ann
from approximatenn_tpu.utils.profiling import fence

import os
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import sys
sys.path.insert(0, os.path.dirname(__file__))
from exp_10m_hash import synth_clustered


def dump_live(tag):
    tot = 0
    by_shape = {}
    for a in jax.live_arrays():
        b = a.size * a.dtype.itemsize
        tot += b
        key = f"{a.shape}/{a.dtype}"
        by_shape[key] = by_shape.get(key, 0) + b
    big = sorted(by_shape.items(), key=lambda kv: -kv[1])[:12]
    print(json.dumps({"tag": tag, "live_gb": round(tot / 2**30, 2),
                      "top": [[k, round(v / 2**30, 3)] for k, v in big]}),
          flush=True)


n, d, nq, k = 10_000_000, 96, 1000, 10
t0 = time.perf_counter()
X, Y = synth_clustered(n, d, nq)
fence([X, Y])
dump_live("after synth")

tq, tqd = ann.exact_search(X, Y, k)
tq = np.asarray(tq)
del tqd
dump_live("after groundtruth")

try:
    index, graph, gd = ann.build(X, k, tries=10, seed=7, capacity=64)
    fence([graph])
    dump_live("after build")
except Exception as e:
    print("BUILD FAILED:", repr(e)[:300], flush=True)
    dump_live("at failure")
    raise

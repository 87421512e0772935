#!/usr/bin/env python
"""Record a ShardedServer tuning artifact on the virtual CPU mesh
(round-5, VERDICT item 1's "wire tune() to it" done-criterion): every
trial dispatches through ShardedServer.search on an 8-device mesh —
engine routing, collectives, interpret-mode kernels — and the report is
written to baselines/tune_sharded_r5.json.

Usage:
    python scripts/record_tune_sharded.py          # CPU mesh, proxy mode
"""
import json
import os
import sys

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from approximatenn_tpu.parallel.serving import tune_sharded  # noqa: E402
from approximatenn_tpu.parallel.sharded import make_mesh  # noqa: E402


def main():
    mesh = make_mesh(8)
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((50, 32)).astype(np.float32) * 3
    X = (centers[rng.integers(0, 50, 20_000)]
         + rng.standard_normal((20_000, 32)).astype(np.float32))
    rep = tune_sharded(
        X, 10, mesh=mesh, n_queries=64, target_recall=0.9,
        probe_grid=(None, 12), window_grid=(16, 48),
        rerank_grid=(None, 30), exact_tiers=(None, "bf16"),
        tries=4, capacity=64, seed=3, verbose=True,
    )
    d = rep.as_dict()
    d["mesh_devices"] = 8
    d["platform"] = "cpu-mesh (proxy ranking; QPS fields null by design)"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baselines", "tune_sharded_r5.json")
    with open(out, "w") as f:
        json.dump(d, f, indent=1)
    print(json.dumps(d["best"]))
    srv = rep.server()
    print("winner describe:", srv.describe())
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""int8 fused-probe compile + perf check at the bq=32 default (real TPU).

The query-tile default moved 16 -> 32 after the bf16/f32 attribution
sweeps (scripts/exp_probe_attrib.py); int8 rows compile through a
different Mosaic config ((32,128) tiling, align=32, f32 query block with
int8 window scratch), so its bq=32 compile must be proven on real TPU
separately — Mosaic compile failures are config-specific and interpret
mode does not catch them (CLAUDE.md rule 14).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_probe_int8_bq.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_probe import probe_topk_pallas

tries, d, k = 10, 128, 10
n_pad = 1 << 20
n = n_pad - 100
m = 1000
reps = 10

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
pts8 = jax.random.randint(key, (tries * n_pad, d), -127, 128, jnp.int8)
qs = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)


def fence(out):
    return float(jnp.sum(out[0][:4, 0, 0].astype(jnp.float32)))


for P, w in [(18, 32), (48, 96), (18, 96)]:
    for bq in (16, 32):
        starts = jnp.asarray(
            rng.integers(0, n_pad - 2 * w, size=(m, tries, P)), jnp.int32
        )
        f = lambda: probe_topk_pallas(
            pts8, qs, starts, k=k, n=n, n_pad=n_pad, window=w, query_block=bq
        )
        try:
            fence(f())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [f() for _ in range(reps)]
                fence(outs[-1])
                best = min(best, (time.perf_counter() - t0) / reps)
            print(json.dumps({
                "dtype": "int8", "P": P, "w": w, "bq": bq,
                "ms_per_batch": round(best * 1e3, 2),
                "qps": round(m / best, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "dtype": "int8", "P": P, "w": w, "bq": bq,
                "error": str(e)[:200],
            }), flush=True)

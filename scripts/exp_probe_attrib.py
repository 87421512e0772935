"""Fused probe kernel cost attribution (real TPU).

No index build: synthesizes a fake packed-CSR buffer + random window
starts and times `probe_topk_pallas` directly.  Three questions:

1. pos-chain cost: `pos_mode="select"` (production) vs `"stub"` (lane
   index, measurement-only) — isolates the P-round select chain's VPU
   cost.  If the gap is small, the one-hot-matmul idea stays dead.
2. DMA-issue cost: fixed candidate volume L = P*window, varying P
   (12x256, 24x128, 48x64, 96x32) — if time grows with P at constant
   bytes, per-copy issue overhead (bq*P scalar-core DMA starts per grid
   step) dominates and coalescing probes into fewer/wider windows is the
   lever.
3. volume scaling: w sweep at fixed P.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_probe_attrib.py
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
n_pad = 1 << 20  # 1,048,576 slots/table -> 2.56 GB bf16 packed buffer
n = n_pad - 100
m = 1000
reps = 10

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
pts = jax.random.normal(key, (tries * n_pad, d), jnp.bfloat16)
qs = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)


def fence(out):
    return float(jnp.sum(out[0][:4, 0, 0].astype(jnp.float32)))


def run(P, w, pos_mode):
    starts = jnp.asarray(
        rng.integers(0, n_pad - 2 * w, size=(m, tries, P)), jnp.int32
    )
    f = lambda: probe_topk_pallas(
        pts, qs, starts, k=k, n=n, n_pad=n_pad, window=w, pos_mode=pos_mode
    )
    fence(f())  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f() for _ in range(reps)]
        fence(outs[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main_pos():
    cases = [
        # (P, w) sweeps; production points first
        (18, 32), (18, 96), (48, 96),
        # fixed volume L = 3072, varying DMA count
        (12, 256), (24, 128), (48, 64), (96, 32),
    ]
    for P, w in cases:
        for pos_mode in ("select", "stub"):
            try:
                s = run(P, w, pos_mode)
                print(json.dumps({
                    "P": P, "w": w, "pos_mode": pos_mode,
                    "ms_per_batch": round(s * 1e3, 2),
                    "qps": round(m / s, 1),
                    "L": P * w, "dmas_per_step": 16 * P,
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "P": P, "w": w, "pos_mode": pos_mode,
                    "error": str(e)[:200],
                }), flush=True)


def main_bq():
    """Grid-step attribution: the pos sweep fit a ~6.3 ms/batch fixed cost
    at P=18 — matching (m/bq)*tries = 630 steps at rule-11's ~10 us/step.
    Bigger query blocks halve/quarter the step count at identical volume."""
    for P, w in [(18, 32), (18, 96), (48, 96), (48, 32)]:
        for bq in (16, 32, 64):
            starts = jnp.asarray(
                rng.integers(0, n_pad - 2 * w, size=(m, tries, P)), jnp.int32
            )
            f = lambda: probe_topk_pallas(
                pts, qs, starts, k=k, n=n, n_pad=n_pad, window=w,
                query_block=bq,
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
                    "P": P, "w": w, "bq": bq,
                    "ms_per_batch": round(best * 1e3, 2),
                    "qps": round(m / best, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "P": P, "w": w, "bq": bq, "error": str(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    {"pos": main_pos, "bq": main_bq}[sys.argv[1] if len(sys.argv) > 1 else "pos"]()

"""Fused probe kernel compile-envelope check (real-TPU only — interpret
mode does not exercise Mosaic).

History: round-2 A/B sweeps hit remote-compile HTTP 500s at
query_block * n_probes >= 512 in-flight DMAs, and Mosaic block-shape
errors at non-8-multiple query blocks.  Fixed by wave-issued DMAs
(_DMA_INFLIGHT_MAX) + 8-aligned auto-shrink.  This script re-checks the
previously failing corners and compares TPU results against interpret
mode for one of them.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_probe import probe_topk_pallas

tries, d, k = 8, 128, 10
n_pad = 4096
n = n_pad - 7
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((tries * n_pad, d)), jnp.bfloat16)
m = 32
qs = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)

cases = [
    (32, 96, 16),   # failed pre-fix (512 in flight)
    (48, 96, 16),   # failed pre-fix (768)
    (64, 192, 8),   # failed pre-fix (512)
    (32, 96, 12),   # failed pre-fix (block shape): must shrink to 8
    (56, 96, 8),    # 448 in flight if uncapped; waves cap at 384
    (18, 96, 16),   # always-good control
]
for P, w, bq in cases:
    starts = jnp.asarray(
        rng.integers(0, (n_pad - w) // 8, size=(m, tries, P)) * 8, jnp.int32
    )
    try:
        p_, d_ = probe_topk_pallas(
            pts, qs, starts, k=k, n=n, n_pad=n_pad, window=w, query_block=bq
        )
        float(jnp.sum(jnp.where(jnp.isfinite(d_), d_, 0)))
        pi, di = probe_topk_pallas(
            pts, qs, starts, k=k, n=n, n_pad=n_pad, window=w, query_block=bq,
            interpret=True,
        )
        ok = bool(jnp.all(p_ == pi)) and bool(
            jnp.allclose(
                jnp.where(jnp.isfinite(d_), d_, 0),
                jnp.where(jnp.isfinite(di), di, 0),
                rtol=2e-2,
            )
        )
        print(f"P={P} w={w} qb={bq}: OK match_interpret={ok}")
    except Exception as e:
        print(f"P={P} w={w} qb={bq}: FAIL {str(e)[:160]!r}")

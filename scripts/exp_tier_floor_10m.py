#!/usr/bin/env python
"""Per-step floor attribution for the bf16/int8 exact tiers at 10M.

Round-2 VERDICT item 3 asked for the low-precision tiers to land within
~1.3x of their own measured per-step floor, or a documented negative
result of round-2 quality.  This script measures the floor at the
PRODUCTION tile/block shape (16384 x 256 — exp_exact_attrib's ablations
ran the 1M shape): 'stream' = corpus DMA + one VPU sweep, 'matmul' =
+MXU dot, 'lazy' = +the two mandatory distance/trigger sweeps (the
s-form), then the production kernel.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_tier_floor_10m.py
"""

from __future__ import annotations

import functools
import math
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from approximatenn_tpu.ops.pallas_exact import (
        exact_knn_pallas,
        quantize_corpus,
    )
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = 10_000_000, 96, 1000, 10
    tile, bq = 16384, 256
    kp, kq = jax.random.split(jax.random.PRNGKey(1))
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    Xb = X.astype(jnp.bfloat16)
    Xq, sc = quantize_corpus(X)
    del X
    fence([Xb, Xq, Y])

    n_tiles = math.ceil(n / tile)
    nq = math.ceil(m / bq)
    steps = nq * n_tiles

    def timeit(name, fn, reps=8):
        out = fn()
        fence([out])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(reps)]
            fence(outs)
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:40s} {best * 1e3:9.2f} ms  {best / steps * 1e6:7.2f} us/step",
              flush=True)
        return best

    def make_ablated(stage: str, cdt):
        """Ablation kernels at the production (tile, bq) in the rank
        kernel's TRANSPOSED layout ((tile, bq) distance blocks)."""

        def kern(q_ref, qn_ref, pts_ref, out_ref, acc):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _init():
                acc[:] = jnp.zeros(acc.shape, acc.dtype)

            tile_pts = pts_ref[:]
            if stage == "stream":
                acc[:] = acc[:] + jnp.sum(tile_pts.astype(jnp.float32))
            else:
                qb = q_ref[:]  # (d, bq)
                if jnp.issubdtype(tile_pts.dtype, jnp.integer):
                    dots = jax.lax.dot_general(
                        tile_pts, qb,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    dots = jax.lax.dot_general(
                        tile_pts, qb,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                if stage == "matmul":
                    acc[:] = acc[:] + dots[:1, :]
                else:  # 'dist': the two mandatory sweeps — score FMA +
                    # per-segment min (the trigger/nd0 reduce)
                    ptf = tile_pts.astype(jnp.float32)
                    pn = jnp.sum(ptf * ptf, axis=-1, keepdims=True)
                    dd = pn - 2.0 * dots
                    nd0 = jnp.min(dd.reshape(16, tile // 16, -1), axis=1)
                    any_imp = jnp.any(nd0 < acc[:1, :])

                    @pl.when(any_imp)
                    def _upd():
                        acc[:1, :] = jnp.minimum(acc[:1, :],
                                                 jnp.min(nd0, axis=0)[None])

            @pl.when(t == n_tiles - 1)
            def _emit():
                out_ref[:] = acc[:]

        @jax.jit
        def run(q, pts):
            mp = nq * bq
            qp = jnp.pad(q, [(0, mp - m), (0, 0)]) if mp != m else q
            qn = jnp.sum(qp * qp, axis=-1, keepdims=True)
            return pl.pallas_call(
                kern,
                grid=(nq, n_tiles),
                in_specs=[
                    pl.BlockSpec((d, bq), lambda qb_, t: (0, qb_),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bq), lambda qb_, t: (0, qb_),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, d), lambda qb_, t: (t, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, bq), lambda qb_, t: (0, qb_),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, nq * bq), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, bq), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        4 * bq * tile * 4 + 2 * tile * d * cdt.itemsize
                        + (16 << 20), 110 << 20),
                ),
            )(qp.astype(cdt).T, qn.T, pts)

        return run

    for label, pts, cdt in (("bf16", Xb, jnp.dtype(jnp.bfloat16)),
                            ("int8", Xq, jnp.dtype(jnp.int8))):
        print(f"== {label} floor at tile={tile} bq={bq} ({steps} steps) ==",
              flush=True)
        for stage in ("stream", "matmul", "dist"):
            try:
                timeit(f"{label} {stage}",
                       functools.partial(make_ablated(stage, cdt), Y, pts))
            except Exception as e:
                print(f"{label} {stage}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
        if label == "bf16":
            timeit("bf16 production kernel",
                   lambda: exact_knn_pallas(Xb, Y, k))
        else:
            timeit("int8 production kernel",
                   lambda: exact_knn_pallas(Xq, Y, k, scale=sc))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Exact-kernel per-step cost attribution at serving scale.

Decomposes the grid kernel's per-step time into (corpus stream + matmul)
floor, +distance/min sweeps, +merge machinery, by timing ablated kernels
with the production grid/BlockSpecs.  Also times bf16 as a *stored* corpus
(the round-1 bf16 A/B converted f32->bf16 inside the jit, which ADDS one
full corpus read+write per call — this separates storage width from
conversion traffic), and larger tiles under a raised VMEM cap.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_exact_attrib.py
"""

from __future__ import annotations

import argparse
import functools
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = args.n, args.d, args.m, args.k
    kp, kq = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    Xbf = X.astype(jnp.bfloat16)
    fence([X, Y, Xbf])

    def timeit(name, fn, reps=args.reps, steps=None):
        out = fn()
        fence([out])
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        per = f"  {dt / steps * 1e6:8.1f} us/step" if steps else ""
        print(f"{name:44s} {dt * 1e3:9.3f} ms{per}", flush=True)
        return dt

    # ---- ablation kernels on the production grid ----
    def make_ablated(stage: str, tile: int, bq: int, cdt):
        """stage: 'stream' (read+1 sweep), 'matmul' (+MXU dot),
        'dist' (+distance assembly, eager masks, min sweep, any()),
        'lazy' (s/smax form, no masks)."""
        n_tiles = math.ceil(n / tile)
        nq = math.ceil(m / bq)
        mp = nq * bq

        def kern(q_ref, qn_ref, pts_ref, pn_ref, out_ref, acc):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _init():
                acc[:] = jnp.zeros(acc.shape, acc.dtype)

            tile_pts = pts_ref[:]
            if stage == "stream":
                # one VPU sweep over the tile so the DMA can't be DCE'd
                acc[:] = acc[:] + jnp.sum(tile_pts.astype(jnp.float32))
            else:
                qb = q_ref[:]
                dots = jax.lax.dot_general(
                    qb, tile_pts,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if stage == "matmul":
                    acc[:] = acc[:] + dots[:, :1]
                elif stage == "dist":
                    base = t * tile
                    gids = base + jax.lax.broadcasted_iota(
                        jnp.int32, (1, tile), 1)
                    dd = qn_ref[:] + pn_ref[:] - 2.0 * dots
                    dd = jnp.where(gids < n, dd, jnp.inf)
                    tmin = jnp.min(dd, axis=-1, keepdims=True)
                    any_imp = jnp.any(tmin < acc[:, :1])

                    @pl.when(any_imp)
                    def _upd():
                        acc[:, :1] = jnp.minimum(acc[:, :1], tmin)
                elif stage == "lazy":
                    s = 2.0 * dots - pn_ref[:]
                    smax = jnp.max(s, axis=-1, keepdims=True)
                    any_imp = jnp.any(qn_ref[:] - smax < acc[:, :1])

                    @pl.when(any_imp)
                    def _upd():
                        acc[:, :1] = jnp.minimum(
                            acc[:, :1], qn_ref[:] - smax)

            @pl.when(t == n_tiles - 1)
            def _emit():
                out_ref[:] = acc[:]

        @jax.jit
        def run(q, pts, pn):
            qp = jnp.pad(q, [(0, mp - m), (0, 0)]) if mp != m else q
            qn = jnp.sum(qp * qp, axis=-1, keepdims=True)
            return pl.pallas_call(
                kern,
                grid=(nq, n_tiles),
                in_specs=[
                    pl.BlockSpec((bq, d), lambda qb, t: (qb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bq, 1), lambda qb, t: (qb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, d), lambda qb, t: (t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile), lambda qb, t: (0, t),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bq, 1), lambda qb, t: (qb, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        2 * bq * tile * 4 + 2 * tile * d * cdt.itemsize
                        + (16 << 20),
                        110 << 20),
                ),
            )(qp.astype(cdt), qn, pts, pn)

        return run, nq * n_tiles

    tile, bq = 8192, 512
    n_tiles = math.ceil(n / tile)
    pn = jnp.pad(jnp.sum(X.astype(jnp.float32) ** 2, -1)[None, :],
                 [(0, 0), (0, n_tiles * tile - n)])
    fence([pn])

    print(f"== ablation at n={n} d={d} m={m} tile={tile} bq={bq} "
          f"({math.ceil(m/bq) * n_tiles} steps) ==")
    f32 = jnp.dtype(jnp.float32)
    bf16 = jnp.dtype(jnp.bfloat16)
    for stage in ("stream", "matmul", "dist", "lazy"):
        run, steps = make_ablated(stage, tile, bq, f32)
        timeit(f"{stage} f32", lambda r=run: r(Y, X, pn), steps=steps)
    for stage in ("stream", "matmul", "lazy"):
        run, steps = make_ablated(stage, tile, bq, bf16)
        timeit(f"{stage} bf16-stored", lambda r=run: r(Y, Xbf, pn),
               steps=steps)

    print("== production kernel ==")
    steps = math.ceil(m / 512) * math.ceil(n / 8192)
    timeit("exact f32 (auto tile)", lambda: exact_knn_pallas(X, Y, k),
           steps=steps)
    timeit("exact bf16-stored (auto tile)",
           lambda: exact_knn_pallas(Xbf, Y, k), steps=steps)
    timeit("exact bf16 in-jit convert",
           lambda: exact_knn_pallas(X, Y, k, compute_dtype=jnp.bfloat16),
           steps=steps)
    for tile_ in (8192, 16384, 32768):
        for bq_ in (512, 1024):
            steps = math.ceil(m / bq_) * math.ceil(n / tile_)
            try:
                timeit(f"exact f32 tile={tile_} bq={bq_}",
                       lambda t=tile_, b=bq_: exact_knn_pallas(
                           X, Y, k, tile=t, query_block=b),
                       steps=steps)
                timeit(f"exact bf16-stored tile={tile_} bq={bq_}",
                       lambda t=tile_, b=bq_: exact_knn_pallas(
                           Xbf, Y, k, tile=t, query_block=b),
                       steps=steps)
            except Exception as e:  # Mosaic compile ceilings
                print(f"tile={tile_} bq={bq_}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

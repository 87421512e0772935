#!/usr/bin/env python
"""Decompose the hash-path query cost at the headline config.

Times each pipeline stage in isolation (jitted, device-fenced) so the
dominant cost is measurable rather than guessed:

  proj+codes   MXU projection + sign packing
  table-gather multiprobe bucket-row gather (tables[probes])
  point-gather the (B, L, d) candidate-vector gather alone
  dists        gather + squared-L2 (diff and dot forms)
  dedup-topk   k-pass masked-argmin selection over (B, L)
  supercharge  graph expansion + second distance pass
  full         end-to-end search_impl

Run on the TPU host:  python scripts/profile_query.py [--n 20000]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tries", type=int, default=10)
    ap.add_argument("--ycnt", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--n-probes", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import approximatenn_tpu as ann
    from approximatenn_tpu.engine.search import search_impl
    from approximatenn_tpu.ops.distance import candidate_dists, pick_block
    from approximatenn_tpu.ops.hash import pack_signs, probe_codes, probe_codes_directed
    from approximatenn_tpu.ops.topk import dedup_topk
    from approximatenn_tpu.utils.profiling import fence

    rng = np.random.default_rng(12345)
    X = jnp.asarray(rng.standard_normal((args.n, args.d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((args.ycnt, args.d)).astype(np.float32))
    index, _, _ = ann.build(X, args.k, tries=args.tries, seed=7)
    n, k, ds, tries, tmax = index.n, index.k, index.d_short, index.tries, index.tmax
    P = ds + 1 if args.n_probes is None else args.n_probes
    L = tries * P * tmax
    print(f"n={n} d={args.d} k={k} tries={tries} d_short={ds} tmax={tmax} "
          f"P={P} L={L} ycnt={args.ycnt}")

    block_rows = pick_block(args.ycnt, L, args.d, 4, 128 << 20)
    print(f"block_rows={block_rows}")

    def timeit(name, fn, *a, **kw):
        out = fn(*a, **kw)          # compile
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a, **kw) for _ in range(args.reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:24s} {dt*1e3:9.3f} ms/batch   {args.ycnt/dt:12.0f} QPS-equiv")
        return out

    # stage 1: projection + codes
    @jax.jit
    def s_proj(q):
        yc = q - index.row_means
        proj = yc @ index.bases.reshape(tries * ds, args.d).T
        proj = proj.reshape(q.shape[0], tries, ds)
        return proj, pack_signs(proj)

    proj, codes = timeit("proj+codes", s_proj, Y)

    # stage 2: probe codes + table gather
    tidx = jnp.arange(tries, dtype=jnp.int32)[None, :, None]

    @jax.jit
    def s_tables(codes, proj):
        if args.n_probes is None:
            probes = probe_codes(codes, ds)
        else:
            probes = probe_codes_directed(codes, proj, args.n_probes)
        cand = index.tables[tidx, probes]
        return cand.reshape(codes.shape[0], -1)

    cand = timeit("table-gather", s_tables, codes, proj)

    # stage 3a: raw point gather only (bandwidth probe)
    @partial(jax.jit, static_argnames=("blk",))
    def s_gather(cand, blk):
        def one(cb):
            safe = jnp.where(cb < n, cb, 0)
            return jnp.sum(X[safe], axis=(1, 2))
        from approximatenn_tpu.ops.distance import blocked_over_rows
        return blocked_over_rows(one, cand.shape[0], blk, cand, pad_values=(0,))

    timeit("point-gather(sum)", s_gather, cand, block_rows)
    gb = args.ycnt * L * args.d * 4 / 1e9
    print(f"  (gather volume {gb:.2f} GB/batch)")

    # stage 3b: gather + distances
    @partial(jax.jit, static_argnames=("blk", "method"))
    def s_dists(q, cand, blk, method):
        def one(qb, cb):
            return candidate_dists(qb, X, cb, method=method)
        from approximatenn_tpu.ops.distance import blocked_over_rows
        return blocked_over_rows(one, q.shape[0], blk, q, cand,
                                 pad_values=(0.0, 0))

    dd = timeit("dists(diff)", s_dists, Y, cand, block_rows, "diff")
    timeit("dists(dot)", s_dists, Y, cand, block_rows, "dot")

    # bf16 variant: gather + distance in bfloat16
    Xh = X.astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames=("blk",))
    def s_dists_bf16(q, cand, blk):
        qh = q.astype(jnp.bfloat16)
        def one(qb, cb):
            valid = cb < n
            safe = jnp.where(valid, cb, 0)
            pc = Xh[safe]
            diff = qb[:, None, :] - pc
            ddl = jnp.sum((diff * diff).astype(jnp.float32), axis=-1)
            return jnp.where(valid, ddl, jnp.inf)
        from approximatenn_tpu.ops.distance import blocked_over_rows
        return blocked_over_rows(one, q.shape[0], blk, qh, cand,
                                 pad_values=(0.0, 0))

    timeit("dists(bf16 gather)", s_dists_bf16, Y, cand, block_rows)

    # stage 4: dedup-topk alone
    @partial(jax.jit, static_argnames=("blk",))
    def s_topk(cand, dd, blk):
        def one(cb, db):
            return dedup_topk(cb, db, k, n)
        from approximatenn_tpu.ops.distance import blocked_over_rows
        return blocked_over_rows(one, cand.shape[0], blk, cand, dd,
                                 pad_values=(0, jnp.inf))

    t1, td1 = timeit("dedup-topk", s_topk, cand, dd, block_rows)

    # stage 5: supercharge
    @partial(jax.jit, static_argnames=("blk",))
    def s_super(q, t1, td1, blk):
        def one(qb, tb, tdb):
            safe = jnp.where(tb < n, tb, 0)
            exp = jnp.where((tb < n)[..., None], index.graph[safe], n)
            cand2 = jnp.concatenate([tb, exp.reshape(-1, k * k)], axis=-1)
            dd2 = candidate_dists(qb, X, exp.reshape(-1, k * k))
            dd2 = jnp.concatenate([tdb, dd2], axis=-1)
            return dedup_topk(cand2, dd2, k, n)
        from approximatenn_tpu.ops.distance import blocked_over_rows
        return blocked_over_rows(one, q.shape[0], blk, q, t1, td1,
                                 pad_values=(0.0, 0, jnp.inf))

    timeit("supercharge", s_super, Y, t1, td1, block_rows)

    # end-to-end
    sj = partial(jax.jit, static_argnames=("block_rows", "n_probes"))(search_impl)
    timeit("FULL search_impl", sj, index, X, Y, block_rows, args.n_probes)

    # block-size sweep on the full path
    for blk in (64, 128, 256, 512, 1000):
        if blk > args.ycnt:
            continue
        try:
            timeit(f"full(block={blk})", sj, index, X, Y, blk, args.n_probes)
        except Exception as e:  # OOM at big blocks is informative, not fatal
            print(f"full(block={blk}): {type(e).__name__}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Experiment: bucket-contiguous (packed) candidate storage vs row gather.

Hypothesis from scripts/profile_query.py: the (B, L, d) candidate gather is
per-row-bound (~3.6 ns/row; bf16 saves only 7%), so gathering ~120
contiguous (cap, d) bucket tiles per query should approach streaming
bandwidth and cut the dominant query cost ~4x.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import approximatenn_tpu as ann
    from approximatenn_tpu.ops.distance import blocked_over_rows
    from approximatenn_tpu.ops.hash import pack_signs, probe_codes
    from approximatenn_tpu.ops.topk import dedup_topk
    from approximatenn_tpu.utils.profiling import fence

    n, d, k, tries, ycnt = 20_000, 128, 10, 10, 1000
    rng = np.random.default_rng(12345)
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((ycnt, d)).astype(np.float32))
    index, _, _ = ann.build(X, k, tries=tries, seed=7)
    ds, tmax = index.d_short, index.tmax
    P = ds + 1
    L = tries * P * tmax
    print(f"d_short={ds} tmax={tmax} P={P} L={L}")

    # one-time packing: candidate vectors bucket-contiguous.  sentinel -> 0.
    safe_tables = jnp.where(index.tables < n, index.tables, 0)
    packed = X[safe_tables]  # (tries, nb, cap, d)
    packed = jnp.where((index.tables < n)[..., None], packed, 0.0)
    fence(packed)
    print(f"packed: {packed.shape} {packed.nbytes/1e6:.0f} MB")
    packed_h = packed.astype(jnp.bfloat16)
    fence(packed_h)

    tidx = jnp.arange(tries, dtype=jnp.int32)[None, :, None]

    def timeit(name, fn, *a, reps=10):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.3f} ms/batch   {ycnt/dt:12.0f} QPS-equiv")
        return out

    @partial(jax.jit, static_argnames=("blk",))
    def codes_of(q, blk=None):
        yc = q - index.row_means
        proj = (yc @ index.bases.reshape(tries * ds, d).T).reshape(-1, tries, ds)
        return pack_signs(proj)

    codes = codes_of(Y)
    fence(codes)

    # packed tile gather + distances + dedup topk, full fused pipeline
    @partial(jax.jit, static_argnames=("blk", "use_bf16"))
    def packed_search(q, codes, blk, use_bf16=False):
        pts = packed_h if use_bf16 else packed

        def one(qb, cb):
            probes = probe_codes(cb, ds)  # (B, T, P)
            ids = index.tables[tidx, probes].reshape(qb.shape[0], -1)
            pc = pts[tidx, probes]  # (B, T, P, cap, d)
            pc = pc.reshape(qb.shape[0], -1, d)
            qbh = qb.astype(pc.dtype)
            diff = qbh[:, None, :] - pc
            dd = jnp.sum((diff * diff).astype(jnp.float32), axis=-1)
            dd = jnp.where(ids < n, dd, jnp.inf)
            return dedup_topk(ids, dd, k, n)

        return blocked_over_rows(one, q.shape[0], blk, q, codes,
                                 pad_values=(0.0, 0))

    # tile gather only (bandwidth probe)
    @partial(jax.jit, static_argnames=("blk",))
    def packed_gather(codes, blk):
        def one(cb):
            probes = probe_codes(cb, ds)
            pc = packed[tidx, probes]
            return jnp.sum(pc, axis=(1, 2, 3, 4))
        return blocked_over_rows(one, codes.shape[0], blk, codes, pad_values=(0,))

    for blk in (125, 250, 500, 1000):
        timeit(f"packed-gather(blk={blk})", packed_gather, codes, blk)
    gb = ycnt * L * d * 4 / 1e9
    print(f"  (volume {gb:.2f} GB/batch)")
    for blk in (125, 250, 500, 1000):
        timeit(f"packed-dists+topk(b={blk})", packed_search, Y, codes, blk)
    for blk in (125, 250, 500, 1000):
        timeit(f"packed bf16     (b={blk})", packed_search, Y, codes, blk, True)

    # sanity: ids match the regular path
    from approximatenn_tpu.engine.search import search_impl
    ref_ids, _ = jax.jit(
        partial(search_impl, block_rows=250)
    )(index, X, Y)
    # packed path has no supercharge here; compare first-stage candidates
    # by recall against exact instead
    tq, _ = ann.brute_force_knn(X, Y, k)
    pids, _ = packed_search(Y, codes, 250)
    from approximatenn_tpu.harness.scoring import recall_at_k
    print("recall packed(no super):", recall_at_k(np.asarray(tq), np.asarray(pids), k))
    print("recall regular(full)  :", recall_at_k(np.asarray(tq), np.asarray(ref_ids), k))


if __name__ == "__main__":
    main()

"""Distributed (multi-chip) index build and query.

The reference has no distributed layer at all (SURVEY.md §2.3); its scale
axis — dataset size n — caps out at single-device memory.  This module is
the mandated TPU-native replacement: points, bucket tables, and the kNN
graph are row-sharded over a ``jax.sharding.Mesh``; queries are replicated;
each shard searches its local sub-index and the per-shard top-k are merged
with one ``all_gather`` over ICI followed by a final top-k.  Because every
point lives on exactly one shard, global ids are unique across shards and
the merge needs no dedup.

Design (SURVEY.md §7.4): shard points, build fully independent per-shard
tables/graphs (local bucket statistics — tmax/recall differ slightly from a
global build; gated by tests), fan queries out, merge.  The exact-merge
property holds for the final k-NN of whatever candidates each shard
produces: distributed recall ≈ single-device recall, and distributed
*exact* search (``search_exact_sharded``) equals global brute force
bit-for-bit in id-set terms.

All functions also run unsharded on a 1-device mesh, and on a CPU mesh via
``--xla_force_host_platform_device_count`` (how the tests and the driver's
``dryrun_multichip`` validate them without a TPU pod).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import itype
from ..engine.build import graph_stage, hash_points, sample_bases
from ..engine.search import search_impl
from ..index import ANNIndex
from ..ops.buckets import bucket_counts
from ..ops.distance import pick_block
from ..ops.topk import topk_no_dedup

AXIS = "shards"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedIndex:
    """Per-shard sub-indexes, stacked on a leading shard axis.

    ``tables``/``graph`` hold *local* ids in [0, n_local] with sentinel
    n_local; ``offsets[s] = s * n_local`` maps them to global ids."""

    row_means: Any  # (d,) replicated
    bases: Any  # (tries, d_short, d) replicated
    tables: Any  # (S, tries, 2^ds, tmax) sharded on axis 0
    counts: Any  # (S, tries, 2^ds)
    graph: Any  # (S, n_local, k) local ids
    n: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    d_short: int = dataclasses.field(metadata=dict(static=True))
    tries: int = dataclasses.field(metadata=dict(static=True))
    tmax: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))

    def local_index(self, tables, counts, graph) -> ANNIndex:
        """View one shard's arrays as a standalone ANNIndex over its slice."""
        return ANNIndex(
            row_means=self.row_means, bases=self.bases, tables=tables,
            counts=counts, graph=graph, n=self.n_local, k=self.k, d=self.d,
            d_short=self.d_short, tries=self.tries, tmax=self.tmax,
        )


def _shard_points(points, mesh):
    s = mesh.shape[AXIS]
    n = points.shape[0]
    if n % s:
        raise ValueError(f"n={n} must be divisible by shard count {s} (pad upstream)")
    if isinstance(points, jax.Array) and not points.is_fully_addressable:
        # already a global (multi-host) array: device_put can't cross
        # processes; the caller assembled it (process_local_array) and it
        # is row-sharded by construction
        return points
    return jax.device_put(points, NamedSharding(mesh, P(AXIS, None)))


def _replicate(arr, mesh, dtype=None):
    """Replicate an array over every device of `mesh`, including
    non-addressable ones (multi-host): each process contributes its
    identical local copy.  Single-process, an already-device-resident
    array is placed directly — forcing it through np.asarray would add a
    blocking device->host pull per call (seconds on the slow tunnel)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        arr = np.asarray(arr) if dtype is None else np.asarray(arr, dtype)
        return jax.make_array_from_process_local_data(sharding, arr, arr.shape)
    arr = jnp.asarray(arr) if dtype is None else jnp.asarray(arr, dtype)
    return jax.device_put(arr, sharding)


def build_sharded(
    points,
    k: int,
    *,
    mesh: Mesh,
    tries: int = 10,
    rots_before: int = 6,
    rot_len_before: int = 1,
    rots_after: int = 1,
    rot_len_after: int = 1,
    key=None,
    seed: int = 0,
    dtype=jnp.float32,
    capacity: int | str | None = None,
    budget_bytes: int = 128 << 20,
) -> ShardedIndex:
    """Distributed index build (TPU-native ``precomp`` at pod scale).

    Points are row-sharded; the mean is a global ``psum``; transform
    parameters are sampled once from ``key`` and replicated so all shards
    hash consistently; each shard builds tables + kNN graph over its slice.
    """
    from ..ops.transforms import derive_dims

    s = mesh.shape[AXIS]
    n, d = points.shape
    points = _shard_points(jnp.asarray(points, dtype), mesh)
    n_local = n // s
    # bucket statistics follow the *local* slice size (per-shard tables)
    d_short, _ = derive_dims(n_local, k, d)
    if key is None:
        key = jax.random.key(seed)
    bases = sample_bases(
        key, d, d_short, tries, rots_before, rot_len_before,
        rots_after, rot_len_after, dtype,
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, None, None)),
        out_specs=(P(None), P(AXIS, None), P(AXIS, None, None)),
    )
    def stage_a(pts_l, bases_r):
        mu = jax.lax.psum(jnp.sum(pts_l, axis=0), AXIS) / n
        codes = hash_points(pts_l - mu, bases_r)  # (tries, n_local)
        counts = jax.vmap(lambda c: bucket_counts(c, 1 << d_short))(codes)
        return mu, codes.T, counts[None]

    row_means, codes_g, counts = stage_a(points, bases)
    from ..engine.build import resolve_capacity

    tmax = resolve_capacity(counts, capacity)
    block_rows = pick_block(
        n_local, (d_short + 1) * tmax, d, jnp.dtype(dtype).itemsize, budget_bytes
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None, None)),
        out_specs=(P(AXIS, None, None, None), P(AXIS, None, None)),
    )
    def stage_b(pts_l, codes_l, counts_l):
        tables, graph, _ = graph_stage(
            pts_l, codes_l.T, counts_l[0], k=k, d_short=d_short, tmax=tmax,
            block_rows=block_rows,
        )
        return tables[None], graph[None]

    tables, graph = stage_b(points, codes_g, counts)
    return ShardedIndex(
        row_means=row_means, bases=bases, tables=tables, counts=counts,
        graph=graph, n=n, n_local=n_local, k=k, d=d, d_short=d_short,
        tries=tries, tmax=tmax, n_shards=s,
    )


def _to_global(ids_l, dists, n_local, n, offset):
    g = jnp.where(ids_l < n_local, ids_l + offset, n).astype(itype)
    return g, jnp.where(ids_l < n_local, dists, jnp.inf)


def search_sharded(
    sidx: ShardedIndex,
    points,
    queries,
    *,
    mesh: Mesh,
    budget_bytes: int = 128 << 20,
    block_rows: int | None = None,
    n_probes: int | None = None,
):
    """Distributed batch query: replicate queries, per-shard local search,
    ``all_gather`` the per-shard top-k over ICI, final merge top-k
    (SURVEY.md §2.3 mandated collective pattern).  Returns global ids.
    ``n_probes`` as in :func:`~..engine.search.search`."""
    k, n_local, n = sidx.k, sidx.n_local, sidx.n
    m = queries.shape[0]
    if block_rows is None:
        nprb = sidx.d_short + 1 if n_probes is None else n_probes
        ltot = sidx.tries * nprb * sidx.tmax
        block_rows = pick_block(m, ltot, sidx.d, 4, budget_bytes)
    points = _shard_points(points, mesh)
    points = points if points.dtype == sidx.bases.dtype else points.astype(sidx.bases.dtype)
    queries = _replicate(queries, mesh, dtype=sidx.bases.dtype)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(
            P(AXIS, None), P(),
            P(AXIS, None, None, None), P(AXIS, None, None), P(AXIS, None, None),
            P(None), P(None, None, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated via all_gather+identical
    )
    def go(pts_l, y, tables_l, counts_l, graph_l, row_means, bases):
        local = ANNIndex(
            row_means=row_means, bases=bases, tables=tables_l[0],
            counts=counts_l[0], graph=graph_l[0], n=n_local, k=k, d=sidx.d,
            d_short=sidx.d_short, tries=sidx.tries, tmax=sidx.tmax,
        )
        ids_l, dd = search_impl(local, pts_l, y, block_rows, n_probes)
        offset = jax.lax.axis_index(AXIS).astype(itype) * n_local
        gids, dd = _to_global(ids_l, dd, n_local, n, offset)
        all_ids = jax.lax.all_gather(gids, AXIS)  # (S, m, k)
        all_dd = jax.lax.all_gather(dd, AXIS)
        s = all_ids.shape[0]
        all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(m, s * k)
        all_dd = jnp.moveaxis(all_dd, 0, 1).reshape(m, s * k)
        return topk_no_dedup(all_dd, all_ids, k)

    return go(
        points, queries, sidx.tables, sidx.counts, sidx.graph,
        sidx.row_means, sidx.bases,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedPacked:
    """Per-shard packed (bucket-CSR) serving views, stacked on a leading
    shard axis — the packed layout's scale-out form (single-chip rationale:
    :meth:`~..index.ANNIndex.packed`).  ``point_rows`` stores each shard's
    candidate vectors FLAT (one point per lane-aligned row, same layout as
    the single-chip view); ``ids``/``starts`` are local CSR maps.  Local
    slot ids map to global ids via ``shard * n_local`` offsets at merge."""

    point_rows: Any  # (S, tries * n_pad_l, d_pad) storage dtype
    ids: Any  # (S, tries, n_pad_l) local ids, sentinel n_local
    starts: Any  # (S, tries, 2^d_short)
    # int8 tier: ONE replicated quantization scale covers every shard so
    # per-shard quantized-domain distances stay globally comparable
    scale: Any = None
    n_pad_l: int = dataclasses.field(default=0, metadata=dict(static=True))
    d_pad: int = dataclasses.field(default=0, metadata=dict(static=True))
    window: int = dataclasses.field(default=0, metadata=dict(static=True))
    super_width: int = dataclasses.field(default=1, metadata=dict(static=True))

    def memory_bytes(self) -> int:
        return int(
            self.point_rows.size
            * np.dtype(self.point_rows.dtype).itemsize
            + self.ids.size * 4 + self.starts.size * 4
        )


def packed_sharded(
    sidx: ShardedIndex,
    points,
    *,
    mesh: Mesh,
    window: int | None = None,
    super_width: int = 2,
    dtype=None,
) -> ShardedPacked:
    """Build per-shard packed views from a sharded index: each shard packs
    its local slice into bucket-CSR order (exactly n_local slots per table,
    no capacity padding, no overflow drops) entirely shard-locally — no
    collectives; the pack is embarrassingly parallel over the mesh.

    ``dtype=jnp.int8`` builds the quantized tier sharded: one global scale
    (max|x| over the whole sharded corpus — the only cross-shard value)
    keeps quantized distances comparable across shards; rows follow the
    single-chip convention (``index._quantize_points``: zero sentinel row,
    sentinel exclusion via the id map, 32-aligned strides)."""
    import math as _math

    from ..ops.buckets import pack_tables

    w = max(1, int(super_width))
    n_local, d_short, tries = sidx.n_local, sidx.d_short, sidx.tries
    dtype = jnp.dtype(sidx.bases.dtype if dtype is None else dtype)
    quantize = dtype == jnp.int8
    lcm8 = _math.lcm(w, 32 if quantize else 8)
    n_pad_l = -(-(n_local + 1) // lcm8) * lcm8
    d = sidx.d
    d_pad = -(-d // 128) * 128
    points = _shard_points(points, mesh)
    scale = None
    if quantize:
        # global max over the sharded corpus (XLA inserts the collective)
        scale = jnp.max(jnp.abs(points.astype(jnp.float32))) / 127.0

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, None, None), P(None), P()),
        out_specs=(P(AXIS, None, None), P(AXIS, None, None),
                   P(AXIS, None, None)),
    )
    def pack_l(pts_l, bases, row_means, sc):
        codes = hash_points(
            pts_l.astype(bases.dtype) - row_means, bases
        )  # (tries, n_local)
        order, starts = pack_tables(codes, 1 << d_short)
        pad = jnp.full((tries, n_pad_l - n_local), n_local, order.dtype)
        ids = jnp.concatenate([order, pad], axis=1)  # (tries, n_pad_l)
        if quantize:
            from ..index import _quantize_points

            pts_s = _quantize_points(pts_l, sc, d_pad)
        else:
            pts_s = pts_l.astype(dtype)
            if d_pad != d:
                pts_s = jnp.pad(pts_s, [(0, 0), (0, d_pad - d)])
            pts_s = jnp.concatenate(
                [pts_s, jnp.full((1, d_pad), jnp.inf, dtype)]
            )
        rows = pts_s[jnp.minimum(ids.reshape(-1), n_local)]
        return rows[None], ids[None], starts[None]

    sc = _replicate(np.float32(1.0), mesh) if scale is None else scale
    rows, ids, starts = pack_l(points, sidx.bases, sidx.row_means, sc)
    return ShardedPacked(
        point_rows=rows, ids=ids, starts=starts, scale=scale,
        n_pad_l=n_pad_l,
        d_pad=d_pad, window=int(window) if window else sidx.tmax,
        super_width=w,
    )


def search_packed_sharded(
    sidx: ShardedIndex,
    spk: ShardedPacked,
    points,
    queries,
    *,
    mesh: Mesh,
    budget_bytes: int = 128 << 20,
    block_rows: int | None = None,
    n_probes: int | None = None,
):
    """Distributed packed-layout query: replicate queries, per-shard
    :func:`~..engine.search.search_packed_impl` over the local CSR view,
    ``all_gather`` + merge — same collective pattern as
    :func:`search_sharded`, with the packed candidate superset semantics
    per shard."""
    from ..engine.search import search_packed_impl
    from ..index import PackedIndex

    k, n_local, n = sidx.k, sidx.n_local, sidx.n
    m = queries.shape[0]
    rpp = min(-(-spk.window // spk.super_width) + 1,
              spk.n_pad_l // spk.super_width)
    if block_rows is None:
        nprb = sidx.d_short + 1 if n_probes is None else n_probes
        ltot = sidx.tries * nprb * rpp * spk.super_width
        block_rows = pick_block(m, ltot, sidx.d, 4, budget_bytes)
    points = _shard_points(points, mesh)
    queries = _replicate(queries, mesh, dtype=sidx.bases.dtype)

    sc = (spk.scale if spk.scale is not None
          else _replicate(np.float32(1.0), mesh))
    has_scale = spk.scale is not None

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(
            P(AXIS, None), P(),
            P(AXIS, None, None), P(AXIS, None, None), P(AXIS, None, None),
            P(AXIS, None, None), P(None), P(None, None, None), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # outputs replicated via all_gather+identical
    )
    def go(pts_l, y, rows_l, ids_l, starts_l, graph_l, row_means, bases, sc_l):
        local = PackedIndex(
            row_means=row_means, bases=bases, point_rows=rows_l[0],
            ids=ids_l[0], starts=starts_l[0], graph=graph_l[0],
            points=None, scale=sc_l if has_scale else None,
            n=n_local, k=k, d=sidx.d, d_short=sidx.d_short,
            tries=sidx.tries, window=spk.window,
            super_width=spk.super_width, d_pad=spk.d_pad,
        )
        lids, dd = search_packed_impl(local, pts_l, y, block_rows, n_probes)
        offset = jax.lax.axis_index(AXIS).astype(itype) * n_local
        gids, dd = _to_global(lids, dd, n_local, n, offset)
        all_ids = jnp.moveaxis(jax.lax.all_gather(gids, AXIS), 0, 1)
        all_dd = jnp.moveaxis(jax.lax.all_gather(dd, AXIS), 0, 1)
        s = all_ids.shape[1]
        return topk_no_dedup(
            all_dd.reshape(m, s * k), all_ids.reshape(m, s * k), k
        )

    return go(
        points, queries, spk.point_rows, spk.ids, spk.starts,
        sidx.graph, sidx.row_means, sidx.bases, sc,
    )


def search_packed_fused_sharded(
    sidx: ShardedIndex,
    spk: ShardedPacked,
    points,
    queries,
    *,
    mesh: Mesh,
    n_probes: int | None = None,
    window: int | None = None,
    query_block: int = 32,
    supercharge_rounds: int = 1,
    rerank_width: int | None = None,
    interpret: bool | None = None,
):
    """:func:`search_packed_sharded` served through the fused probe-window
    Pallas kernel per shard (``search_packed_fused_impl``) — the scale-out
    form of the highest-QPS hash path (the kernel DMAs each probe's CSR
    window per shard; the cross-shard story is unchanged: replicate
    queries, per-shard top-k, one ``all_gather``, merged top-k).  int8
    views rank in the quantized domain on-chip and re-score against the
    shard's float slice.  ``interpret=None`` auto-selects interpret mode
    off-TPU (how the CPU-mesh tests run the identical kernel)."""
    from ..engine.search import search_packed_fused_impl
    from ..index import PackedIndex

    k, n_local, n = sidx.k, sidx.n_local, sidx.n
    m = queries.shape[0]
    if interpret is None:
        interpret = mesh.devices.flat[0].platform not in ("tpu", "axon")
    points = _shard_points(points, mesh)
    queries = _replicate(queries, mesh, dtype=sidx.bases.dtype)
    sc = (spk.scale if spk.scale is not None
          else _replicate(np.float32(1.0), mesh))
    has_scale = spk.scale is not None

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(
            P(AXIS, None), P(),
            P(AXIS, None, None), P(AXIS, None, None), P(AXIS, None, None),
            P(AXIS, None, None), P(None), P(None, None, None), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def go(pts_l, y, rows_l, ids_l, starts_l, graph_l, row_means, bases, sc_l):
        local = PackedIndex(
            row_means=row_means, bases=bases, point_rows=rows_l[0],
            ids=ids_l[0], starts=starts_l[0], graph=graph_l[0],
            points=None, scale=sc_l if has_scale else None,
            n=n_local, k=k, d=sidx.d, d_short=sidx.d_short,
            tries=sidx.tries, window=spk.window,
            super_width=spk.super_width, d_pad=spk.d_pad,
        )
        lids, dd = search_packed_fused_impl(
            local, pts_l, y, n_probes=n_probes, window=window,
            query_block=query_block, interpret=interpret,
            supercharge_rounds=supercharge_rounds,
            rerank_width=rerank_width,
        )
        offset = jax.lax.axis_index(AXIS).astype(itype) * n_local
        gids, dd = _to_global(lids, dd, n_local, n, offset)
        all_ids = jnp.moveaxis(jax.lax.all_gather(gids, AXIS), 0, 1)
        all_dd = jnp.moveaxis(jax.lax.all_gather(dd, AXIS), 0, 1)
        s = all_ids.shape[1]
        return topk_no_dedup(
            all_dd.reshape(m, s * k), all_ids.reshape(m, s * k), k
        )

    return go(
        points, queries, spk.point_rows, spk.ids, spk.starts,
        sidx.graph, sidx.row_means, sidx.bases, sc,
    )


def search_exact_sharded(points, queries, k: int, *, mesh: Mesh,
                         block: int = 1024, scale=None):
    """Distributed exact kNN: per-shard exact search + all_gather merge.
    Equals global brute force exactly (each shard's local top-k contains
    every true global top-k member residing on that shard).  Per-shard
    engine: the fused Pallas streaming kernel on TPU (165k QPS at 1M on
    ONE v5e chip — n scales linearly with shard count), XLA brute force
    on CPU meshes.

    Storage tiers shard too: a bf16/f16 corpus streams at storage width,
    and an int8 corpus (``quantize_corpus``; pass its ``scale``) runs the
    quantized-domain distance per shard — distances are globally
    comparable because one scale covers every shard, so the merge is
    unchanged.  Per-chip capacity (8M f32 / 16M bf16 / 32M int8 at 128-d)
    multiplies by shard count."""
    from ..ops.distance import brute_force_knn
    from ..ops.pallas_exact import exact_knn_pallas

    points = points if isinstance(points, jax.Array) else jnp.asarray(points)
    quant = points.dtype == jnp.int8
    if quant and scale is None:
        raise ValueError("int8 corpus requires its quantization scale "
                         "(see quantize_corpus)")
    stored_width = points.dtype in (jnp.bfloat16, jnp.float16, jnp.int8)
    n = points.shape[0]
    s = mesh.shape[AXIS]
    n_local = n // s
    f64 = points.dtype == jnp.float64
    points = _shard_points(points, mesh)
    q = jnp.asarray(queries)
    queries = _replicate(
        q if f64 and q.dtype == jnp.float64 else q.astype(jnp.float32),
        mesh)
    # one global scale -> per-shard quantized distances share the unit;
    # replicated as an array arg (never close over device arrays in jit)
    sc = _replicate(np.float32(1.0 if scale is None else scale), mesh)
    kk = min(k, n_local)
    use_pallas = (
        mesh.devices.flat[0].platform in ("tpu", "axon") and kk <= 128
    )

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(AXIS, None), P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def go(pts_l, y, sc_l):
        if use_pallas:
            p_in = pts_l if stored_width else pts_l.astype(jnp.float32)
            ids_l, dd = exact_knn_pallas(p_in, y, kk,
                                         scale=sc_l if quant else None)
        elif quant:
            # CPU oracle on the identical quantized grid (same ranking as
            # the kernel's int32 quantized-domain arithmetic)
            pd = pts_l.astype(jnp.float32) * sc_l
            yq = jnp.clip(jnp.round(y / sc_l), -127, 127) * sc_l
            ids_l, dd = brute_force_knn(pd, yq, kk,
                                        block=min(block, y.shape[0]))
        else:
            # bf16/f16 stored corpora compute the CPU oracle in f32 over
            # the rounded values (the TPU kernel's semantics: low-precision
            # factors, f32 accumulation); f64 stays f64
            p_in = pts_l if pts_l.dtype == y.dtype else pts_l.astype(y.dtype)
            ids_l, dd = brute_force_knn(p_in, y, kk,
                                        block=min(block, y.shape[0]))
        offset = jax.lax.axis_index(AXIS).astype(itype) * n_local
        gids, dd = _to_global(ids_l.astype(itype), dd, n_local, n, offset)
        all_ids = jnp.moveaxis(jax.lax.all_gather(gids, AXIS), 0, 1).reshape(y.shape[0], -1)
        all_dd = jnp.moveaxis(jax.lax.all_gather(dd, AXIS), 0, 1).reshape(y.shape[0], -1)
        return topk_no_dedup(all_dd, all_ids, k)

    return go(points, queries, sc)


def global_graph_sharded(sidx: ShardedIndex, points, *, mesh: Mesh, **kw):
    """Approximate global kNN graph from a sharded index: query all points
    against every shard and merge — the distributed analogue of the
    reference's precomp output (its graph is single-device only)."""
    ids, dd = search_sharded(sidx, points, points, mesh=mesh, **kw)
    # drop self-matches (distance 0 to itself always wins otherwise)
    n = sidx.n
    m = points.shape[0]
    self_mask = ids == jnp.arange(m, dtype=itype)[:, None]
    dd = jnp.where(self_mask, jnp.inf, dd)
    ids = jnp.where(self_mask, n, ids)
    return topk_no_dedup(dd, ids, sidx.k)

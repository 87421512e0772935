"""Fused exact-kNN Pallas kernel: streaming distances + on-chip top-k.

TPU-first replacement for the reference's brute-force oracle *and* a
first-class exact search mode.  The reference materializes an (n, L, d)
diff tensor and tree-reduces it (``compute_diffs_squared`` +
``add_cols_step``, ``/root/reference/compute.cl:135-167``); the XLA version
(:func:`..ops.distance.brute_force_knn`) materializes an (m, n) distance
matrix in HBM.  This kernel never materializes either: point tiles stream
HBM -> VMEM once, each tile's distances are one MXU matmul
(``qn + pn - 2 q @ tile.T``), and a running top-k per query lives in VMEM
scratch across grid steps — the k-extraction is the same masked-argmin
selection as :func:`..ops.topk.topk_iter`, entirely on the VPU.

HBM traffic: points read exactly once + queries once + (m, k) out.
At (m=1000, n=20000, d=128) that is ~10 MB vs ~80 MB materialized — and
the matmul (5 GFLOP) rides the MXU, so exact search at single-chip scale
runs at memory speed.

Everything is static-shaped; no dynamic gather (unsupported by Mosaic as of
this writing) is used anywhere — per-row argmin extraction uses
masked-reduce instead of ``take_along_axis``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import itype

_NEG1 = -1


def _extract_min(dd: jax.Array, ids: jax.Array):
    """Row minimum of dd and its id, via masked reduce (no gather).

    ``ids`` may be (1, T) and broadcasts against dd (B, T) — keeping it a
    single row avoids materializing a (B, T) id buffer in VMEM.  Ties
    resolve to the smallest id among the minima (deterministic).
    Returns (dmin (B, 1), imin (B, 1)); caller masks out the winner.
    """
    dmin = jnp.min(dd, axis=-1, keepdims=True)
    big = jnp.iinfo(jnp.int32).max
    imin = jnp.min(jnp.where(dd == dmin, ids, big), axis=-1, keepdims=True)
    return dmin, imin


def _dot_split3(a, b, dims):
    """3-pass split-factor f32 dot: each factor splits into hi = bf16(x)
    and lo = bf16(x - hi), and the product keeps the three significant
    cross terms (hi*hi + hi*lo + lo*hi; the dropped lo*lo term is
    ~2^-16 relative).  Three single-pass bf16 MXU dots with f32
    accumulation — the middle ground Mosaic does not expose natively
    (it supports only DEFAULT = 1 pass and HIGHEST = 6 passes; the
    XLA-level Precision.HIGH is this same 3-pass scheme).  Effective
    precision ~16+ mantissa bits vs bf16's 8: neighbor RANKING matches
    full f32 (gated against the f64 oracle in tests and on real TPU),
    at ~half HIGHEST's MXU cost."""
    f32 = jnp.float32
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(f32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(f32)).astype(jnp.bfloat16)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims, preferred_element_type=f32
        )

    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _dist_dot(tile_pts, qb, dims, precision):
    """The distance cross-term dot at the selected precision tier
    ("split3" is the manual 3-pass scheme; everything else is a Mosaic
    precision enum)."""
    if precision == "split3":
        return _dot_split3(tile_pts, qb, dims)
    return jax.lax.dot_general(
        tile_pts, qb, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _auto_tile(n: int, d: int, itemsize: int) -> int:
    """The auto corpus-tile policy (factored so :func:`exact_knn_twophase`
    can derive the same tile the emit kernel will use and keep its segment
    grid consistent with it).  Measured rationale inline at the call site
    in :func:`exact_knn_pallas`."""
    tile = max(512, min(4096, (4 << 20) // (4 * max(d, 64))))
    if n >= (1 << 19) and d <= 128:
        tile = 8192 if itemsize == 4 else 16384
    return min(tile, max(8, n))


def _twophase_tile(tile: int) -> int:
    """Two-phase emit tiles are floored to a power of two: the segment
    grid must divide the tile exactly (the (n_seg, seg, bq) view is a
    reshape — a non-divisible tile, e.g. tile = n = 3001 at small odd n,
    cannot split), and power-of-2 tiles make every power-of-2 seg <=
    tile/8 divide cleanly.  The dropped tail rows just become one more
    (padded) grid step."""
    return max(8, 1 << (tile.bit_length() - 1))


def _effective_twophase_seg(tile: int, seg: int) -> int:
    """Largest segment length <= ``seg`` that divides ``tile`` with an
    8-multiple segment count (the emit kernel's (n_seg, bq) output block
    needs 8-sublane rows).  ONE definition shared by the emit path and
    :func:`exact_knn_twophase` so the selected segment ids always index
    the grid the emit kernel actually used."""
    while seg > 8 and (tile % seg or (tile // seg) % 8):
        seg //= 2
    return max(8, min(seg, max(8, tile // 8)))


# Scoped-VMEM budget for the rescan kernel's (bq, P*seg, d) window scratch
# (storage bytes + the f32 diff block).  The kernel's own vmem_limit adds
# ~10 MB of headroom and clamps at 100 MB, so fits under this budget
# always compile.
_RESCAN_VMEM_BUDGET = 88 << 20

# Max rescan windows per kernel launch (k > 128 chunks its k+pad windows
# at this): bounds the unrolled DMA program at the scale the probe/rescan
# kernels are proven to compile.  Tests shrink it (interpret tracing of a
# 128-window unrolled wave is minutes on CPU; the chunk logic is what
# needs covering).
_RESCAN_MAX_P = 128


def _pick_n_seg(tile: int) -> int:
    """Largest power-of-2 segment count <= 16 whose segments keep full
    8-sublane rows (segments split the OUTER tile axis of the transposed
    (tile, bq) distance block, so the 3D view is a free outer-dim split);
    tiny tiles degenerate to one segment."""
    n_seg = 16
    while n_seg > 1 and (tile % n_seg or (tile // n_seg) % 8):
        n_seg //= 2
    return n_seg


def _rank_insert(nd, ni, cur_d, cur_i, *, k: int):
    """Merge ``n_seg`` candidates (nd, ni — (S, bq)) into the
    SORTED-ascending running top-k (cur_d, cur_i — (k, bq)) in one shot,
    no data-dependent loop.

    Every element's rank in the merged multiset is computed by counting
    (pairwise compares on (k, S, bq)/(S, S, bq) blocks — tiny next to the
    (tile, bq) distance block), then rank < k elements scatter into their
    slot via one-hot masks.  The tie order is a strict total order —
    current entries by slot, then new candidates by (distance, id) — so
    ranks are unique and each output slot gets exactly one contributor.
    Output stays sorted ascending, which keeps the running-worst a slice
    and makes the final emit a plain copy.
    """
    kio = jax.lax.broadcasted_iota(jnp.int32, cur_d.shape, 0)
    # rank of current slot i = i + #{new candidates strictly closer}
    # (i counts the lex-smaller current entries BECAUSE cur is sorted)
    rank_a = kio + jnp.sum(
        (nd[None, :, :] < cur_d[:, None, :]).astype(jnp.int32), axis=1
    )
    # rank of candidate j = #{current <= it} + #{candidates lex-before it}
    cnt_a = jnp.sum(
        (cur_d[:, None, :] <= nd[None, :, :]).astype(jnp.int32), axis=0
    )
    bl, bj = nd[:, None, :], nd[None, :, :]
    il, ij = ni[:, None, :], ni[None, :, :]
    lex_bb = (bl < bj) | ((bl == bj) & (il < ij))
    rank_b = cnt_a + jnp.sum(lex_bb.astype(jnp.int32), axis=0)
    k_out = cur_d.shape[0]
    kio3 = jax.lax.broadcasted_iota(jnp.int32, (k_out, 1, 1), 0)
    eq_a = rank_a[None, :, :] == kio3  # (k, k, bq)
    eq_b = rank_b[None, :, :] == kio3  # (k, S, bq)
    new_d = (
        jnp.sum(jnp.where(eq_a, cur_d[None, :, :], 0.0), axis=1)
        + jnp.sum(jnp.where(eq_b, nd[None, :, :], 0.0), axis=1)
    )
    new_i = (
        jnp.sum(jnp.where(eq_a, cur_i[None, :, :], 0), axis=1)
        + jnp.sum(jnp.where(eq_b, ni[None, :, :], 0), axis=1)
    )
    return new_d, new_i


def _rank_merge(dd, gids, cur_d, cur_i, *, k: int, n_seg: int,
                nd0=None):
    """Fold a tile's distances (TRANSPOSED: (tile, bq)) into the sorted
    running top-k ((k, bq)).

    Replaces the rescan merge (extract one global min per round, write
    +inf over the winner, full-block convergence sweep per round — ~10
    block-sized ops x up-to-k data-dependent rounds).  Here every round
    extracts ``n_seg`` candidates (the per-segment minima of the
    (n_seg, seg, bq) view — a FREE outer-dim split of the transposed
    block; splitting the lane dim instead forces a physical relayout
    whose scratch copies blow the scoped-vmem budget) in ~4 block-sized
    ops and folds them in with :func:`_rank_insert`; improving candidates
    spread across segments, so post-warmup merges converge in one round,
    and a counting test (is any segment's SECOND remaining candidate
    below the new worst?) decides continuation without a wasted
    extraction round.  Later rounds mask the already-extracted
    per-segment prefix lexicographically — the distance block is never
    rewritten.

    ``nd0``: round-1 per-segment minima, when the caller already computed
    them (the kernel's merge trigger needs them anyway — reusing them
    saves one full-block reduce per merging step, and at serving batch
    sizes nearly every step merges).
    """
    tile, bq = dd.shape
    seg = tile // n_seg
    dd3 = dd.reshape(n_seg, seg, bq)
    gids3 = gids.reshape(n_seg, seg, 1)
    # ids are base + position (gids is an iota), so per-segment winner ids
    # come from ARGMIN + index arithmetic — one fused value+index
    # reduction instead of the two-pass where(v == nd)+min id sweep.
    # Tie order is identical: argmin's first-minimum = the smallest local
    # index = the smallest id in the segment (gids increase with
    # position).  The lexicographic round masks still use gids3.
    base0 = gids[0, 0]
    seg_off = jax.lax.broadcasted_iota(jnp.int32, (n_seg, bq), 0) * seg

    def extract(v, nd=None):
        if nd is None:
            nd = jnp.min(v, axis=1)  # (S, bq)
        am = jnp.argmin(v, axis=1).astype(jnp.int32)  # (S, bq)
        ni = base0 + seg_off + am
        return nd, ni

    def more_needed(v, nd, new_d):
        # continue iff some segment still holds a non-extracted entry
        # below the new worst: count entries < worst among the remaining
        # (v is +inf at masked positions), minus the one just extracted
        w1 = new_d[-1:, :]  # (1, bq)
        cnt = jnp.sum((v < w1[:, None, :]).astype(jnp.int32), axis=1)
        return jnp.any(cnt - (nd < w1).astype(jnp.int32) >= 1)

    # round 1: no extraction prefix to mask
    nd, ni = extract(dd3, nd0)
    cur_d, cur_i = _rank_insert(nd, ni, cur_d, cur_i, k=k)
    go = more_needed(dd3, nd, cur_d)

    def body(state):
        it, pd, pid, cd_, ci_, _ = state
        m = (dd3 > pd[:, None, :]) | (
            (dd3 == pd[:, None, :]) & (gids3 > pid[:, None, :])
        )
        v = jnp.where(m, dd3, jnp.inf)
        nd, ni = extract(v)
        cd_, ci_ = _rank_insert(nd, ni, cd_, ci_, k=k)
        return it + 1, nd, ni, cd_, ci_, more_needed(v, nd, cd_)

    def cond(state):
        return (state[0] < k) & state[5]

    _, _, _, out_d, out_i, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), nd, ni, cur_d, cur_i, go)
    )
    return out_d, out_i


def _kernel_rank(q_ref, qn_ref, excl_ref, pts_ref, out_i_ref,
                 out_d_ref, run_d, run_i, *, k: int, n: int,
                 tile: int, n_tiles: int, corpus_major: bool,
                 has_excl: bool, has_pad: bool, precision=None):
    """Transposed-layout kernel for the rank merge: distances live as
    (tile, bq) so segment splits ride the outer dim.  Queries arrive
    pre-transposed ((d, bq) block); outputs leave as (k, bq) blocks of a
    (k, mp) array the host transposes back (tiny).

    CORPUS-MAJOR grid (long streams): (n_tiles, nq_blocks) with the query
    axis fastest, so the point tile's block index is constant across the
    inner steps — Mosaic loads each corpus tile ONCE total (the
    query-major order re-streams the whole corpus per query block;
    measured at 10M x 96: 78 vs 86 ms).  The running top-k for every
    query block lives in a (nq_blocks, k, bq) scratch indexed by the
    query-axis grid position.  Short streams keep query-major: the
    per-step query-block reloads outweigh the corpus savings there
    (measured at 20k: 2.7 vs 2.0 ms).

    VPU passes are what bind this kernel at scale (the (tile, bq)
    distance volume is n x m elements regardless of dtype or tiling), so
    per-step full-block sweeps are minimized: the trigger reduce doubles
    as the merge's round-1 segment extraction (nd0).  Two attributed
    negative results at 10M x 96 / m=1000: (a) a LAZY distance block
    (materialize dd only when some row improves) measured SLOWER — a
    top-k-of-n stream improves some block row on nearly every tile
    (~k·ln(n) improving points per query), so the merge branch always
    runs and laziness just re-derives dd (72.5 vs 59.8 ms f32); (b)
    hoisting point norms into a per-tile scratch written at iq == 0
    also measured slower (the conditional write+read serializes the
    cross-step pipeline), so norms stay inline."""
    if corpus_major:
        t, iq = pl.program_id(0), pl.program_id(1)
    else:
        iq, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        run_d[iq] = jnp.full(run_d.shape[1:], jnp.inf, run_d.dtype)
        run_i[iq] = jnp.full(run_i.shape[1:], n, run_i.dtype)

    qb = q_ref[:]  # (d, B) in the compute dtype
    tile_pts = pts_ref[:]  # (T, d) in the compute dtype
    base = t * tile
    gids = base + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)  # (T, 1)

    # point norms computed in-kernel from the stored tile (one fused
    # upcast-square-sum; exact for int8 since sums stay < 2^24).  The
    # hoisted (np_pad, 1) input the first version streamed instead pads
    # 128x under (8, 128) tiling — 15 GB of HBM at 32M rows.
    # NOTE: hoisting this into a (tile, 1) scratch written at iq == 0
    # (corpus-major: the tile is constant across inner steps) measured
    # SLOWER end-to-end at 10M x 96 — the conditional scratch write +
    # read serializes Mosaic's cross-step pipelining for more than the
    # (tile, d) reduce costs.  Keep it inline.
    ptf = tile_pts.astype(jnp.float32)
    pn = jnp.sum(ptf * ptf, axis=-1, keepdims=True)  # (T, 1) f32
    if jnp.issubdtype(tile_pts.dtype, jnp.integer):
        dots = jax.lax.dot_general(
            tile_pts, qb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = _dist_dot(
            tile_pts, qb, (((1,), (0,)), ((), ())), precision
        )  # (T, B)
    # SCORE domain: dd minus the per-query constant qn.  Rank order per
    # query (and every comparison against the running state, which lives
    # in the same domain) is invariant to a per-column constant, so the
    # streamed hot loop never touches qn; the emit adds it back once on
    # (k, B).  Saves a (T, B) broadcast-add per step when Mosaic doesn't
    # fuse it into the distance FMA.
    dd = pn - 2.0 * dots
    if has_pad:
        # compile-time specialization: when tile | n there are no padding
        # rows and this full (T, B) select disappears.  (Tiles are NOT
        # steered toward divisors of n — that measured slower, see the
        # negative result in exact_knn_pallas — so this triggers only
        # when the power-of-2 tile happens to divide n.)
        dd = jnp.where(gids < n, dd, jnp.inf)
    if has_excl:
        # compile-time specialization: serving passes no exclusions (only
        # the self-excluding graph build does), and this mask is a full
        # (T, B) sweep of mandatory per-step work
        dd = jnp.where(gids == excl_ref[:], jnp.inf, dd)

    # the trigger reduce IS the merge's round-1 segment extraction: one
    # (n_seg, seg, B) min pass yields both the tile minima (trigger) and
    # the round-1 candidates (passed as nd0).  At serving batch sizes a
    # block-wide ``any`` fires on nearly every tile (a top-k-of-n stream
    # has ~k·ln(n) improving points per query, spread across hundreds of
    # tiles), so a separate full-block trigger sweep is pure overhead.
    n_seg = _pick_n_seg(tile)
    nd0 = jnp.min(dd.reshape(n_seg, tile // n_seg, -1), axis=1)  # (S, B)
    run_worst = jnp.max(run_d[iq], axis=0, keepdims=True)  # (1, B)
    any_improves = jnp.any(nd0 < run_worst)

    @pl.when(any_improves)
    def _merge():
        out_d, out_i = _rank_merge(
            dd, gids, run_d[iq], run_i[iq], k=k, n_seg=n_seg, nd0=nd0
        )
        run_d[iq] = out_d
        run_i[iq] = out_i

    @pl.when(t == n_tiles - 1)
    def _emit():
        # the rank merge keeps the running k sorted ascending: the emit is
        # a copy (score domain -> true distance by adding qn back — +inf
        # survives the add), plus the sentinel id for unfilled slots
        d_ = run_d[iq]
        out_d_ref[:] = d_ + qn_ref[:]
        out_i_ref[:] = jnp.where(jnp.isinf(d_), n, run_i[iq])


def _kernel_emit(q_ref, excl_ref, pts_ref, out_d_ref, out_i_ref, *,
                 n: int, tile: int, seg: int, has_excl: bool,
                 has_pad: bool, precision=None):
    """Phase 1 of the TWO-PHASE merge experiment (round-4 VERDICT item 4):
    no running state, no merge, no data-dependent loop — each grid step
    computes the transposed distance block and emits only the
    per-segment minima (value + arg id) of ``seg``-row segments to HBM.
    A tiny phase-2 merge (XLA top-k over the ~(n/seg) candidates per
    query) then selects the final k.

    This deletes the rank-insert machinery from the hot loop entirely;
    per step the mandatory work is the matmul + distance FMA + two
    segment reductions.  FIDELITY CAVEAT: one candidate per segment
    means two true top-k members falling in the same segment lose one
    of them — collision probability per query ~ C(k,2) * seg / n
    (0.05% at k=10, seg=512, n=10M); measured, not assumed, in the A/B
    (scripts/exp_twophase.py).  Exactness would need a rescan phase of
    segments below the merged threshold; built only if the emit shape
    wins (see BASELINE.md round-4 two-phase section for the verdict).
    """
    t = pl.program_id(0)  # corpus-major: reuse the resident tile
    qb = q_ref[:]  # (d, B)
    tile_pts = pts_ref[:]
    base = t * tile
    gids = base + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    ptf = tile_pts.astype(jnp.float32)
    pn = jnp.sum(ptf * ptf, axis=-1, keepdims=True)
    if jnp.issubdtype(tile_pts.dtype, jnp.integer):
        dots = jax.lax.dot_general(
            tile_pts, qb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = _dist_dot(
            tile_pts, qb, (((1,), (0,)), ((), ())), precision
        )
    dd = pn - 2.0 * dots  # score domain (qn added once in phase 2)
    if has_pad:
        dd = jnp.where(gids < n, dd, jnp.inf)
    if has_excl:
        dd = jnp.where(gids == excl_ref[:], jnp.inf, dd)
    n_seg2 = tile // seg
    dd3 = dd.reshape(n_seg2, seg, -1)
    nd = jnp.min(dd3, axis=1)  # (n_seg2, B)
    am = jnp.argmin(dd3, axis=1).astype(jnp.int32)
    seg_off = jax.lax.broadcasted_iota(jnp.int32, am.shape, 0) * seg
    out_d_ref[:] = nd
    out_i_ref[:] = base + seg_off + am


def _kernel(q_ref, qn_ref, excl_ref, pts_ref, pn_ref, out_i_ref, out_d_ref,
            run_d, run_i, *, k: int, n: int, tile: int, n_tiles: int,
            precision=None):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        run_d[:] = jnp.full(run_d.shape, jnp.inf, run_d.dtype)
        run_i[:] = jnp.full(run_i.shape, n, run_i.dtype)

    qb = q_ref[:]  # (B, d) in the compute dtype
    tile_pts = pts_ref[:]  # (T, d) in the compute dtype
    base = t * tile
    gids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)  # (1, T)

    # pn is precomputed in f32 from the UNROUNDED points (one pass over n,
    # hoisted out of the kernel — the in-kernel form recomputed it per
    # query block); the MXU dot accumulates in f32 whatever the input
    # dtype, so bf16 inputs only round the factors, not the sums.
    pn = pn_ref[:]  # (1, T) f32
    if jnp.issubdtype(tile_pts.dtype, jnp.integer):
        # int8 storage tier: the MXU's native int8 path — int32
        # accumulation is exact, and the whole distance stays in the
        # quantized domain (qn/pn are quantized-unit norms, the caller
        # rescales outputs by scale^2).  |dd| <= 4*d*127^2 < 2^24 for
        # d <= 128, so the f32 cast below is exact too.
        dots = jax.lax.dot_general(
            qb, tile_pts,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = _dist_dot(
            qb, tile_pts, (((1,), (1,)), ((), ())), precision
        )  # (B, T)
    dd = qn_ref[:] + pn - 2.0 * dots
    # padding rows (global id >= n) and self-exclusions -> +inf
    dd = jnp.where(gids < n, dd, jnp.inf)
    dd = jnp.where(gids == excl_ref[:], jnp.inf, dd)

    # fast path: once the running top-k is warm, most tiles contain no
    # candidate that beats any row's current worst — one min/max sweep
    # detects that and skips the merge entirely; and when a tile does
    # improve some rows, a while-loop runs only as many insert rounds as
    # candidates actually beat the running worst (post-warmup: usually 1,
    # worst case k) instead of always k.  This is what keeps the VPU from
    # binding the kernel: the mandatory per-tile cost is one min sweep.
    tile_min = jnp.min(dd, axis=-1, keepdims=True)  # (B, 1)
    run_worst = jnp.max(run_d[:], axis=-1, keepdims=True)  # (B, 1)
    any_improves = jnp.any(tile_min < run_worst)

    @pl.when(any_improves)
    def _merge():
        kiota = jax.lax.broadcasted_iota(jnp.int32, run_d.shape, 1)
        big = jnp.iinfo(jnp.int32).max

        def insert(state):
            it, dd_, cur_d, cur_i = state
            dmin, imin = _extract_min(dd_, gids)
            wmax = jnp.max(cur_d, axis=-1, keepdims=True)
            # the worst running slot (ties -> smallest slot index)
            wslot = jnp.min(jnp.where(cur_d == wmax, kiota, big), axis=-1,
                            keepdims=True)
            hit = (dmin < wmax) & (kiota == wslot)
            cur_d = jnp.where(hit, dmin, cur_d)
            cur_i = jnp.where(hit, imin, cur_i)
            dd_ = jnp.where(gids == imin, jnp.inf, dd_)
            return it + 1, dd_, cur_d, cur_i

        if n_tiles <= 8:
            # few tiles: most steps merge anyway — unrolled k rounds beat
            # the while-loop's per-round convergence re-check
            state = (jnp.int32(0), dd, run_d[:], run_i[:])
            for _ in range(k):
                state = insert(state)
            _, _, out_d, out_i = state
        else:
            # long streams: post-warmup a tile rarely beats more than one
            # running slot — run only as many insert rounds as candidates
            # actually improve (worst case k)
            def cond(state):
                it, dd_, cur_d, _ = state
                still = jnp.any(
                    jnp.min(dd_, axis=-1, keepdims=True)
                    < jnp.max(cur_d, axis=-1, keepdims=True)
                )
                return (it < k) & still

            _, _, out_d, out_i = jax.lax.while_loop(
                cond, insert, (jnp.int32(0), dd, run_d[:], run_i[:])
            )
        run_d[:] = out_d
        run_i[:] = out_i

    @pl.when(t == n_tiles - 1)
    def _emit():
        # ascending extraction of the running k (k more selection rounds)
        d_, i_ = run_d[:], run_i[:]
        outs_d, outs_i = [], []
        for _ in range(k):
            dmin, imin = _extract_min(d_, i_)
            # an all-inf row matches every entry in the masked reduce;
            # emit the sentinel id there, not the smallest leftover id
            imin = jnp.where(jnp.isinf(dmin), n, imin)
            outs_d.append(dmin)
            outs_i.append(imin)
            d_ = jnp.where(i_ == imin, jnp.inf, d_)
        out_d_ref[:] = jnp.concatenate(outs_d, axis=-1)
        out_i_ref[:] = jnp.concatenate(outs_i, axis=-1)


def _stream_kernel(q_ref, qn_ref, excl_ref, pts_hbm, pn_hbm, out_i_ref,
                   out_d_ref, run_d, run_i, pts_buf, pn_buf, sems, *, k: int,
                   n: int, tile: int, n_tiles: int, last_div: int,
                   n_buf: int, precision=None):
    """Streaming variant of :func:`_kernel`: the grid covers query blocks
    only, and the point tiles are hand-DMA'd HBM->VMEM with double
    buffering inside a ``fori_loop``.

    Hypothesis tested (rule 11, CLAUDE.md): if grid steps cost ~tens of
    us each, the (nq_blocks, n_tiles) grid of the block-pipelined kernel
    would pay ~15 ms of step overhead at 1M x 128.  REFUTED on real TPU:
    this kernel measures 0.83-0.97x the grid kernel's throughput at
    every (tile, query_block) that compiles (scripts/sweep_exact_stream
    .py, 2026-08-19) — steps *within* a compiled grid are cheap and
    Mosaic already double-buffers the corpus blocks; rule 11's cost is
    per pallas_call dispatch.  Kept (default-off) as the documented
    negative result and as the minimal testbed for the in-kernel DMA
    idioms the probe kernel relies on.

    DMA offsets must be PROVABLY tile-aligned (rule 14): every tile
    starts at ``128 * off128(i)`` — a constant multiple of 128 rows,
    which satisfies f32 (8), bf16 (16) and int8 (32) sublane tiling at
    once.  The caller guarantees the corpus row count is a multiple of
    128; the last tile starts at ``n_rows - tile`` (also 128-aligned)
    and *overlaps* the previous one — the overlap is masked out via
    ``gid >= i * tile`` so no candidate is scored twice.
    """
    run_d[:] = jnp.full(run_d.shape, jnp.inf, run_d.dtype)
    run_i[:] = jnp.full(run_i.shape, n, run_i.dtype)
    qb = q_ref[:]
    qn = qn_ref[:]
    excl = excl_ref[:]
    quant = jnp.issubdtype(pts_buf.dtype, jnp.integer)

    def off128(i):
        return jnp.minimum(i * (tile // 128), last_div)

    def pts_dma(slot, i):
        return pltpu.make_async_copy(
            pts_hbm.at[pl.ds(off128(i) * 128, tile), :],
            pts_buf.at[slot],
            sems.at[0, slot],
        )

    def pn_dma(slot, i):
        return pltpu.make_async_copy(
            pn_hbm.at[:, pl.ds(off128(i) * 128, tile)],
            pn_buf.at[slot],
            sems.at[1, slot],
        )

    # warm-up: n_buf - 1 tiles in flight before the loop.  A single tile
    # DMA costs ~60 us issue-to-completion on this runtime — latency, not
    # bandwidth (4 MB would take ~5 us at HBM speed) — so two buffers
    # serialize on that latency (measured 69 GB/s effective at 1M).
    # Deep buffering keeps n_buf - 1 copies in flight, dividing the
    # latency by the depth; the probe kernel already runs waves of
    # hundreds of concurrent DMAs, so the engine parallelism is there.
    for w in range(n_buf - 1):
        if w < n_tiles:  # static when n_tiles is small
            pts_dma(w, w).start()
            pn_dma(w, w).start()
    kiota = jax.lax.broadcasted_iota(jnp.int32, run_d.shape, 1)
    big = jnp.iinfo(jnp.int32).max

    def loop_body(t, _):
        cur = jax.lax.rem(t, n_buf)

        @pl.when(t + n_buf - 1 < n_tiles)
        def _prefetch():
            nxt = jax.lax.rem(t + n_buf - 1, n_buf)
            pts_dma(nxt, t + n_buf - 1).start()
            pn_dma(nxt, t + n_buf - 1).start()

        pts_dma(cur, t).wait()
        pn_dma(cur, t).wait()
        tile_pts = pts_buf[cur]
        pn = pn_buf[cur]  # (1, tile) f32
        base = off128(t) * 128
        gids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        if quant:
            dots = jax.lax.dot_general(
                qb, tile_pts,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            dots = _dist_dot(
                qb, tile_pts, (((1,), (1,)), ((), ())), precision
            )
        # Mandatory per-tile VPU work is exactly TWO (bq, tile) sweeps —
        # one fused multiply-add and one max-reduce.  dd = qn - s with
        # s = 2*dots - pn, so min(dd) = qn - max(s); the full distance
        # block (and all its masks) is only materialized in the rare
        # merge branch.  Unmasked pad/overlap/self rows can only
        # FALSE-TRIGGER a merge (their masked dd is +inf inside), never
        # suppress one: masking only raises dd.
        s = 2.0 * dots - pn  # (bq, tile)
        smax = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        run_worst = jnp.max(run_d[:], axis=-1, keepdims=True)

        @pl.when(jnp.any(qn - smax < run_worst))
        def _merge():
            dd = qn - s
            # rows already covered by a previous tile (the overlapping
            # last tile), padding rows (gid >= n), self-exclusions -> +inf
            dd = jnp.where(gids >= t * tile, dd, jnp.inf)
            dd = jnp.where(gids < n, dd, jnp.inf)
            dd = jnp.where(gids == excl, jnp.inf, dd)
            def insert(state):
                it, dd_, cur_d, cur_i = state
                dmin, imin = _extract_min(dd_, gids)
                wmax = jnp.max(cur_d, axis=-1, keepdims=True)
                wslot = jnp.min(jnp.where(cur_d == wmax, kiota, big),
                                axis=-1, keepdims=True)
                hit = (dmin < wmax) & (kiota == wslot)
                cur_d = jnp.where(hit, dmin, cur_d)
                cur_i = jnp.where(hit, imin, cur_i)
                dd_ = jnp.where(gids == imin, jnp.inf, dd_)
                return it + 1, dd_, cur_d, cur_i

            def cond(state):
                it, dd_, cur_d, _ = state
                still = jnp.any(
                    jnp.min(dd_, axis=-1, keepdims=True)
                    < jnp.max(cur_d, axis=-1, keepdims=True)
                )
                return (it < k) & still

            _, _, out_d, out_i = jax.lax.while_loop(
                cond, insert, (jnp.int32(0), dd, run_d[:], run_i[:])
            )
            run_d[:] = out_d
            run_i[:] = out_i

    jax.lax.fori_loop(0, n_tiles, loop_body, None)

    # ascending extraction of the running k
    d_, i_ = run_d[:], run_i[:]
    outs_d, outs_i = [], []
    for _ in range(k):
        dmin, imin = _extract_min(d_, i_)
        imin = jnp.where(jnp.isinf(dmin), n, imin)
        outs_d.append(dmin)
        outs_i.append(imin)
        d_ = jnp.where(i_ == imin, jnp.inf, d_)
    out_d_ref[:] = jnp.concatenate(outs_d, axis=-1)
    out_i_ref[:] = jnp.concatenate(outs_i, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile", "query_block", "interpret", "compute_dtype", "stream",
        "merge", "matmul_precision", "twophase_seg",
    ),
)
def exact_knn_pallas(
    points: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    exclude: jax.Array | None = None,
    tile: int | None = None,
    query_block: int | None = None,
    interpret: bool = False,
    compute_dtype=None,
    scale: jax.Array | None = None,
    stream: bool | None = None,
    merge: str = "rank",
    matmul_precision: str = "highest",
    twophase_seg: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest neighbors, fused streaming kernel.

    points (n, d), queries (m, d); optional ``exclude`` (m,) int32 point id
    to skip per query (the kNN-graph self-exclusion; -1 = none).  Returns
    (ids (m, k) int32 ascending by distance, squared distances (m, k)),
    sentinel id = n past the real candidates.  ``interpret=True`` runs the
    identical kernel on CPU (how the tests validate it without a TPU).

    ``compute_dtype``: dtype the MXU dot runs in (default float32).
    ``jnp.bfloat16`` halves the point-stream bytes and raises the MXU rate
    several-fold on TPU; accumulation stays f32.  The default rank path
    computes point norms in-kernel from the values it streams (for a
    STORED bf16/int8 corpus that is exactly the stored data; under an
    in-jit ``compute_dtype`` conversion the norms see the rounded
    factors) — at 1M-scale the nearest-neighbor sets are near-identical
    to f32 either way (gated by tests/test_pallas.py).

    ``matmul_precision``: MXU precision of the f32 distance dot —
    "highest" (default), "split3", or "default".  TPU's DEFAULT matmul
    precision truncates f32 factors to bf16 in a single MXU pass, which
    misranks ~0.5% of neighbor ids against the true f32 distances
    (measured vs an f64 oracle at 20k x 128 — the round-3
    parity-arbitration finding); an engine named *exact* defaults to
    actually-exact HIGHEST (6-pass) at ~1.9x the f32 kernel time.
    "split3" (round 4) is the manual 3-pass split-factor scheme
    (:func:`_dot_split3`): ~16+ effective mantissa bits — neighbor
    ranking matches full f32 (f64-oracle-gated) at roughly half
    HIGHEST's MXU cost where the matmul binds.  Speed-first callers can
    pass "default" explicitly — or better, store the corpus bf16/int8:
    those tiers' single-pass products are exact at storage width, so
    they are both faster AND no less faithful than f32-at-default was.
    Ignored for integer (int8) corpora.

    ``merge``: running top-k maintenance style — "rank" (default; sorted
    running state, n_seg-way segment extraction + counting-rank insert,
    corpus-major grid on long streams) or "rescan" (the round-1 form:
    one global-min extraction per round with block rewrites).  Identical
    results; rank measured 1.07-1.7x faster everywhere (BASELINE.md).
    "twophase" (round-4, EXPERIMENTAL) emits only per-``twophase_seg``
    segment minima and merges in XLA — near-floor per-step cost but NOT
    exact when two true top-k members share a segment (collision
    ~C(k,2)*seg/n per query; see :func:`_kernel_emit` and the A/B in
    scripts/exp_twophase.py).

    **int8 storage tier**: ``points`` int8 with ``scale`` (the () f32
    symmetric-quantization step, rows = round(x / scale) in [-127, 127],
    as produced by :func:`quantize_corpus`) streams the corpus at 1/4 the
    f32 bytes (4x corpus capacity per chip) and rides the MXU's native
    int8 path.  Queries are quantized with the same scale, the whole
    distance runs exactly in the quantized domain (int32 dots, integer
    norms — no rounding after quantization), and outputs are rescaled by
    scale^2.  Exact over the quantized values; recall vs the
    full-precision oracle is gated by tests/test_pallas.py.
    """
    n, d = points.shape
    m = queries.shape[0]
    if k > 128 and merge != "twophase":
        # the twophase merge selects in XLA (lax.top_k past 128), not the
        # unrolled in-kernel loop — it is how exact_search serves k > 128
        raise ValueError("exact_knn_pallas supports k <= 128 (unrolled selection)")
    f32 = jnp.float32
    quant = points.dtype == jnp.int8
    if quant:
        if scale is None:
            raise ValueError(
                "int8 corpus requires its quantization scale "
                "(see quantize_corpus)"
            )
        cdt = jnp.dtype(jnp.int8)
        # same-scale quantization keeps the quantized-domain distance an
        # exact scale^2 multiple of the dequantized one (cross term and
        # both norms all scale together); values are integers held in f32
        # until the final int8 cast below (astype would truncate raw floats)
        queries = jnp.clip(
            jnp.round(queries.astype(f32) / scale), -127, 127
        )
    elif compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
    elif points.dtype in (jnp.bfloat16, jnp.float16):
        # a low-precision *stored* corpus already rounded the factors;
        # streaming it at storage width halves HBM reads and never
        # materializes an f32 copy (2x corpus capacity per chip — the
        # exact engine's scale axis).  Accumulation stays f32 either way.
        cdt = jnp.dtype(points.dtype)
    else:
        cdt = jnp.dtype(f32)
    # keep the corpus at storage width; the kernel streams it in cdt and
    # the norm reduce below upcasts per-element inside the fused reduction
    pts_c = points if points.dtype == cdt else points.astype(cdt)
    queries = queries.astype(f32)
    has_excl = exclude is not None
    if exclude is None:
        exclude = jnp.full((m,), _NEG1, jnp.int32)
    exclude = exclude.astype(jnp.int32)

    if tile is None:
        # minimize grid steps (each costs ~tens of us) within VMEM: the
        # (query_block, tile) distance block and the double-buffered
        # (tile, d) point tiles are the big tenants.  Measured on v5e at
        # (m=1000, n=200k, d=128): tile 4096/block 256 -> 6.2 ms, vs 41 ms
        # at tile 512 — 5.5x faster than the XLA-fused brute force.  At
        # n >= 512k the grid is step-count-bound, so the tile grows to
        # 8192 (VMEM: dd block 256x8192 f32 = 8 MB, tiles 2x4 MB); see
        # _auto_tile.  Sub-4-byte storage halves/quarters the tile
        # stream, so the step count binds sooner: 16384 measured 52.1 vs
        # 64.0 ms for bf16 at 10M (scripts/exp_int8_tiles.py).
        # NEGATIVE RESULT (round 3): snapping the auto tile to a nearby
        # divisor of n — so has_pad=False drops the per-step padding-row
        # select — measured 12% SLOWER at 10M x 96 bf16 (tile 16000:
        # 51.96 ms vs 16384: 46.46; 20000: 54.97).  Non-power-of-2 tiles
        # cost Mosaic more than the saved (tile, bq) select sweep; tiles
        # stay power-of-2 and has_pad stays data-driven (free whenever
        # the tile happens to divide n, e.g. n = 2^20).
        tile = _auto_tile(n, d, cdt.itemsize)
    if query_block is None:
        # the rank merge's VMEM appetite (~10 tile-sized stack blocks at a
        # generous budget) caps tile*bq near 2M f32 elements; bq=256 at
        # tile=8192 measured faster than bq=512 anyway (fewer rounds per
        # merge: the round count is a max over the block's rows)
        query_block = (
            256 if merge in ("rank", "twophase")
            else 512 if (n >= (1 << 19) and d <= 128) else 256
        )
    tile = min(tile, max(8, n))
    n_tiles = math.ceil(n / tile)
    bq = min(query_block, m)
    nq_blocks = math.ceil(m / bq)
    mp = nq_blocks * bq

    # validate BEFORE any kernel path runs (the stream path returns
    # early; a typo'd precision must raise, not silently rank bf16)
    if matmul_precision not in ("highest", "default", "split3"):
        raise ValueError(
            f"matmul_precision must be 'highest', 'split3' or 'default', "
            f"got {matmul_precision!r}"
        )
    # only the f32 path has a precision choice: bf16/f16 factors are
    # already storage-rounded (single pass is exact over them), int8
    # rides the integer path (int32 accumulation, exact)
    f32_path = cdt.itemsize == 4 and not jnp.issubdtype(cdt, jnp.integer)
    if matmul_precision == "split3" and f32_path:
        mxu_prec = "split3"  # manual 3-pass scheme (_dot_split3)
    elif matmul_precision == "highest" and f32_path:
        mxu_prec = jax.lax.Precision.HIGHEST
    else:
        mxu_prec = jax.lax.Precision.DEFAULT

    # streaming path (grid = query blocks only; corpus tiles hand-DMA'd,
    # double-buffered): pays one grid step per query block instead of
    # n_tiles of them.  MEASURED SLOWER than the grid kernel at 1M x 128
    # across the whole (tile, query_block) envelope that compiles
    # (best 21.2 ms vs 20.5 ms grid; scripts/sweep_exact_stream.py,
    # 2026-08-19): Mosaic's automatic grid pipelining already
    # double-buffers the corpus DMA, so the hand-rolled loop only adds
    # VMEM pressure — rule 11's per-step cost applies to pallas_call
    # dispatches, not steps *within* a compiled grid.  Default OFF;
    # kept as an explicit option (the in-kernel DMA machinery is the
    # probe kernel's testbed).  Requires the corpus row count to be a
    # 128-multiple (provable DMA offsets for every sublane tiling);
    # non-aligned corpora pad here when the copy is cheap.
    pad_rows_128 = (-n) % 128
    if stream is None:
        stream = False
    if stream and (
        n < 128
        or (pad_rows_128 and n * d * cdt.itemsize > (2 << 30))
        # padding a >2 GB corpus per call is worse than step overhead
    ):
        stream = False
    if stream:
        n_rows = n + pad_rows_128
        tile = min(max(128, 128 * (tile // 128)), n_rows)
        if pad_rows_128:
            pts_c = jnp.pad(pts_c, [(0, pad_rows_128), (0, 0)])
        n_tiles = math.ceil(n_rows / tile)

    def pad_rows(a, value):
        if a.shape[0] == mp:
            return a
        w = [(0, mp - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, w, constant_values=value)

    qp = pad_rows(queries, 0.0)
    qn = jnp.sum(qp * qp, axis=-1, keepdims=True)
    ep = pad_rows(exclude[:, None], _NEG1)
    # norms in f32 from the stored values (upcast fuses into the reduce;
    # no widened corpus copy), padded to the tile grid so the (1, tile)
    # block never reads out of bounds.  The rank path computes norms
    # in-kernel instead (no layout that avoids tiling blow-up exists for
    # a hoisted per-point column in the transposed kernel).
    if stream or merge != "rank":
        pf = points.astype(f32)
        pn_full = jnp.sum(pf * pf, axis=-1)[None, :]
        np_pad = (n + pad_rows_128) if stream else n_tiles * tile
        if np_pad != n:
            pn_full = jnp.pad(pn_full, [(0, 0), (0, np_pad - n)])

    if stream:
        n_rows = n + pad_rows_128
        # pipeline depth: enough in-flight copies to hide the ~60 us
        # per-DMA latency behind compute; capped by the tile count
        n_buf = max(2, min(8, n_tiles))
        kernel = functools.partial(
            _stream_kernel, k=k, n=n, tile=tile, n_tiles=n_tiles,
            last_div=(n_rows - tile) // 128, n_buf=n_buf,
            precision=mxu_prec,
        )
        out_i, out_d = pl.pallas_call(
            kernel,
            grid=(nq_blocks,),
            in_specs=[
                pl.BlockSpec((bq, d), lambda qb_: (qb_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda qb_: (qb_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda qb_: (qb_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((bq, k), lambda qb_: (qb_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, k), lambda qb_: (qb_, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((mp, k), jnp.int32),
                jax.ShapeDtypeStruct((mp, k), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, k), f32),
                pltpu.VMEM((bq, k), jnp.int32),
                pltpu.VMEM((n_buf, tile, d), cdt),
                pltpu.VMEM((n_buf, 1, tile), f32),
                pltpu.SemaphoreType.DMA((2, n_buf)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    3 * bq * tile * 4
                    + n_buf * tile * d * cdt.itemsize
                    + n_buf * 8 * tile * 4
                    + 2 * bq * (d + 16 * k + 8) * 4
                    + (12 << 20),
                    100 << 20,
                ),
            ),
            interpret=interpret,
        )(qp.astype(cdt), qn, ep, pts_c, pn_full)
        ids = out_i[:m].astype(itype)
        dd = out_d[:m]
        if quant:
            dd = dd * (scale * scale).astype(f32)
        return ids, dd

    if merge not in ("rank", "rescan", "twophase"):
        raise ValueError(f"unknown merge style {merge!r}")
    # the default 16 MB scoped-vmem budget caps tile*bq well below what
    # the 128 MB VMEM allows; size the limit from the actual tenants
    vmem_limit = min(
        # rank merge: the (n_seg, seg, bq) view + the mask/select
        # temporaries.  The stack allocator's demand GROWS with the
        # budget (measured: wants 34.5 MB under a 32.6 limit, 44.1
        # under 36.6) — give it generous headroom instead of chasing
        # the minimum; rescan: 2 live (bq, tile) blocks through the
        # while carry
        (8 if merge == "rank" else 2) * bq * tile * 4
        + 2 * tile * d * cdt.itemsize
        # selection state: running (bq, k) pairs, the emit-phase
        # slices, and while-carry duplicates (measured: k=100 at
        # bq=512/tile=8192 needs ~52 MB total).  20 MB headroom: the
        # argmin extraction's fused value+index reduction raises the
        # stack demand at small bq (measured 55.6 MB needed at
        # bq=64/tile=16384 vs 50 MB under the old 12 MB headroom)
        + 2 * bq * (d + 16 * k + 8) * 4
        + (20 << 20),
        110 << 20,
    )
    if merge == "twophase":
        # EXPERIMENTAL (round-4 item 4): emit per-segment minima only,
        # merge in XLA.  See _kernel_emit for the fidelity caveat; A/B
        # in scripts/exp_twophase.py.
        tile = _twophase_tile(tile)
        n_tiles = math.ceil(n / tile)
        seg = _effective_twophase_seg(tile, twophase_seg)
        n_seg2 = tile // seg
        kernel = functools.partial(
            _kernel_emit, n=n, tile=tile, seg=seg, has_excl=has_excl,
            has_pad=(n_tiles * tile != n), precision=mxu_prec,
        )
        out_d_c, out_i_c = pl.pallas_call(
            kernel,
            grid=(n_tiles, nq_blocks),  # corpus-major (stateless steps)
            in_specs=[
                pl.BlockSpec((d, bq), lambda t, iq: (0, iq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq), lambda t, iq: (0, iq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda t, iq: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_seg2, bq), lambda t, iq: (t, iq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_seg2, bq), lambda t, iq: (t, iq),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * n_seg2, mp), f32),
                jax.ShapeDtypeStruct((n_tiles * n_seg2, mp), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit,
            ),
            interpret=interpret,
        )(qp.astype(cdt).T, ep.T, pts_c)
        from .topk import topk_no_dedup

        # phase 2: k-th order statistics of the ~(n/seg) per-query
        # candidates; segment ids are unique by construction
        dd_c = out_d_c.T + qn  # score -> true squared distance
        ids_c = out_i_c.T
        ids2, dd2 = topk_no_dedup(dd_c, ids_c, k)
        ids = jnp.where(jnp.isinf(dd2[:m]), n, ids2[:m]).astype(itype)
        dd = dd2[:m]
        if quant:
            dd = dd * (scale * scale).astype(f32)
        return ids, dd

    if merge == "rank":
        # transposed layout: distances live (tile, bq) in-kernel so the
        # segment view splits the outer dim (free); queries go in
        # pre-transposed and the (k, mp) outputs transpose back (tiny)
        # corpus-major (query blocks iterate fastest; each point tile
        # DMA'd once total) pays off once the corpus stream is long;
        # short streams lose more to per-step query-block reloads
        corpus_major = n_tiles >= 32
        kernel = functools.partial(
            _kernel_rank, k=k, n=n, tile=tile, n_tiles=n_tiles,
            corpus_major=corpus_major, has_excl=has_excl,
            has_pad=(n_tiles * tile != n), precision=mxu_prec,
        )
        if corpus_major:
            grid = (n_tiles, nq_blocks)

            def qmap(t, iq):
                return (0, iq)

            def pmap(t, iq):
                return (t, 0)
        else:
            grid = (nq_blocks, n_tiles)

            def qmap(iq, t):
                return (0, iq)

            def pmap(iq, t):
                return (t, 0)

        out_i_t, out_d_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((d, bq), qmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq), qmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq), qmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), pmap, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, bq), qmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bq), qmap, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((k, mp), jnp.int32),
                jax.ShapeDtypeStruct((k, mp), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nq_blocks, k, bq), f32),
                pltpu.VMEM((nq_blocks, k, bq), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit,
            ),
            interpret=interpret,
        )(qp.astype(cdt).T, qn.T, ep.T, pts_c)
        out_i, out_d = out_i_t.T, out_d_t.T
    else:
        kernel = functools.partial(
            _kernel, k=k, n=n, tile=tile, n_tiles=n_tiles,
            precision=mxu_prec,
        )
        out_i, out_d = pl.pallas_call(
            kernel,
            grid=(nq_blocks, n_tiles),
            in_specs=[
                pl.BlockSpec((bq, d), lambda qb, t: (qb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda qb, t: (qb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda qb, t: (qb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda qb, t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda qb, t: (0, t), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bq, k), lambda qb, t: (qb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, k), lambda qb, t: (qb, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((mp, k), jnp.int32),
                jax.ShapeDtypeStruct((mp, k), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, k), f32),
                pltpu.VMEM((bq, k), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit,
            ),
            interpret=interpret,
        )(qp.astype(cdt), qn, ep, pts_c, pn_full)
    ids = out_i[:m].astype(itype)
    dd = out_d[:m]
    if quant:
        # quantized-domain -> true squared distances (+inf survives)
        dd = dd * (scale * scale).astype(f32)
    # exhausted rows (k > n etc.) already carry (n, +inf)
    return ids, dd


def _kernel_rescan(q_ref, ss_ref, sv_ref, so_ref, pts_hbm, out_i_ref,
                   out_d_ref, win, sems, *, k: int, n: int, seg: int,
                   P: int, bq: int, P_wave: int, align: int,
                   emit_all: bool):
    """Phase 3 of the exact two-phase engine: DMA each query's selected
    segments (P windows of ``seg`` rows) HBM->VMEM and select the final
    top-k on-chip.  The XLA-gather form of this phase measured ~70 ms at
    10M (6.1M rows through the gather wall, rule 9); window DMAs read
    the same rows at HBM speed.  Same wave-issued copy pattern, SMEM
    pre-divided offsets, and dedup-by-position selection as the probe
    kernel (``ops/pallas_probe.py``).

    ``emit_all`` (the k > 128 envelope, round-5): skip the unrolled
    in-kernel selection entirely — mask each window to its ORIGINAL
    segment's row range (``so_ref``, raw starts; disjoint by
    construction, so no position can appear twice) and emit the full
    (bq, L) distance + position blocks to HBM for an XLA ``lax.top_k``.
    The unrolled k-round loop would not compile past ~128 rounds and
    its VMEM selection state scales with k; the emit form is
    k-independent."""
    def copy(qq, p, p0):
        s = ss_ref[qq, p] * align
        return pltpu.make_async_copy(
            pts_hbm.at[pl.ds(s, seg), :],
            win.at[qq, pl.ds(p * seg, seg), :],
            sems.at[qq, p - p0],
        )

    for p0 in range(0, P, P_wave):
        p1 = min(p0 + P_wave, P)
        for qq in range(bq):
            for p in range(p0, p1):
                copy(qq, p, p0).start()
        for qq in range(bq):
            for p in range(p0, p1):
                copy(qq, p, p0).wait()

    qv = q_ref[:].astype(jnp.float32)  # (bq, d)
    w = win[:].astype(jnp.float32)  # (bq, L, d), L = P*seg
    diff = w - qv[:, None, :]
    dd = jnp.sum(diff * diff, axis=-1)  # (bq, L)

    # global row ids per lane: window p's lane j holds s_p + (j - p*seg).
    # Clamped windows can overlap -> duplicate positions; the masked-min
    # loop below dedups by position exactly as the probe kernel does.
    sv = sv_ref[:] * align  # (bq, P)
    L = P * seg
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    pos = jnp.zeros((bq, L), jnp.int32)
    for p in range(P):
        pos = jnp.where(
            (j >= p * seg) & (j < (p + 1) * seg),
            sv[:, p:p + 1] + (j - p * seg),
            pos,
        )

    if emit_all:
        # mask to the ORIGINAL segment ranges (disjoint, so the emitted
        # positions are duplicate-free and the XLA selection needs no
        # dedup; exhausted windows carry so = n and mask out entirely)
        so = so_ref[:]  # (bq, P) raw original starts
        valid = jnp.zeros((bq, L), jnp.bool_)
        for p in range(P):
            in_w = (j >= p * seg) & (j < (p + 1) * seg)
            valid = valid | (
                in_w & (pos >= so[:, p:p + 1])
                & (pos < so[:, p:p + 1] + seg)
            )
        out_d_ref[:] = jnp.where(valid & (pos < n), dd, jnp.inf)
        out_i_ref[:] = pos
        return

    dd = jnp.where(pos < n, dd, jnp.inf)
    big = jnp.iinfo(jnp.int32).max
    d_, p_ = dd, pos
    outs_d, outs_p = [], []
    for _ in range(k):
        dmin = jnp.min(d_, axis=-1, keepdims=True)
        pmin = jnp.min(jnp.where(d_ == dmin, p_, big), axis=-1,
                       keepdims=True)
        pmin = jnp.where(jnp.isinf(dmin), n, pmin)
        outs_d.append(dmin)
        outs_p.append(pmin)
        d_ = jnp.where(p_ == pmin, jnp.inf, d_)
    out_d_ref[:] = jnp.concatenate(outs_d, axis=-1)
    out_i_ref[:] = jnp.concatenate(outs_p, axis=-1)


def _rescan_pallas(points, queries, seg_starts, k: int, *, seg: int,
                   interpret: bool, orig_starts=None):
    """Run :func:`_kernel_rescan` over per-query align-clamped segment
    starts (``seg_starts`` (m, P) int32, already align-divisible and in
    [0, n_floor - seg]).  Returns (ids (m, k), dists (m, k)) ascending,
    sentinel n.

    With ``orig_starts`` ((m, P) int32 raw original segment starts, n for
    exhausted windows) the kernel runs in emit-all mode instead: returns
    (positions (m, L), distances (m, L)) with every lane outside its
    original segment masked to +inf — the k-independent form the k > 128
    path selects from in XLA."""
    n, d = points.shape
    m, P = seg_starts.shape
    emit_all = orig_starts is not None
    csize = jnp.dtype(points.dtype).itemsize
    align = {4: 8, 2: 16, 1: 32}[csize]
    bq = 16
    while bq > 8 and P * seg * d * (csize + 4) * bq > _RESCAN_VMEM_BUDGET:
        bq //= 2
    P_wave = max(1, 384 // bq)
    nq_blocks = math.ceil(m / bq)
    mp = nq_blocks * bq
    if mp != m:
        queries = jnp.pad(queries, [(0, mp - m), (0, 0)])
        seg_starts = jnp.pad(seg_starts, [(0, mp - m), (0, 0)])
        if emit_all:
            # padded query rows must emit nothing: pad with start n
            orig_starts = jnp.pad(orig_starts, [(0, mp - m), (0, 0)],
                                  constant_values=n)
    ss = seg_starts // align
    so = ss if not emit_all else orig_starts
    L = P * seg
    qdt = jnp.float32 if points.dtype == jnp.int8 else points.dtype
    kernel = functools.partial(
        _kernel_rescan, k=k, n=n, seg=seg, P=P, bq=bq, P_wave=P_wave,
        align=align, emit_all=emit_all,
    )
    k_out = L if emit_all else k
    out_i, out_d = pl.pallas_call(
        kernel,
        grid=(nq_blocks,),
        in_specs=[
            pl.BlockSpec((bq, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, P), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # corpus stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((bq, k_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k_out), jnp.int32),
            jax.ShapeDtypeStruct((mp, k_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, L, d), points.dtype),
            pltpu.SemaphoreType.DMA((bq, min(P, P_wave))),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                bq * L * d * (csize + 4) + 8 * bq * L * 4 + (8 << 20),
                100 << 20,
            ),
        ),
        interpret=interpret,
    )(queries.astype(qdt), ss, ss, so, points)
    return out_i[:m], out_d[:m]


def stage_rescan_corpus(points):
    """Lane-pad a corpus to a 128 multiple for the two-phase engine's DMA
    rescan (window DMAs require 128-aligned lane slices — the same Mosaic
    tiling rule the probe kernel documents).  Zero pad lanes contribute 0
    to every distance.  Stage ONCE and pass to
    :func:`exact_knn_twophase` as ``rescan_corpus``; without it, a
    non-128-multiple d pays a corpus-sized pad per call."""
    d = points.shape[1]
    d_pad = -(-d // 128) * 128
    if d_pad == d:
        return points
    return jnp.pad(points, [(0, 0), (0, d_pad - d)])


@functools.partial(
    jax.jit,
    static_argnames=("k", "seg", "pad_segments", "interpret", "rescan",
                     "matmul_precision"),
)
def exact_knn_twophase(points, queries, k: int, *, seg: int | None = None,
                       pad_segments: int = 2, scale=None,
                       interpret: bool = False, rescan: str = "dma",
                       rescan_corpus=None,
                       matmul_precision: str = "highest"):
    """EXACT two-phase kNN: emit kernel + segment rescan (round-4).

    Phase 1 (:func:`_kernel_emit`) streams the corpus and emits only
    per-``seg``-row segment minima — no in-kernel merge state, so the
    per-step cost sits near the stream+matmul floor (measured 10M bf16:
    28.8-30.7 ms vs the rank kernel's 45.5).  Phase 2 takes the
    ``k + pad_segments`` best SEGMENTS per query (by their minima).
    Phase 3 rescans exactly those segments' rows and takes the final
    top-k.

    Exactness: the k-th smallest segment minimum is a true distance of
    some point, so the true k-th neighbor distance D_k <= it; any true
    top-k member p has d(p) <= D_k, hence p's segment minimum <= D_k,
    hence p's segment ranks among the k best segments.  Rescanning the
    top-(k + pad_segments) segments (padding absorbs distance ties)
    therefore covers every true top-k member — the result equals the
    exhaustive kernel's id set (A/B-gated at 10M,
    scripts/exp_twophase.py).  The argument holds for ANY segment
    length, which is what makes the auto-fit below safe.

    ``seg=None`` (default) starts from 512 and shrinks so the rescan
    kernel's (bq, (k + pad_segments) * seg, d) VMEM window fits the
    scoped budget at the minimum query block — the scratch scales with
    k, and a fixed seg=512 failed Mosaic compile past k ~ 22 (round-4
    advisor finding).  An explicit ``seg`` is treated as an upper
    bound (same shrink rules).  If no aligned segment fits, the rescan
    falls back to the XLA-gather form (correct, slower).

    k > 128 (round-5, VERDICT item 5): phases 1-2 are k-independent
    (phase-2 selection rides ``lax.top_k`` past 128); phase 3 switches
    to emit-all windows — at most 128 per kernel launch — whose
    disjoint original-segment masking makes positions unique, and the
    final top-k runs in XLA over the (m, P*seg) rescanned pool.  Same
    exactness argument; measured ~10-30x the old ``lax.top_k``-over-n
    fallback (BASELINE.md round 5).
    """
    from .distance import blocked_over_rows, candidate_dists
    from .topk import merge_topk, topk_no_dedup

    n, d = points.shape
    m = queries.shape[0]
    P = k + pad_segments
    csize = jnp.dtype(points.dtype).itemsize
    align = {4: 8, 2: 16, 1: 32}[csize]
    if rescan not in ("dma", "xla"):
        raise ValueError(f"rescan must be 'dma' or 'xla', got {rescan!r}")
    if seg is not None and seg % align:
        raise ValueError(f"seg={seg} must be a multiple of {align} "
                         f"(DMA row alignment for this dtype)")
    if rescan_corpus is not None:
        d_res = rescan_corpus.shape[1]
    else:
        d_res = d if (d % 128 == 0 or interpret) else -(-d // 128) * 128
    # the effective segment: divides the emit tile (one shared
    # definition, _effective_twophase_seg), and the rescan window at the
    # minimum query block fits the scoped-VMEM budget (shrinking seg
    # preserves exactness; P is chunked at 128 windows per launch for
    # k > 128, so the fit uses the per-launch window count)
    if seg is None:
        # auto segment length ~ sqrt(n)/8, measured round-5 sweep
        # (/tmp/r5_tpcost*.log, 2026-08-21): the rescan cost grows with
        # seg (bytes per window) while phase 2's top-k grows with n/seg
        # (candidates), so the optimum scales as ~sqrt(n) — measured
        # best 64 at 250-500k, 128 at 1M (bf16 4.77 ms vs seg-512's
        # 6.90 — the round-4 fixed seg left a 1.4x win on the table),
        # 256 at 2M, 512 at 10M.  This is what pulled the two-phase
        # crossover from 2M down to ~500k (TWOPHASE_MIN_N).
        seg = min(512, max(32, 1 << (math.isqrt(n) // 8).bit_length()))
        seg = max(seg, align)
    tile = _twophase_tile(_auto_tile(n, d, 4 if csize == 8 else csize))
    seg_eff = _effective_twophase_seg(tile, seg)
    P_fit = min(P, _RESCAN_MAX_P)
    while (seg_eff > align
           and 8 * P_fit * seg_eff * d_res * (csize + 4)
           > _RESCAN_VMEM_BUDGET):
        seg_eff //= 2
    fits = (seg_eff % align == 0 and tile % seg_eff == 0
            and 8 * P_fit * seg_eff * d_res * (csize + 4)
            <= _RESCAN_VMEM_BUDGET)
    seg = seg_eff
    sel_ids, _ = exact_knn_pallas(
        points, queries, P, scale=scale, merge="twophase",
        twophase_seg=seg, tile=tile, interpret=interpret,
        matmul_precision=matmul_precision,
    )
    # winner ids -> their (globally contiguous) segment indices; one
    # candidate per segment makes these unique per query.  Sentinel ids
    # (exhausted rows) map past the last segment and mask to n below.
    seg_ids = jnp.minimum(sel_ids, n - 1) // seg
    exhausted = sel_ids >= n
    qf = queries.astype(jnp.float32)
    if scale is not None:
        qf = jnp.clip(jnp.round(qf / scale), -127, 127)

    n_floor = (n // align) * align
    if rescan == "dma" and n_floor >= seg and fits:
        if rescan_corpus is None:
            rescan_corpus = points if (d % 128 == 0 or interpret) \
                else stage_rescan_corpus(points)
        d_res = rescan_corpus.shape[1]
        qr = qf if d_res == d else jnp.pad(qf, [(0, 0), (0, d_res - d)])
        # window DMAs at align-clamped starts (the straddling last
        # segment clamps down to n_floor - seg: its real rows stay
        # covered, the extra earlier rows are valid candidates, and
        # overlap duplicates dedup by position in-kernel).  Rows
        # [n_floor, n) — at most align-1 of them — are outside every
        # clampable window and merge in via one tiny XLA pass.
        s_eff = jnp.clip(seg_ids * seg, 0, n_floor - seg).astype(jnp.int32)
        if k <= 128:
            ids_r, dd_r = _rescan_pallas(
                rescan_corpus, qr, s_eff, k, seg=seg, interpret=interpret,
            )
        else:
            # emit-all windows, <= 128 per launch; exhausted windows get
            # original start n so they mask out entirely (a sentinel
            # mapped onto the last segment must not duplicate it)
            s_orig = jnp.where(
                exhausted, n, seg_ids * seg
            ).astype(jnp.int32)
            parts_p, parts_d = [], []
            for c0 in range(0, P, _RESCAN_MAX_P):
                c1 = min(c0 + _RESCAN_MAX_P, P)
                pos_c, dd_c = _rescan_pallas(
                    rescan_corpus, qr, s_eff[:, c0:c1], k, seg=seg,
                    interpret=interpret, orig_starts=s_orig[:, c0:c1],
                )
                parts_p.append(pos_c)
                parts_d.append(dd_c)
            dd_all = jnp.concatenate(parts_d, axis=-1)
            pos_all = jnp.concatenate(parts_p, axis=-1)
            ids_r, dd_r = topk_no_dedup(dd_all, pos_all, k)
        ids_r = ids_r.astype(itype)
        if n_floor < n:
            tail = jnp.arange(n_floor, n, dtype=itype)
            cand_t = jnp.broadcast_to(tail[None, :], (m, n - n_floor))
            dd_t = candidate_dists(qf, points, cand_t)
            tids, tdd = topk_no_dedup(dd_t, cand_t, min(k, n - n_floor))
            ids_r, dd_r = merge_topk(ids_r, dd_r, tids, tdd, k, n)
        ids, dd = ids_r, dd_r
    else:
        # XLA-gather rescan: measured ~70 ms at 10M (the gather wall,
        # CLAUDE.md rule 9) — kept as the reference form and the tiny-n
        # fallback
        lane = jnp.arange(seg, dtype=jnp.int32)
        rows = (seg_ids[..., None] * seg + lane).reshape(m, P * seg)
        rows = jnp.where(
            (rows < n) & ~jnp.repeat(exhausted, seg, axis=-1), rows, n
        ).astype(jnp.int32)

        def stage(qb, cb):
            dd = candidate_dists(qb, points, cb)
            return topk_no_dedup(dd, cb, k)

        bq = max(1, min(m, (64 << 20) // max(1, P * seg * 4)))
        ids, dd = blocked_over_rows(
            stage, m, bq, qf.astype(points.dtype)
            if points.dtype in (jnp.bfloat16, jnp.float16) else qf,
            rows, pad_values=(0.0, n),
        )
    ids = jnp.where(jnp.isinf(dd), n, ids).astype(itype)
    if scale is not None:
        dd = dd * (scale * scale).astype(jnp.float32)
    return ids, dd


def _platform_of(x) -> str:
    """Platform the computation will actually run on: the array's device
    when known (the CPU-as-oracle harness runs with arrays placed on cpu
    while the default backend stays tpu), else the default backend."""
    try:
        return next(iter(x.devices())).platform
    except Exception:
        import jax

        return jax.devices()[0].platform


def exact_knn_self_pallas(points, k: int, **kw):
    """Exact kNN graph with self-exclusion (oracle for the build graph)."""
    n = points.shape[0]
    return exact_knn_pallas(
        points, points, k, exclude=jnp.arange(n, dtype=jnp.int32), **kw
    )


@jax.jit
def _absmax(x):
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


@jax.jit
def _quantize_block(x, scale):
    # one fused program: no eager divide/round/clip chain, each of which
    # would materialize a corpus-width f32 transient
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, donate_argnums=(0,))
def _quantize_fill(buf, x, scale, row0):
    return jax.lax.dynamic_update_slice(
        buf, _quantize_block(x, scale), (row0, jnp.int32(0)))


_QUANT_CHUNKED_MIN_BYTES = 1 << 30  # patchable in tests


def quantize_corpus(points, scale=None, chunk_rows: int = 2_000_000):
    """Symmetric int8 quantization of a corpus for the exact engine's
    int8 storage tier: returns (rows int8 (n, d), scale () f32) with
    rows = round(x / scale) clipped to [-127, 127] and scale =
    max|x| / 127 by default (the grid covers the corpus; same convention
    as the packed int8 tier, ``index._quantize_points``).  Feed both to
    :func:`exact_search` / :func:`exact_knn_pallas` — 1/4 the f32 HBM
    (4x exact-serving corpus capacity per chip) on the MXU's native int8
    path.

    Corpora past ~1 GB quantize in fenced ``chunk_rows`` blocks written
    into the output through donated updates: at the 24-32M scales this
    tier exists for, the corpus barely fits HBM by itself, and both
    one-shot transients and enqueue-time workspace stacking (CLAUDE.md
    rule 16) would OOM."""
    points = jnp.asarray(points)
    n, d = points.shape
    big = n * d * 4 > _QUANT_CHUNKED_MIN_BYTES
    if scale is None:
        if big:
            from ..utils.profiling import fence

            mx = jnp.float32(0)
            for lo in range(0, n, chunk_rows):
                mx = jnp.maximum(mx, _absmax(points[lo: lo + chunk_rows]))
                fence([mx])
            scale = mx / 127.0
        else:
            scale = _absmax(points) / 127.0
    scale = jnp.asarray(scale, jnp.float32)
    if not big:
        return _quantize_block(points, scale), scale
    from ..utils.profiling import fence

    buf = jnp.zeros((n, d), jnp.int8)
    fence([buf])
    for lo in range(0, n, chunk_rows):
        buf = _quantize_fill(buf, points[lo: lo + chunk_rows], scale,
                             jnp.int32(lo))
        fence([buf])
    return buf, scale


def exact_search(points, queries, k: int, **kw):
    """Exact k-NN with the best available engine: the fused Pallas kernel
    on TPU (measured 2.9-8.7x faster than the XLA-fused form at
    n=20k-200k on a v5e), XLA brute force elsewhere.  On TPU at
    single-chip scales this is a serving mode in its own right — recall
    1.0 at hundreds of thousands of QPS — not just the test oracle.

    An int8 corpus (from :func:`quantize_corpus`) requires ``scale=``;
    off-TPU it is dequantized for the XLA oracle (same neighbor sets as
    the quantized-domain kernel up to ties — both rank the identical
    quantized values).

    **Supported k envelope**: the fused kernel serves k <= 128 (measured
    1M x 128, m=1000: 26.2k QPS at k=100, 21.1k at k=128 —
    /tmp/r4_largek.log).  Past 128 the call routes the two-phase engine
    (:func:`exact_knn_twophase` — k-independent emit + emit-all rescan,
    round 5), replacing the old ``lax.top_k``-over-n fallback that
    served 0.7-1.3k QPS at k=256-1000; unsupported kwarg combinations
    or tiny n still fall back to the XLA brute-force path."""
    points = jnp.asarray(points)
    if _platform_of(points) in ("tpu", "axon"):
        # a bf16/f16/int8 corpus is streamed at storage width (see
        # exact_knn_pallas); everything else runs in f32
        pk = points
        if pk.dtype not in (jnp.bfloat16, jnp.float16, jnp.int8):
            pk = jnp.asarray(pk, jnp.float32)
        tp_kw = {"scale", "interpret", "matmul_precision", "seg",
                 "pad_segments", "rescan", "rescan_corpus"}
        if k <= 128:
            from ..engine.serving import TWOPHASE_MIN_N

            if (pk.shape[0] >= TWOPHASE_MIN_N and k + 2 <= 128
                    and set(kw) <= tp_kw
                    and not kw.pop("no_twophase", False)):
                # above the measured crossover the two-phase engine wins
                # 1.05-1.44x per tier (round-5 auto-seg, BASELINE.md);
                # id-agreement 1.0.  Callers pinning rank-kernel knobs
                # (tile, merge, ...) keep the rank kernel.  NOTE: a
                # d % 128 != 0 corpus pays a per-call lane pad here —
                # repeated serving should go through Server, which
                # stages the padded corpus once.
                return exact_knn_twophase(
                    pk, jnp.asarray(queries, jnp.float32), k, **kw,
                )
            kw.pop("no_twophase", None)
            for kw_tp in ("seg", "pad_segments", "rescan",
                          "rescan_corpus"):
                kw.pop(kw_tp, None)
            return exact_knn_pallas(
                pk, jnp.asarray(queries, jnp.float32), k, **kw,
            )
        if (k < pk.shape[0] and pk.shape[0] >= 8 * (k + 2)
                and set(kw) <= tp_kw):
            return exact_knn_twophase(
                pk, jnp.asarray(queries, jnp.float32), k, **kw,
            )
        # k > 128 with kernel-only kwargs or k ~ n: XLA brute force below
    from .distance import brute_force_knn

    scale = kw.pop("scale", None)
    if points.dtype == jnp.int8:
        if scale is None:
            raise ValueError(
                "int8 corpus requires its quantization scale "
                "(see quantize_corpus)"
            )
        # the oracle ranks the same quantized values the kernel does:
        # dequantize corpus AND queries onto the quantization grid
        points = points.astype(jnp.float32) * scale
        queries = (
            jnp.clip(jnp.round(jnp.asarray(queries, jnp.float32) / scale),
                     -127, 127) * scale
        )
    return brute_force_knn(jnp.asarray(points), jnp.asarray(queries), k)

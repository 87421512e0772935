"""Fused hash-query Pallas kernel: probe-window DMA + distances + top-k.

Role of ``compute_which`` + ``compdists`` + ``sort_and_uniq``
(``/root/reference/compute.cl:238-263``, ``alg.c:303-337``), fused into one
kernel over the packed bucket-CSR layout (SURVEY.md §7 step 3).

Why this exists — the gather wall (docs/ARCHITECTURE.md): the XLA query
path fetches every candidate row through XLA's gather, which costs
~2.5-18 ns/row and degrades with source size; at 1M+ points the query is
gather-bound, not flops-bound.  This kernel replaces the gather with
direct HBM->VMEM DMAs of each probe's CSR window ``[start, start+window)``
— no alignment games, no super-rows, no per-row cost — then computes
squared distances on the VPU and selects a per-table top-k on-chip.  Only
the per-table winners (tries * k ids per query) leave the kernel; the
cross-table merge, id mapping and supercharge stay in XLA where they are
tiny.

The niche is exactly where the hash algorithm itself matters (the >8M /
small-batch regime): exhaustive MXU search reads the whole corpus once per
batch, so at small batches or 10M+ points the hash path's sublinear read
volume wins IF the read runs at DMA speed rather than gather speed.

Grid: ``(m / bq, tries)``; each step is self-contained (no cross-step
carry): issue ``bq * P`` window DMAs, one VPU distance pass over
``(bq, P*window, d)``, k rounds of masked-argmin selection (the
``ops.topk`` idiom — Mosaic has no dynamic gather).  Positions within the
packed table double as free within-table ids for dedup across overlapping
probe windows, exactly as in ``search_packed``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import itype

# Mosaic compile fails outright with too many concurrently in-flight DMA
# copies (one semaphore each): 512 reproducibly 500s, 384 passes
# (scripts/dbg_probe_compile.py, real-TPU compiles only — interpret mode
# does not catch it).  Stay at the measured-good point.
_DMA_INFLIGHT_MAX = 384

# Query-tile ceiling.  Grid steps cost ~10 us each on this runtime (rule
# 11), so fatter query tiles pay: bq=32 measured +5-8% QPS over bq=16 at
# P=18 (scripts/exp_probe_attrib.py bq, /tmp/attrib_bq.log 2026-08-19).
# bq=64 fails Mosaic compile outright at small L (P=18, w=40, VMEM well
# under budget — the unrolled 2*bq*P_wave copy program, not memory) and
# is VMEM-shrunk back to 32 at large L, so 32 is both the measured
# optimum and the compile-safe ceiling.
_BQ_MAX = 32


def _kernel(q_ref, ss_ref, sv_ref, pts_hbm, out_p_ref, out_d_ref, win, sems,
            *, k: int, n: int, n_pad: int, window: int, P: int, bq: int,
            P_wave: int, align: int, pos_mode: str = "select"):
    t = pl.program_id(1)

    # one DMA per (query, probe): the probe's CSR window, direct from HBM.
    # Copies are issued in waves of bq * P_wave (caller caps it at
    # _DMA_INFLIGHT_MAX) with all of a wave's copies started before any
    # wait, so they pipeline against each other (DMA engines run ahead of
    # the scalar core).  Too many in-flight copies/semaphores fails
    # Mosaic compilation outright (HTTP 500 from the compile helper;
    # measured: 512 fails, 384 passes — scripts/dbg_probe_compile.py).
    # ss_ref holds starts PRE-DIVIDED by ``align``: HBM memrefs are
    # (sublane, 128)-tiled — sublane 8 for 32-bit, 16 for 16-bit, 32 for
    # 8-bit elements — and Mosaic must PROVE the dim-0 slice start is
    # tile-divisible: a raw dynamic CSR offset fails that proof ("Failed
    # to prove that a tile index in dimension 0 is divisible by the
    # tiling"), while ``sA * align + t * n_pad`` is provable (n_pad %
    # align == 0 by packed()'s construction, asserted by the caller).
    def copy(qq, p, p0):
        s = ss_ref[qq, t, p] * align
        return pltpu.make_async_copy(
            pts_hbm.at[pl.ds(t * n_pad + s, window), :],
            win.at[qq, pl.ds(p * window, window), :],
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
    w = win[:].astype(jnp.float32)  # (bq, L, d), L = P*window
    diff = w - qv[:, None, :]
    dd = jnp.sum(diff * diff, axis=-1)  # (bq, L)

    # within-table positional ids: slot index in the packed table; the
    # packed tail (pos >= n) is sentinel padding, and overlapping probe
    # windows carry the same pos at the same distance -> dedup by pos.
    # Built as 2D iota + P lane-range selects (Mosaic has no 3D->2D
    # shape cast): lane j of probe p holds start_p + (j - p*window).
    sv = sv_ref[:, t, :] * align  # (bq, P) window starts (/align) for table t
    L = P * window
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    if pos_mode == "stub":
        # measurement-only (scripts/exp_probe_attrib.py): lane index as the
        # positional id — WRONG ids/dedup, identical op volume with the
        # select chain removed; isolates the chain's VPU cost.  A one-hot
        # MXU matmul replacement was tried and measured broken+slower
        # (default matmul precision rounds f32 starts via bf16 — CLAUDE.md
        # rule 4 — and it lost ~15% QPS even so, /tmp/fused_ab_r2.log).
        pos = j
    else:
        pos = jnp.zeros((bq, L), jnp.int32)
        for p in range(P):
            pos = jnp.where(
                (j >= p * window) & (j < (p + 1) * window),
                sv[:, p : p + 1] + (j - p * window),
                pos,
            )
    dd = jnp.where(pos < n, dd, jnp.inf)

    big = jnp.iinfo(jnp.int32).max
    d_, p_ = dd, pos
    outs_d, outs_p = [], []
    for _ in range(k):
        dmin = jnp.min(d_, axis=-1, keepdims=True)
        pmin = jnp.min(jnp.where(d_ == dmin, p_, big), axis=-1, keepdims=True)
        pmin = jnp.where(jnp.isinf(dmin), n, pmin)
        outs_d.append(dmin)
        outs_p.append(pmin)
        d_ = jnp.where(p_ == pmin, jnp.inf, d_)
    out_d_ref[:, t, :] = jnp.concatenate(outs_d, axis=-1)
    out_p_ref[:, t, :] = jnp.concatenate(outs_p, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n", "n_pad", "window", "query_block", "interpret", "pos_mode",
    ),
)
def probe_topk_pallas(
    pts_flat: jax.Array,
    queries: jax.Array,
    starts: jax.Array,
    *,
    k: int,
    n: int,
    n_pad: int,
    window: int,
    query_block: int = 32,
    interpret: bool = False,
    pos_mode: str = "select",
) -> tuple[jax.Array, jax.Array]:
    """Per-table probe-window top-k over the packed CSR layout.

    pts_flat (tries * n_pad, d): each table's packed point vectors (the
    ``PackedIndex.point_rows`` buffer reshaped — same HBM layout).
    queries (m, d); starts (m, tries, P) int32 window starts, already
    clipped to [0, n_pad - window].  Returns (positions (m, tries, k)
    int32 within-table slots ascending by distance — sentinel n where
    exhausted — and squared distances (m, tries, k) f32).

    Each window is widened to an align-aligned superset
    [align*(start//align), +round_up(window + align - 1, align)) — HBM row
    DMAs must start at provably aligned offsets (align = 8 for the float
    tiers, 32 for int8's (32,128) tiling); the extra slots on each side
    are real packed entries that simply join the candidate pool (dedup
    keeps min-distance copies), so recall can only improve.

    int8 rows (the quantized tier) are streamed as stored and upcast on
    the VPU; the caller pre-scales queries by 1/scale and multiplies the
    returned distances by scale^2 (see ``search_packed_fused_impl``).
    """
    m, d = queries.shape
    tries, P = starts.shape[1], starts.shape[2]
    # provable window-DMA row alignment: 8 suffices for the float tiers
    # (measured: f32 and bf16 both compile and run at 8), int8 memrefs are
    # (32, 128)-tiled so offsets must be provably 32-divisible
    align = 32 if jnp.dtype(pts_flat.dtype).itemsize == 1 else 8
    if n_pad % align:
        raise ValueError(
            f"n_pad={n_pad} must be {align}-aligned (repack with "
            "ANNIndex.packed(); its slot count is lcm(super_width, align)-"
            "rounded precisely so per-table HBM offsets stay DMA-alignable)"
        )
    if d % 128 and not interpret:
        raise ValueError(
            f"lane dim {d} must be a 128 multiple for HBM window DMAs "
            "(Mosaic tiling); repack with ANNIndex.packed(), which zero-"
            "pads the stored lane dim, and pass zero-padded queries"
        )
    # widen by align-1 (the start rounds DOWN by up to that many slots,
    # and coverage of [start, start+window) must survive), then round up
    window = min(-(-(window + align - 1) // align) * align, n_pad)
    starts = jnp.clip(starts // align, 0, (n_pad - window) // align)
    # a wave is bq * P_wave >= bq copies, so bq itself must stay under the
    # in-flight cap whatever query_block the caller asks for; _BQ_MAX is
    # the measured compile-safe ceiling (see its comment)
    bq = min(query_block, m, _BQ_MAX)
    # The query block is a VMEM BlockSpec tile: its sublane dim must be
    # 8-divisible (or equal to the whole array) — bq = 12 fails Mosaic's
    # block-shape check even though 8 and 16 pass.
    if bq >= 8:
        bq -= bq % 8
    # auto-shrink the query tile so the kernel's VMEM tenants fit: the
    # window scratch (bq,L,d in the point dtype), the f32 diff tensor the
    # VPU pass materializes, and the dd/pos planes.  Oversized tiles fail
    # Mosaic compilation outright (observed at bq=64, L=1152, d=128).
    csize = jnp.dtype(pts_flat.dtype).itemsize
    while bq > 8 and P * window * d * (csize + 4) * bq + 8 * P * window * bq * 4 > (
        88 << 20
    ):
        bq //= 2
    # cap concurrent DMAs: >~448 in-flight copies (the (bq, P_wave)
    # semaphore array) fails Mosaic compilation (measured threshold —
    # see _kernel); issue probe windows in waves when bq * P exceeds it.
    P_wave = max(1, _DMA_INFLIGHT_MAX // bq)
    nq_blocks = math.ceil(m / bq)
    mp = nq_blocks * bq
    if mp != m:
        queries = jnp.pad(queries, [(0, mp - m), (0, 0)])
        starts = jnp.pad(starts, [(0, mp - m), (0, 0), (0, 0)])
    L = P * window
    cdt = pts_flat.dtype

    # int8 rows stream quantized; the query block stays f32 (casting the
    # query to int8 would destroy it — the caller pre-scales by 1/scale)
    qdt = jnp.dtype(jnp.float32) if cdt == jnp.int8 else cdt
    if pos_mode not in ("select", "stub"):
        raise ValueError(f"pos_mode must be 'select' or 'stub', got {pos_mode!r}")
    kernel = functools.partial(
        _kernel, k=k, n=n, n_pad=n_pad, window=window, P=P, bq=bq,
        P_wave=P_wave, align=align, pos_mode=pos_mode,
    )
    out_p, out_d = pl.pallas_call(
        kernel,
        grid=(nq_blocks, tries),
        in_specs=[
            pl.BlockSpec((bq, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            # starts twice: scalar reads for DMA offsets (SMEM) and the
            # vector form for the positional-id iota (VMEM).  Blocks span
            # the full (tries, P) trailing dims — Mosaic requires the last
            # two block dims be (8,128)-divisible or equal to the array's;
            # the kernel slices its table with the dynamic grid index t.
            pl.BlockSpec((bq, tries, P), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, tries, P), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed points stay in HBM
        ],
        out_specs=[
            # one VMEM-resident (bq, tries, k) window per query block,
            # revisited by the tries consecutive grid steps (t varies
            # fastest) — each step fills its own [:, t, :] slice
            pl.BlockSpec((bq, tries, k), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, tries, k), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, tries, k), jnp.int32),
            jax.ShapeDtypeStruct((mp, tries, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, L, d), cdt),
            pltpu.SemaphoreType.DMA((bq, min(P, P_wave))),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                # window scratch + f32 diff tensor + dd/pos blocks +
                # selection temporaries + fixed headroom
                bq * L * d * (csize + 4) + 8 * bq * L * 4 + (8 << 20),
                100 << 20,
            ),
        ),
        interpret=interpret,
    )(queries.astype(qdt), starts, starts, pts_flat)
    return out_p[:m].astype(itype), out_d[:m]

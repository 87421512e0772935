"""Candidate distance computation.

Role of ``compute_diffs_squared`` + ``add_cols_step``
(``/root/reference/compute.cl:135-167``) and the ``compdists`` driver
(``alg.c:233-242``).  The reference materializes an (n, L, d) diff tensor and
tree-reduces it; here the gather+square+reduce is a single fused XLA
expression, blocked over rows to bound HBM-resident transients.  Sentinel
candidates (id >= n) and — during build — self-matches get +inf distance,
replacing the reference's branchless ``1.0/c - 1`` trick
(``compute.cl:144-149``) with explicit masks.

Distances are **squared** L2 on the *raw* (uncentered) coordinates: the
reference computes distances against the original points buffer
(``alg.c:410-411`` build, ``alg.c:503-512`` query); centering only affects
hashing.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .topk import topk_iter


def candidate_dists(
    q: jax.Array,
    points: jax.Array,
    cand: jax.Array,
    *,
    exclude_self: jax.Array | None = None,
    method: str = "diff",
    point_sqnorms: jax.Array | None = None,
) -> jax.Array:
    """Squared L2 distances from each row of ``q`` to its candidate ids.

    q: (m, d); points: (n, d); cand: (m, L) int ids with sentinel >= n.
    exclude_self: optional (m,) row ids — candidates equal to them get +inf
    (the build's self-exclusion, ``compute.cl:145-146``).
    method: 'diff' = exact sum((q - p)^2); 'dot' = ||q||^2 + ||p||^2 - 2 q.p
    (MXU-heavy, needs ``point_sqnorms``).
    Returns (m, L) distances with +inf at masked entries.
    """
    n = points.shape[0]
    valid = cand < n
    if exclude_self is not None:
        valid = valid & (cand != exclude_self[:, None])
    safe = jnp.where(valid, cand, 0)
    pc = points[safe]  # (m, L, d)
    if method == "dot":
        if point_sqnorms is None:
            point_sqnorms = jnp.sum(points * points, axis=-1)
        qn = jnp.sum(q * q, axis=-1)
        dots = jnp.einsum("mld,md->ml", pc, q, preferred_element_type=q.dtype,
                          precision=jax.lax.Precision.HIGHEST)
        dd = qn[:, None] + point_sqnorms[safe] - 2.0 * dots
    else:
        diff = q[:, None, :] - pc
        dd = jnp.sum(diff * diff, axis=-1)
    return jnp.where(valid, dd, jnp.asarray(jnp.inf, dd.dtype))


def pick_block(m: int, l: int, d: int, itemsize: int = 4, budget_bytes: int = 128 << 20) -> int:
    """Row-block size keeping the (B, L, d) gather transient under budget."""
    per_row = max(1, l * d * itemsize)
    b = max(1, budget_bytes // per_row)
    return min(m, b)


def blocked_over_rows(fn, m: int, block: int, *row_args, pad_values):
    """Apply ``fn(*blocks) -> (out0, ...)`` over row-blocks of the leading
    axis via ``lax.map`` (sequential blocks — bounds transient memory while
    XLA pipelines within a block).  Inputs are padded to a block multiple
    with ``pad_values``; outputs are un-padded."""
    nb = math.ceil(m / block)
    mp = nb * block

    def pad(a, v):
        if mp == m:
            return a
        w = [(0, mp - m)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, w, constant_values=v)

    padded = [
        pad(a, v).reshape((nb, block) + a.shape[1:])
        for a, v in zip(row_args, pad_values)
    ]
    outs = jax.lax.map(lambda xs: fn(*xs), tuple(padded))
    single = not isinstance(outs, tuple)
    if single:
        outs = (outs,)
    outs = tuple(o.reshape((mp,) + o.shape[2:])[:m] for o in outs)
    return outs[0] if single else outs


@partial(jax.jit, static_argnames=("k", "block"))
def brute_force_knn(
    points: jax.Array, queries: jax.Array, k: int, block: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN of queries against points — the recall oracle (role of the
    harness brute force, ``test_correctness.c:207-227``) and also a
    competitive TPU search path in its own right: one (m, d) @ (d, n) MXU
    matmul per block plus top-k."""
    pn = jnp.sum(points * points, axis=-1)

    def one(qb):
        qn = jnp.sum(qb * qb, axis=-1)
        # HIGHEST: this is the ORACLE — TPU's default matmul precision
        # truncates f32 factors to bf16 on the MXU, which misranks ~0.5%
        # of neighbor ids vs the true f32 distances (measured against an
        # f64 oracle at 20k x 128; round-3 parity arbitration finding)
        dots = jnp.matmul(qb, points.T, precision=jax.lax.Precision.HIGHEST)
        dd = qn[:, None] + pn[None, :] - 2.0 * dots
        return topk_iter(dd, k)

    m = queries.shape[0]
    return blocked_over_rows(one, m, min(block, m), queries, pad_values=(0.0,))


@partial(jax.jit, static_argnames=("k", "block"))
def brute_force_knn_self(points: jax.Array, k: int, block: int = 1024):
    """Exact kNN graph of a point set against itself, self-match excluded
    (role of ``compute_score``'s oracle, ``test_correctness.c:169-187``)."""
    n = points.shape[0]
    pn = jnp.sum(points * points, axis=-1)

    def one(qb, rows):
        qn = jnp.sum(qb * qb, axis=-1)
        dots = jnp.matmul(qb, points.T, precision=jax.lax.Precision.HIGHEST)
        dd = qn[:, None] + pn[None, :] - 2.0 * dots
        dd = jnp.where(jnp.arange(n)[None, :] == rows[:, None], jnp.inf, dd)
        return topk_iter(dd, k)

    return blocked_over_rows(
        one, n, min(block, n), points, jnp.arange(n), pad_values=(0.0, -1)
    )

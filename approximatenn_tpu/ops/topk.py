"""Dedup-by-id + top-k selection.

Role of ``sort_and_uniq`` (``/root/reference/alg.c:224-230``): the reference
bitonic-sorts candidate rows by distance, infinities out *adjacent* duplicate
ids (``rdups``, ``compute.cl:212-217`` — safe because duplicates of one id
carry identical distances so they land adjacent), re-sorts, and the caller
keeps the first k.

TPU-first re-expression: sort rows by id (``jax.lax.sort``), mask every entry
equal to its left neighbour (same survivor set — duplicate ids have equal
distances so which copy survives is immaterial), then a single
``jax.lax.top_k`` on negated distances.  O(L log L) instead of the
reference's O(L log^2 L) bitonic network, and top-k replaces the second full
sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import itype


def dedup_topk(
    ids: jax.Array, dists: jax.Array, k: int, sentinel: int
) -> tuple[jax.Array, jax.Array]:
    """Per-row dedup by id, then top-k ascending by distance.

    ids, dists: ``(..., L)``; entries with id == sentinel (or any masked
    entry) must already carry +inf distance.  Returns ``(ids_k, dists_k)``
    of shape ``(..., k)``; rows with fewer than k unique real candidates are
    padded with (sentinel, +inf), mirroring the reference's behaviour of
    returning sentinel-id entries when candidates run out.
    """
    # two sort keys: id then distance, so the surviving copy of each id is
    # its minimum distance (in the pipeline duplicates always carry equal
    # distances, making this exactly the reference's semantics; with unequal
    # distances this is the strictly-better choice).
    sid, sdist = jax.lax.sort((ids, dists), dimension=-1, num_keys=2)
    prev = jnp.concatenate(
        [jnp.full(sid.shape[:-1] + (1,), -1, sid.dtype), sid[..., :-1]], axis=-1
    )
    dup = sid == prev
    sdist = jnp.where(dup, jnp.inf, sdist)
    sid = jnp.where(dup, jnp.asarray(sentinel, sid.dtype), sid)
    neg_top, idx = jax.lax.top_k(-sdist, k)
    return jnp.take_along_axis(sid, idx, axis=-1), -neg_top


def merge_topk(
    ids_a: jax.Array,
    dists_a: jax.Array,
    ids_b: jax.Array,
    dists_b: jax.Array,
    k: int,
    sentinel: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two candidate lists and keep the k nearest unique ids."""
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    dists = jnp.concatenate([dists_a, dists_b], axis=-1)
    return dedup_topk(ids, dists, k, sentinel)


def topk_no_dedup(dists: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Plain top-k (ascending distance) without dedup, for merge stages
    where ids are guaranteed unique (e.g. cross-shard merges)."""
    neg_top, idx = jax.lax.top_k(-dists, k)
    return jnp.take_along_axis(ids, idx, axis=-1), -neg_top


def sentinel_pad(ids: jax.Array, dists: jax.Array, sentinel: int):
    """Force masked entries to (sentinel, +inf) — helper for callers."""
    mask = ids >= sentinel
    return (
        jnp.where(mask, jnp.asarray(sentinel, ids.dtype), ids),
        jnp.where(mask, jnp.inf, dists),
    )

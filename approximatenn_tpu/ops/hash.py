"""Sign-bit bucket codes and multiprobe code expansion.

Role of ``compute_signs`` (``/root/reference/compute.cl:223-231``) and the
probe-code computation inside ``compute_which`` (``compute.cl:238-246``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import itype


def pack_signs(x: jax.Array) -> jax.Array:
    """Pack sign bits of the last axis into an int32 code, MSB-first.

    The reference reads the raw IEEE sign bit by integer reinterpretation
    (``compute.cl:228-230``), so -0.0 counts as negative; ``jnp.signbit``
    has exactly that semantic.  First coordinate becomes the most
    significant bit, matching ``r = r << 1 | sign(coord_i)``.

    Codes are int32 (reference: size_t); d_short <= 31 is enforced by the
    build (bucket-table memory makes larger d_short impractical anyway).
    """
    d_short = x.shape[-1]
    if d_short == 0:
        return jnp.zeros(x.shape[:-1], itype)
    bits = jnp.signbit(x).astype(itype)
    weights = (jnp.ones((), itype) << jnp.arange(d_short - 1, -1, -1, dtype=itype))
    return jnp.sum(bits * weights, axis=-1, dtype=itype)


def probe_codes(codes: jax.Array, d_short: int) -> jax.Array:
    """Expand each code to its multiprobe set: itself plus all Hamming-1
    neighbors, shape ``(..., d_short + 1)``.

    Probe 0 is the code itself; probe y >= 1 flips bit (y-1)
    (``wi_rev[x] ^ (!!y << (y - 1))``, ``compute.cl:244``).
    """
    flips = jnp.concatenate(
        [jnp.zeros((1,), itype), jnp.ones((d_short,), itype) << jnp.arange(d_short, dtype=itype)]
    )
    return codes[..., None] ^ flips

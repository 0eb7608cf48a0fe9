"""Distance maps from picked chromatin traces.

Behavior target: reference `Cell_Data._generate_distance_map`
(classes/__init__.py:4123-4273): picked zxy (px) scaled by `_distance_zxy`
nm, then `squareform(pdist(zxys))` per cell; population medians across
cells.  Here traces are fixed-width arrays with NaN for missing regions and
the pairwise map is one broadcast subtraction per batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PIXEL_SIZE_NM


@jax.jit
def spots_to_zxy_nm(spots: jnp.ndarray,
                    pixel_size_nm=DEFAULT_PIXEL_SIZE_NM) -> jnp.ndarray:
    """(..., 11) spot rows -> (..., 3) zxy in nm."""
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    return spots[..., 1:4] * px


@jax.jit
def distance_map(zxys: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) trace (nm; NaN = missing) -> (N, N) euclidean distance map."""
    d = zxys[:, None, :] - zxys[None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


@jax.jit
def median_distance_map(zxys_batch: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) traces -> (N, N) median distance map ignoring NaNs."""
    maps = jax.vmap(distance_map)(zxys_batch)
    return jnp.nanmedian(maps, axis=0)


@partial(jax.jit, static_argnames=("n_regions",))
def contact_map(zxys_batch: jnp.ndarray, threshold_nm: float = 500.0,
                n_regions: int = 0) -> jnp.ndarray:
    """(B, N, 3) traces -> (N, N) contact frequency below threshold."""
    maps = jax.vmap(distance_map)(zxys_batch)
    contacts = (maps < threshold_nm).astype(jnp.float32)
    ok = jnp.isfinite(maps).astype(jnp.float32)
    return jnp.sum(contacts * ok, axis=0) / jnp.maximum(jnp.sum(ok, axis=0),
                                                        1.0)

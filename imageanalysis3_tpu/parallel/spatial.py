"""Spatial sharding of one FOV across the device mesh (the CP analog).

SURVEY §2.11: the reference has no intra-image parallelism — crops are
sequential slices on one process.  Here a single (Z, X, Y) stack is
sharded along x across the ICI mesh and processed with real collectives:

  * halo exchange via `jax.lax.ppermute` feeds each shard the neighbor
    columns its stencils need (filters, hot-pixel neighborhoods);
  * global statistics ride `jax.lax.psum` (counting-median layer stats,
    dynamic-threshold seed histograms);
  * seed extraction is local top-k + `jax.lax.all_gather` + global top-k.

This both scales one-FOV latency across chips and removes the single-chip
HBM ceiling (each device holds 1/D of the stack plus halos).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.seeding import Seeds, _level_diff_hist


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str,
                  axis: int = 1) -> jnp.ndarray:
    """Pad a sharded axis with `halo` columns from ring neighbors.

    Non-periodic: the first/last shard's outer halo is edge-replicated
    (matching the symmetric/edge padding a single-device run applies at
    image borders is the caller's job — outer halos only affect pixels the
    caller crops away).
    """
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[axis]
    lo = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    hi = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)
    right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(hi, axis_name, right)   # my left nb's hi
    from_right = jax.lax.ppermute(lo, axis_name, left)   # my right nb's lo
    # image-border shards: symmetric reflection of their own edge columns
    # (matching the single-device path's mode="symmetric" padding)
    from_left = jnp.where(idx == 0, jnp.flip(lo, axis), from_left)
    from_right = jnp.where(idx == n_shards - 1, jnp.flip(hi, axis),
                           from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def _psum_counting_median(imf: jnp.ndarray, axis_name: str,
                          axis=(1, 2), bits: int = 18,
                          global_n: Optional[int] = None) -> jnp.ndarray:
    """Per-z-layer median over the *global* (sharded) x-y plane: the
    counting binary search of ops.filters.counting_median with the count
    reduced across shards by psum."""
    scale = 4.0
    codes = jnp.floor(imf * scale + 0.5).astype(jnp.int32)
    local_n = 1
    for ax in axis:
        local_n *= imf.shape[ax]
    n = global_n if global_n is not None else \
        local_n * jax.lax.axis_size(axis_name)
    half = (n + 1) // 2
    zero = jnp.min(codes, axis=axis) * 0
    lo = zero
    hi = zero + ((1 << bits) - 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        mid_b = mid
        for ax in sorted(axis):
            mid_b = jnp.expand_dims(mid_b, ax)
        cnt = jax.lax.psum(
            jnp.sum((codes <= mid_b).astype(jnp.int32), axis=axis),
            axis_name)
        ok = cnt >= half
        return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, bits, body, (lo, hi))
    return lo.astype(jnp.float32) / scale


def sharded_correct_and_seed(im: jnp.ndarray, mesh: Mesh,
                             illumination: Optional[jnp.ndarray] = None,
                             hot_pixel: bool = True,
                             hot_pixel_th: float = 0.5,
                             hot_pixel_ratio: float = 4.0,
                             z_shift: bool = True,
                             th_seed: float = 300.0,
                             max_num_seeds: int = 1024,
                             dynamic_niters: int = 10,
                             min_dynamic_seeds: int = 1,
                             gfilt_size: float = 0.75,
                             background_gfilt_size: float = 7.5,
                             filt_size: int = 3,
                             min_edge_distance: int = 2,
                             axis_name: str = "data"
                             ) -> Tuple[jnp.ndarray, Seeds]:
    """Correct one (Z, X, Y) stack and seed it, x-sharded over `mesh`.

    One `shard_map` program: hot-pixel removal (1-px halo), z-shift
    normalization (psum'd global layer medians), illumination flat-field,
    the seeding level pass (filter-radius halo), psum'd dynamic-threshold
    histogram, and all_gather'd global top-k seed selection.  Produces the
    same corrected stack and seed table as the single-device path.
    """
    z, x, y = im.shape
    n_dev = mesh.devices.size
    assert x % n_dev == 0, f"x={x} must divide over {n_dev} shards"
    shard_x = x // n_dev

    def _radius(sigma):
        return int(4.0 * float(sigma) + 0.5) if sigma else 0

    halo = max(_radius(gfilt_size), _radius(background_gfilt_size)) \
        + (filt_size // 2)
    assert halo <= shard_x, "halo exceeds shard width; use fewer shards"
    n_lvl = dynamic_niters
    imf_prof = (None if illumination is None
                else jnp.asarray(illumination, jnp.float32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis_name, None),)
             + ((P(axis_name, None),) if imf_prof is not None else ()),
             out_specs=(P(None, axis_name, None),
                        Seeds(coords=P(), heights=P(), valid=P(),
                              count=P(), threshold=P(), saturated=P())),
             check_vma=False)
    def program(local, *maybe_prof):
        shard = jax.lax.axis_index(axis_name)
        x0 = shard * shard_x
        imf = local.astype(jnp.float32)

        if hot_pixel:
            padded = halo_exchange(imf, 1, axis_name)
            up = padded[:, :-2, :]
            down = padded[:, 2:, :]
            left = jnp.roll(imf, 1, 2)
            right = jnp.roll(imf, -1, 2)
            neigh = (up + down + left + right) * 0.25
            hot_frac = jnp.mean((imf > hot_pixel_ratio * neigh
                                 ).astype(jnp.float32), axis=0)
            hot2d = hot_frac > hot_pixel_th
            gxi = x0 + jnp.arange(shard_x)[:, None]
            gyi = jnp.arange(y)[None, :]
            interior = (gxi > 0) & (gxi < x - 1) & (gyi > 0) & (gyi < y - 1)
            imf = jnp.where((hot2d & interior)[None], neigh, imf)

        if z_shift:
            layer_med = _psum_counting_median(imf, axis_name)
            # global median over all voxels: median of the full stack
            global_med = _psum_counting_median(
                imf, axis_name, axis=(0, 1, 2))
            imf = imf / layer_med[:, None, None] * global_med

        if maybe_prof:
            imf = imf / maybe_prof[0][None].astype(jnp.float32)
        imf = jnp.clip(imf, 0.0, 65535.0)

        # --- seeding level pass on the halo-extended shard
        tile = halo_exchange(imf, halo, axis_name)
        level, diff, hist = _level_diff_hist(
            tile, th_seed, x0, shard_x, (z, x, y), gfilt_size,
            background_gfilt_size, filt_size, min_edge_distance, n_lvl)
        counts = jax.lax.psum(hist, axis_name)
        cum = jnp.cumsum(counts)
        reach = cum >= min_dynamic_seeds
        chosen = jnp.where(jnp.any(reach), jnp.argmax(reach), n_lvl - 1)
        th = jnp.maximum(jnp.asarray(th_seed, jnp.float32), 1e-6)
        chosen_th = th * (1.0 - chosen.astype(jnp.float32) / n_lvl)
        sel = level <= chosen.astype(jnp.int8)
        xy_counts = jnp.sum(sel.astype(jnp.int32), axis=0)
        sel = sel & (xy_counts[None] < 3)
        n_sel = jax.lax.psum(jnp.sum(sel.astype(jnp.int32)), axis_name)

        # local top-k then global top-k over the gathered candidates
        masked = jnp.where(sel, diff, -jnp.inf).ravel()
        k_local = min(max_num_seeds, masked.shape[0])
        v1, i1 = jax.lax.top_k(masked, k_local)
        zc = i1 // (shard_x * y)
        rem = i1 % (shard_x * y)
        xc = rem // y + x0
        yc = rem % y
        flat_global = (zc * x + xc) * y + yc
        v_all = jax.lax.all_gather(v1, axis_name).ravel()
        f_all = jax.lax.all_gather(flat_global, axis_name).ravel()
        hts, order = jax.lax.top_k(v_all, max_num_seeds)
        fidx = f_all[order]
        gz = fidx // (x * y)
        grem = fidx % (x * y)
        coords = jnp.stack([gz, grem // y, grem % y], axis=1)
        valid = jnp.isfinite(hts)
        seeds = Seeds(coords=jnp.where(valid[:, None], coords, -1
                                       ).astype(jnp.int32),
                      heights=jnp.where(valid, hts, 0.0),
                      valid=valid,
                      count=jnp.minimum(n_sel, max_num_seeds
                                        ).astype(jnp.int32),
                      threshold=chosen_th,
                      saturated=n_sel > max_num_seeds)
        return imf, seeds

    args = (im,) + ((imf_prof,) if imf_prof is not None else ())
    return program(*args)

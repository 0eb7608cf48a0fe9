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
        qdiff, hist = _level_diff_hist(
            tile, th_seed, x0, shard_x, (z, x, y), gfilt_size,
            background_gfilt_size, filt_size, min_edge_distance, n_lvl)
        counts = jax.lax.psum(hist, axis_name)
        cum = jnp.cumsum(counts)
        reach = cum >= min_dynamic_seeds
        chosen = jnp.where(jnp.any(reach), jnp.argmax(reach), n_lvl - 1)
        th = jnp.maximum(jnp.asarray(th_seed, jnp.float32), 1e-6)
        chosen_th = th * (1.0 - chosen.astype(jnp.float32) / n_lvl)
        # level(q) <= chosen with the classification's exact arithmetic
        # (q = -inf maps to +inf level -> excluded)
        sel = (jnp.ceil((1.0 - qdiff / th) * n_lvl)
               <= chosen.astype(jnp.float32))
        xy_counts = jnp.sum(sel.astype(jnp.int32), axis=0)
        sel = sel & (xy_counts[None] < 3)
        n_sel = jax.lax.psum(jnp.sum(sel.astype(jnp.int32)), axis_name)

        # local top-k then global top-k over the gathered candidates
        masked = jnp.where(sel, qdiff, -jnp.inf).ravel()
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


# ---------------------------------------------------------------------------
# Full sharded round: correct -> drift -> seed -> fit, one shard_map program
# ---------------------------------------------------------------------------


def _sharded_fit(imf_local, x0, shard_x, axis_name, seeds_zxy, seeds_valid,
                 radius, min_w, max_w, init_w, min_delta_center,
                 max_delta_center, lm_iters, n_max_iter, max_dist_th,
                 max_neighbors, n_shards):
    """Batched LM fit of globally-known seeds on an x-sharded stack.

    Pixel blocks assemble by *core ownership*: every shard gathers the
    block pixels whose global x lies in its own core and `psum` sums the
    disjoint contributions (blocks are (N, |ball|) f32 — a few MB, never
    the image).  The LM work shards over spots: each device fits
    N/n_shards seeds, `all_gather` rebuilds the (N, 11) table each Jacobi
    subtract-refit round (KBs of ICI traffic per round).
    """
    from ..ops.gaussian_fit import (ball_offsets, lm_fit_single,
                                    neighbor_lists, ownership_mask,
                                    rebase_center_params, to_natural,
                                    _quadform_coeffs)

    z, _sx, y = imf_local.shape
    n = seeds_zxy.shape[0]
    assert n % n_shards == 0, "seed capacity must divide over shards"
    chunk = n // n_shards
    shard = jax.lax.axis_index(axis_name)

    offs = jnp.asarray(ball_offsets(radius))                 # (P, 3)
    base = seeds_zxy.astype(jnp.int32)
    pos = base[:, None, :] + offs[None, :, :]                # (N, P, 3)
    full_x = shard_x * n_shards
    shape_g = jnp.asarray([z, full_x, y], jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape_g[None, None]), axis=-1)
    owned = (pos[..., 1] >= x0) & (pos[..., 1] < x0 + shard_x)
    lx = jnp.clip(pos[..., 1] - x0, 0, shard_x - 1)
    lz = jnp.clip(pos[..., 0], 0, z - 1)
    ly = jnp.clip(pos[..., 2], 0, y - 1)
    flat = imf_local.reshape(-1)
    idx = (lz * shard_x + lx) * y + ly
    contrib = jnp.where(owned & inb, jnp.take(flat, idx), 0.0)
    pixels = jax.lax.psum(contrib, axis_name)                # (N, P)
    coords = pos.astype(jnp.float32)
    base_mask = inb & seeds_valid[:, None]

    nidx, nmask = neighbor_lists(seeds_zxy, seeds_valid,
                                 max_neighbors=max_neighbors, radius=radius)
    centers_est = seeds_zxy.astype(jnp.float32)
    own = jax.vmap(ownership_mask)(coords, seeds_zxy, seeds_zxy[nidx],
                                   nmask)

    def rows(x):
        return jax.lax.dynamic_slice_in_dim(x, shard * chunk, chunk, 0)

    # round 0: firstfit on the local spot chunk
    fit0 = jax.vmap(lambda px, co, mk, ce: lm_fit_single(
        px, co, mk, ce, min_delta_center, min_w, max_w, init_w, lm_iters))
    p_loc, e_loc = fit0(rows(pixels), rows(coords),
                        rows(base_mask & own), rows(centers_est))
    nat_loc = jax.vmap(lambda p, ce, e: to_natural(
        p, ce, min_delta_center, min_w, max_w, e))(
        p_loc, rows(centers_est), e_loc)
    p_loc = jax.vmap(lambda p, ce: rebase_center_params(
        p, ce, min_delta_center, max_delta_center))(p_loc,
                                                    rows(centers_est))

    def gather_rows(xl):
        g = jax.lax.all_gather(xl, axis_name)                # (D, chunk, ..)
        return g.reshape((n,) + xl.shape[1:])

    nat = gather_rows(nat_loc)
    repeat_iters = max(8, lm_iters // 3)

    def recon_at(coords_i, nat_rows, which, wmask):
        nb = nat_rows[which]

        def one(row, ok_):
            h, c1, c2, c3 = row[0], row[1], row[2], row[3]
            wz, wx, wy = row[5], row[6], row[7]
            sin_t, sin_p = row[8], row[9]
            s1 = 1.0 / jnp.maximum(wz * wz, 1e-6)
            s2 = 1.0 / jnp.maximum(wx * wx, 1e-6)
            s3 = 1.0 / jnp.maximum(wy * wy, 1e-6)
            a11, a22, a33, a12, a13, a23 = _quadform_coeffs(
                sin_t, sin_p, s1, s2, s3)
            d = coords_i - jnp.stack([c1, c2, c3])[None]
            q = (a11 * d[:, 0] ** 2 + a22 * d[:, 1] ** 2
                 + a33 * d[:, 2] ** 2 + a12 * d[:, 0] * d[:, 1]
                 + a13 * d[:, 0] * d[:, 2] + a23 * d[:, 1] * d[:, 2])
            return jnp.where(ok_, h * jnp.exp(-0.5 * q), 0.0)

        return jnp.sum(jax.vmap(one)(nb, wmask), axis=0)

    def round_body(state):
        i, nat, p_loc, e_loc, converged = state
        sub = jax.vmap(recon_at, in_axes=(0, None, 0, 0))(
            rows(coords), nat, rows(nidx), rows(nmask))
        target = rows(pixels) - sub
        fitk = jax.vmap(lambda px, co, mk, ce, p0: lm_fit_single(
            px, co, mk, ce, max_delta_center, min_w, max_w, init_w,
            repeat_iters, params0=p0))
        new_p, new_e = fitk(target, rows(coords), rows(base_mask),
                            rows(centers_est), p_loc)
        new_nat_loc = jax.vmap(lambda p, ce, e: to_natural(
            p, ce, max_delta_center, min_w, max_w, e))(
            new_p, rows(centers_est), new_e)
        new_nat = gather_rows(new_nat_loc)
        moved2 = jnp.sum((new_nat[:, 1:4] - nat[:, 1:4]) ** 2, axis=1)
        return i + 1, new_nat, new_p, new_e, moved2 < max_dist_th ** 2

    def round_cond(state):
        i, _, _, _, converged = state
        return (i < n_max_iter) & ~jnp.all(converged | ~seeds_valid)

    conv0 = jnp.zeros(n, bool) & seeds_valid
    _, nat, _, _, _ = jax.lax.while_loop(
        round_cond, round_body,
        (jnp.int32(0), nat, p_loc, e_loc, conv0))

    finite = jnp.all(jnp.isfinite(nat), axis=1)
    inside = jnp.all((nat[:, 1:4] > 0)
                     & (nat[:, 1:4] < shape_g.astype(jnp.float32)[None]),
                     axis=1)
    enough = jnp.sum(base_mask.astype(jnp.int32), axis=1) > 10
    return nat, seeds_valid & finite & inside & enough


def _drift_crop_plan(image_shape, shard_x, n_shards, drift_size):
    """Host-side static plan: crop boxes, per-shard crop assignment, and
    the right-halo width letting each owner slice its crops locally."""
    from ..ops.drift import generate_drift_crops

    boxes = generate_drift_crops(image_shape, drift_size)
    per_shard = [[] for _ in range(n_shards)]
    halo = 0
    for k, b in enumerate(boxes):
        lo_x, hi_x = int(b[1][0]), int(b[1][1])
        owner = min(lo_x // shard_x, n_shards - 1)
        halo = max(halo, hi_x - (owner + 1) * shard_x, 0)
        per_shard[owner].append((k, b))
    return boxes, per_shard, halo


def sharded_process_round(ims: jnp.ndarray, ref_im: jnp.ndarray,
                          mesh: Mesh,
                          drift_channel_index: int,
                          fit_channel_indices,
                          seed_thresholds,
                          illumination: Optional[jnp.ndarray] = None,
                          hot_pixel: bool = True,
                          hot_pixel_th: float = 0.5,
                          hot_pixel_ratio: float = 4.0,
                          z_shift: bool = True,
                          drift_size: Optional[int] = None,
                          upsample_factor: int = 100,
                          good_drift_th: float = 1.0,
                          min_good_drifts: int = 3,
                          drift_subtract_mean: bool = True,
                          drift_window: Optional[str] = "hann_xy",
                          max_num_seeds: int = 512,
                          dynamic_niters: int = 10,
                          min_dynamic_seeds: int = 1,
                          gfilt_size: float = 0.75,
                          background_gfilt_size: float = 7.5,
                          filt_size: int = 3,
                          min_edge_distance: int = 2,
                          radius: int = 5,
                          min_w: float = 0.5, max_w: float = 4.0,
                          init_w: float = 1.5,
                          min_delta_center: float = 1.0,
                          max_delta_center: float = 2.5,
                          lm_iters: int = 30, n_max_iter: int = 10,
                          max_dist_th: float = 0.1,
                          max_neighbors: int = 12,
                          axis_name: str = "data"):
    """One hybridization round, x-sharded across the whole mesh.

    The full sharded counterpart of FovPipeline.process_round (SURVEY
    §2.11 spatial sharding): fused corrections (ppermute halos + psum
    stats), 8-crop drift consensus (each crop registered by the shard
    owning its x range via a static crop plan, drift table psum'd),
    dynamic-threshold seeding (psum'd histogram + all_gather top-k), and
    spot-sharded LM fitting (`_sharded_fit`).  Returns (corrected
    (C, Z, X, Y) x-sharded, spots (F, N, 11), valid (F, N), drift (3,),
    drift_flag) — spot coordinates are drift-corrected (the modern
    warp_image=False path applies chromatic terms downstream).
    """
    from ..ops.drift import consensus_drift, subpixel_phase_correlation

    c, z, x, y = ims.shape
    n_dev = mesh.devices.size
    assert x % n_dev == 0, f"x={x} must divide over {n_dev} shards"
    shard_x = x // n_dev
    fit_idx = tuple(int(i) for i in fit_channel_indices)
    th = jnp.asarray(seed_thresholds, jnp.float32)
    assert max_num_seeds % n_dev == 0, \
        "max_num_seeds must divide over the mesh"

    def _radius_of(sigma):
        return int(4.0 * float(sigma) + 0.5) if sigma else 0

    seed_halo = max(_radius_of(gfilt_size),
                    _radius_of(background_gfilt_size)) + (filt_size // 2)
    boxes, per_shard, drift_halo = _drift_crop_plan(
        (z, x, y), shard_x, n_dev, drift_size)
    halo = max(seed_halo, drift_halo, 1)
    assert halo <= shard_x, "halo exceeds shard width; use fewer shards"
    n_lvl = dynamic_niters
    n_crops = len(boxes)
    prof = (None if illumination is None
            else jnp.asarray(illumination, jnp.float32))

    in_specs = (P(None, None, axis_name, None), P(None, axis_name, None))
    if prof is not None:
        in_specs += (P(None, axis_name, None),)
    out_specs = (P(None, None, axis_name, None), P(), P(), P(), P())

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def program(local, ref_local, *maybe_prof):
        shard = jax.lax.axis_index(axis_name)
        x0 = shard * shard_x

        def correct_one(imf, prof_ch):
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
                interior = ((gxi > 0) & (gxi < x - 1) & (gyi > 0)
                            & (gyi < y - 1))
                imf = jnp.where((hot2d & interior)[None], neigh, imf)
            if z_shift:
                layer_med = _psum_counting_median(imf, axis_name)
                global_med = _psum_counting_median(imf, axis_name,
                                                   axis=(0, 1, 2))
                imf = imf / layer_med[:, None, None] * global_med
            if prof_ch is not None:
                imf = imf / prof_ch[None]
            return jnp.clip(imf, 0.0, 65535.0)

        prof_l = maybe_prof[0] if maybe_prof else None
        corrected = jnp.stack([
            correct_one(local[ci].astype(jnp.float32),
                        None if prof_l is None else prof_l[ci])
            for ci in range(c)])

        # ---- drift: per-shard crop registration from halo tiles
        src_tile = halo_exchange(corrected[drift_channel_index],
                                 halo, axis_name)
        ref_tile = halo_exchange(ref_local.astype(jnp.float32),
                                 halo, axis_name)

        def shard_branch(assignments):
            def branch(_):
                table = jnp.zeros((n_crops, 3), jnp.float32)
                got = jnp.zeros((n_crops,), jnp.float32)
                for k, b in assignments:
                    z0, z1 = int(b[0][0]), int(b[0][1])
                    lx0 = int(b[1][0])
                    w = int(b[1][1] - b[1][0])
                    y0, y1 = int(b[2][0]), int(b[2][1])
                    # local x of the crop start inside the halo tile: the
                    # owner's core starts at `halo`; cores are shard_x
                    # wide, so subtract the owner's global core start
                    owner_x0 = min(lx0 // shard_x, n_dev - 1) * shard_x
                    sxl = lx0 - owner_x0 + halo
                    sc = jax.lax.dynamic_slice(
                        src_tile, (z0, sxl, y0), (z1 - z0, w, y1 - y0))
                    rc = jax.lax.dynamic_slice(
                        ref_tile, (z0, sxl, y0), (z1 - z0, w, y1 - y0))
                    d = subpixel_phase_correlation(
                        rc, sc, upsample_factor=upsample_factor,
                        subtract_mean=drift_subtract_mean,
                        window=drift_window)
                    table = table.at[k].set(d)
                    got = got.at[k].set(1.0)
                return table, got
            return branch

        table, got = jax.lax.switch(
            shard, [shard_branch(a) for a in per_shard], operand=None)
        table = jax.lax.psum(table, axis_name)
        got = jax.lax.psum(got, axis_name)
        drift, dflag = consensus_drift(
            jnp.where(got[:, None] > 0, table, jnp.inf),
            drift_diff_th=good_drift_th,
            min_good_drifts=min_good_drifts)

        # ---- seed + fit each fit channel
        spots_list, valid_list = [], []
        for ci in fit_idx:
            imf = corrected[ci]
            tile = halo_exchange(imf, halo, axis_name)
            qdiff, hist = _level_diff_hist(
                tile, th[ci], x0, shard_x, (z, x, y), gfilt_size,
                background_gfilt_size, filt_size, min_edge_distance,
                n_lvl)
            counts = jax.lax.psum(hist, axis_name)
            cum = jnp.cumsum(counts)
            reach = cum >= min_dynamic_seeds
            chosen = jnp.where(jnp.any(reach), jnp.argmax(reach),
                               n_lvl - 1)
            th_c = jnp.maximum(jnp.asarray(th[ci], jnp.float32), 1e-6)
            sel = (jnp.ceil((1.0 - qdiff / th_c) * n_lvl)
                   <= chosen.astype(jnp.float32))
            xy_counts = jnp.sum(sel.astype(jnp.int32), axis=0)
            sel = sel & (xy_counts[None] < 3)
            masked = jnp.where(sel, qdiff, -jnp.inf).ravel()
            k_local = min(max_num_seeds, masked.shape[0])
            v1, i1 = jax.lax.top_k(masked, k_local)
            zc = i1 // (shard_x * y)
            rem = i1 % (shard_x * y)
            flat_global = (zc * x + (rem // y + x0)) * y + rem % y
            v_all = jax.lax.all_gather(v1, axis_name).ravel()
            f_all = jax.lax.all_gather(flat_global, axis_name).ravel()
            hts, order = jax.lax.top_k(v_all, max_num_seeds)
            fidx = f_all[order]
            gz = fidx // (x * y)
            grem = fidx % (x * y)
            coords = jnp.stack([gz, grem // y, grem % y], axis=1)
            s_valid = jnp.isfinite(hts)
            coords = jnp.where(s_valid[:, None], coords, -1)

            nat, f_valid = _sharded_fit(
                imf, x0, shard_x, axis_name,
                coords.astype(jnp.float32), s_valid,
                radius, min_w, max_w, init_w, min_delta_center,
                max_delta_center, lm_iters, n_max_iter, max_dist_th,
                max_neighbors, n_dev)
            nat = nat.at[:, 1:4].add(drift[None])
            spots_list.append(nat)
            valid_list.append(f_valid)

        return (corrected, jnp.stack(spots_list), jnp.stack(valid_list),
                drift, dflag)

    args = (jnp.asarray(ims), jnp.asarray(ref_im))
    if prof is not None:
        args += (prof,)
    return program(*args)

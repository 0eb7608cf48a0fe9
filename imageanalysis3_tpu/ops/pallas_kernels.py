"""Pallas TPU kernels for the seeding hot path.

The seeding level pass (ops/seeding.py) runs several XLA stages over each
slab after the two Gaussian blurs: a 3^3 maximum filter on the foreground
blur, a 3^3 minimum filter on the background blur, and the local-max /
threshold-level classification.  Each stage is HBM-bandwidth bound;
fusing them into one Pallas kernel reads the two blurred stacks once and
writes the (int8 level, f32 diff) outputs once — the speed-of-light form
of the stencil.

The kernel tiles (Z, X, Y) over an (x, y) grid; each program DMAs a
halo-1 window from HBM into VMEM (overlapping windows aren't expressible
as BlockSpecs; Mosaic requires (8, 128)-aligned slices, so windows
over-fetch to the alignment), computes the separable 3-point min/max
stencil and the level classification on the VPU.  `interpret=True` runs
the same kernel under the Pallas interpreter — how the CPU test mesh
exercises it.

Measured on a v5e chip at 60x2048x2048: 0.072 s fused vs 0.069 s for the
unfused XLA stages — XLA's own fusion already reaches bandwidth here, and
the alignment over-fetch (a (48, 384) window per (16, 128) core) offsets
the single-pass advantage.  The production seeding path therefore keeps
the XLA form (ops/seeding.py); this kernel stays as the measured,
exact-parity Pallas alternative and the template for future stencils.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(params_smem, max_hbm, min_hbm, level_out, diff_out,
                    max_vmem, min_vmem, sem):
    """One (BZ, BX, BY) core tile: 3^3 max/min stencil + level classify.

    Mosaic requires HBM DMA slices aligned to the (8, 128) register
    tiling in the two minor dims, so each program over-fetches an aligned
    window: the sources are pre-padded by (1, 8, 128) and the window
    [k*BZ, k*BZ+BZ+2) x [i*BX, i*BX+BX+16) x [j*BY, j*BY+BY+256) in
    padded coordinates covers the core tile (at offset (1, 8, 128)) plus
    its halo-1 ring.  3D blocking keeps the over-fetch ratio ~2x (the
    earlier full-z version fetched (48, 384) windows per (16, 128) core —
    a 9x read amplification that lost to the unfused XLA form).
    """
    k = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    bzw, bxw, byw = max_vmem.shape        # (BZ+2, BX+16, BY+256)
    bz, bx, by = bzw - 2, bxw - 16, byw - 256

    cp1 = pltpu.make_async_copy(
        max_hbm.at[pl.ds(k * bz, bzw), pl.ds(i * bx, bxw),
                   pl.ds(j * by, byw)],
        max_vmem, sem.at[0])
    cp2 = pltpu.make_async_copy(
        min_hbm.at[pl.ds(k * bz, bzw), pl.ds(i * bx, bxw),
                   pl.ds(j * by, byw)],
        min_vmem, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    th = params_smem[0]
    n_lvl = params_smem[1].astype(jnp.int32)
    edge = params_smem[2].astype(jnp.int32)
    fz = params_smem[3].astype(jnp.int32)
    fx = params_smem[4].astype(jnp.int32)
    fy = params_smem[5].astype(jnp.int32)
    x0 = i * bx
    y0 = j * by
    z0 = k * bz

    def sep_reduce(v, op):
        """3-point separable window reduce -> core tile (halo'd input)."""
        v = op(op(v[:-2], v[1:-1]), v[2:])
        v = op(op(v[:, :-2], v[:, 1:-1]), v[:, 2:])
        return op(op(v[:, :, :-2], v[:, :, 1:-1]), v[:, :, 2:])

    # halo-1 window around the core: padded offsets
    # [0, bz+2) x [7, bx+9) x [127, by+129)
    mx = max_vmem[:, 7:bx + 9, 127:by + 129]
    mn = min_vmem[:, 7:bx + 9, 127:by + 129]
    max3 = sep_reduce(mx, jnp.maximum)
    min3 = sep_reduce(mn, jnp.minimum)
    core_max = mx[1:-1, 1:-1, 1:-1]
    core_min = mn[1:-1, 1:-1, 1:-1]
    local_max = (max3 == core_max) & (min3 != core_min)
    diff = core_max - core_min

    zi = jax.lax.broadcasted_iota(jnp.int32, (bz, bx, by), 0) + z0
    xi = jax.lax.broadcasted_iota(jnp.int32, (bz, bx, by), 1) + x0
    yi = jax.lax.broadcasted_iota(jnp.int32, (bz, bx, by), 2) + y0
    edge_ok = ((zi >= edge) & (zi <= fz - edge)
               & (xi >= edge) & (xi <= fx - edge)
               & (yi >= edge) & (yi <= fy - edge))
    qualify = local_max & edge_ok

    frac = 1.0 - diff / jnp.maximum(th, 1e-6)
    level = jnp.ceil(frac * n_lvl.astype(jnp.float32)).astype(jnp.int32)
    level = jnp.clip(level, 0, n_lvl)
    level = jnp.where(qualify, level, n_lvl)

    # int32 block output (int8 would demand a (32, 128) min tile
    # and larger VMEM windows); cast to int8 happens outside
    level_out[:] = level
    diff_out[:] = diff


@partial(jax.jit, static_argnames=("n_lvl", "min_edge_distance",
                                   "block_z", "block_x", "block_y",
                                   "interpret"))
def level_stencil_pallas(max_im: jnp.ndarray, min_im: jnp.ndarray,
                         th_seed, n_lvl: int,
                         min_edge_distance: int = 2,
                         block_z: int = 0, block_x: int = 32,
                         block_y: int = 256,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 3^3 max/min stencil + threshold-level classification.

    max_im / min_im: the foreground / background blurred stacks (Z, X, Y).
    Returns (level int8, diff f32, counts (n_lvl,)) with the exact
    semantics of the unfused path in ops/seeding.py.  The z-boundary
    replicates edges, which equals scipy 'reflect' for a 3-window.
    """
    z, x, y = max_im.shape
    if block_z <= 0:
        block_z = z
        for cand in (12, 10, 15, 8, 6, 5, 4, 20, 16):
            if z % cand == 0:
                block_z = cand
                break
    block_x = min(block_x, x)
    block_y = min(block_y, y)
    assert z % block_z == 0 and x % block_x == 0 and y % block_y == 0
    gz, gx, gy = z // block_z, x // block_x, y // block_y
    # (1, 8, 128)-aligned over-fetch padding; edge replication keeps the
    # stencil's boundary semantics
    pad = ((1, 1), (8, 8), (128, 128))
    mx = jnp.pad(max_im.astype(jnp.float32), pad, mode="edge")
    mn = jnp.pad(min_im.astype(jnp.float32), pad, mode="edge")
    params = jnp.asarray([float(th_seed) if np.isscalar(th_seed) else 0.0,
                          float(n_lvl), float(min_edge_distance),
                          float(z), float(x), float(y)], jnp.float32)
    if not np.isscalar(th_seed):
        params = params.at[0].set(jnp.asarray(th_seed, jnp.float32))

    level, diff = pl.pallas_call(
        _stencil_kernel,
        grid=(gz, gx, gy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_z, block_x, block_y),
                         lambda k, i, j: (k, i, j)),
            pl.BlockSpec((block_z, block_x, block_y),
                         lambda k, i, j: (k, i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, x, y), jnp.int32),
            jax.ShapeDtypeStruct((z, x, y), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_z + 2, block_x + 16, block_y + 256),
                       jnp.float32),
            pltpu.VMEM((block_z + 2, block_x + 16, block_y + 256),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, mx, mn)
    level = level.astype(jnp.int8)
    # per-level counts as compare-reduces over the int8 map (cheap)
    counts = jnp.stack([jnp.sum((level == k).astype(jnp.int32))
                        for k in range(n_lvl)])
    return level, diff, counts


# ---------------------------------------------------------------------------
# Fused dual-Gaussian x+y blur (the seeding hot path's real bandwidth sink)
# ---------------------------------------------------------------------------


def _xy_weights(kernel: np.ndarray, pad: int):
    """(WL, WR) (128, 128) lane-contraction matrices for one y-pass.

    Output lane c of block b reads padded lanes [128b + c + pad - r,
    ... + pad + r]; with `pad` >= r those indices live in blocks b and
    b+1, independent of b, so two shared (128, 128) matrices express the
    whole banded convolution (boundary values are pre-baked by symmetric
    padding)."""
    k = len(kernel)
    r = k // 2
    wl = np.zeros((128, 128), np.float32)
    wr = np.zeros((128, 128), np.float32)
    for c in range(128):
        for t in range(k):
            p = c + pad - r + t
            if p < 128:
                wl[p, c] += kernel[t]
            elif p < 256:
                wr[p - 128, c] += kernel[t]
    return wl, wr


def _x_weights(kernel: np.ndarray, bx: int, pad: int) -> np.ndarray:
    """(BX, BX + 2*pad) sublane-contraction matrix for one x-pass."""
    k = len(kernel)
    r = k // 2
    a = np.zeros((bx, bx + 2 * pad), np.float32)
    for row in range(bx):
        for t in range(k):
            a[row, row + pad - r + t] += kernel[t]
    return a


def _dual_blur_kernel(a7_ref, a61_ref, wl7_ref, wr7_ref, wl61_ref,
                      wr61_ref, fg_hbm, bg_hbm, fg_out, bg_out,
                      fgv, bgv, sem):
    """One (z, x-block): x-pass as an (BX, BX+64) sublane matmul, y-pass
    as two shared (128, 128) lane matmuls per source — all MXU work over
    VMEM-resident tiles."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    bxw, yp = fgv.shape                    # (BX + 64, Y + 128)
    bx = bxw - 64
    nb = (yp - 128) // 128

    cp1 = pltpu.make_async_copy(
        fg_hbm.at[i, pl.ds(j * bx, bxw), :], fgv, sem.at[0])
    cp2 = pltpu.make_async_copy(
        bg_hbm.at[i, pl.ds(j * bx, bxw), :], bgv, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def dot3(a, b):
        """~f32-accurate matmul in 3 bf16 MXU passes: split both
        operands into bf16 high+low parts and drop only the lo*lo term
        (~1e-5 relative) — half the cost of Precision.HIGHEST's 6-pass
        decomposition, and Mosaic offers nothing in between."""
        ah, al = split(a)
        bh, bl = split(b)
        f32 = jnp.float32
        return (jnp.dot(ah, bh, preferred_element_type=f32)
                + jnp.dot(ah, bl, preferred_element_type=f32)
                + jnp.dot(al, bh, preferred_element_type=f32))

    def pass_xy(v, a_ref, wl_ref, wr_ref):
        fx = dot3(a_ref[:], v[:])                             # (BX, YP)
        fb = fx.reshape(bx, nb + 1, 128)
        left = fb[:, :nb].reshape(bx * nb, 128)
        right = fb[:, 1:].reshape(bx * nb, 128)
        out = dot3(left, wl_ref[:]) + dot3(right, wr_ref[:])
        return out.reshape(bx, nb * 128)

    fg_out[0] = pass_xy(fgv[:], a7_ref, wl7_ref, wr7_ref)
    bg_out[0] = pass_xy(bgv[:], a61_ref, wl61_ref, wr61_ref)


@partial(jax.jit, static_argnames=("k7_key", "k61_key", "block_x",
                                   "interpret"))
def dual_blur_xy_pallas(fgz: jnp.ndarray, bgz: jnp.ndarray,
                        k7_key: Tuple[float, ...],
                        k61_key: Tuple[float, ...],
                        block_x: int = 128,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x+y Gaussian passes for TWO stacks in one fused kernel.

    fgz / bgz: the z-passed foreground/background stacks (Z, X, Y);
    k7_key / k61_key: their 1D kernels (radius <= 32 for x, <= 64 for y).
    Returns (k7-xy-blurred fgz, k61-xy-blurred bgz) with scipy
    mode='reflect' boundary semantics (symmetric padding is applied here,
    so the in-kernel convolution needs no boundary branches).

    Why: the unfused XLA form moves each 1 GB stack through HBM ~3x per
    axis per kernel (~100 ms of the 165 ms seeding pass at 60x2048x2048);
    this kernel reads each stack ~1.5x and writes once, doing all tap
    arithmetic as small MXU matmuls on VMEM tiles.
    """
    z, x, y = fgz.shape
    # pick a block that divides x: callers gate only on x % 8 == 0, so
    # shrink from the requested block until it divides (sublane-aligned
    # blocks down to 8 keep the (8, 128) register tiling happy)
    block_x = min(block_x, x)
    while x % block_x:
        block_x //= 2
    assert block_x >= 8 and x % block_x == 0 and y % 128 == 0
    k7 = np.asarray(k7_key, np.float32)
    k61 = np.asarray(k61_key, np.float32)
    assert len(k7) // 2 <= 32 and len(k61) // 2 <= 32, \
        "x padding (32) must cover the kernel radius"
    assert len(k7) // 2 <= 64 and len(k61) // 2 <= 64

    pad = ((0, 0), (32, 32), (64, 64))
    fgp = jnp.pad(fgz.astype(jnp.float32), pad, mode="symmetric")
    bgp = jnp.pad(bgz.astype(jnp.float32), pad, mode="symmetric")

    a7 = jnp.asarray(_x_weights(k7, block_x, 32))
    a61 = jnp.asarray(_x_weights(k61, block_x, 32))
    wl7, wr7 = map(jnp.asarray, _xy_weights(k7, 64))
    wl61, wr61 = map(jnp.asarray, _xy_weights(k61, 64))

    gx = x // block_x
    fg, bg = pl.pallas_call(
        _dual_blur_kernel,
        grid=(z, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 0 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a7
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a61
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wl7
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wr7
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wl61
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wr61
            pl.BlockSpec(memory_space=pltpu.ANY),    # fgp
            pl.BlockSpec(memory_space=pltpu.ANY),    # bgp
        ],
        out_specs=[
            pl.BlockSpec((1, block_x, y), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_x, y), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, x, y), jnp.float32),
            jax.ShapeDtypeStruct((z, x, y), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_x + 64, y + 128), jnp.float32),
            pltpu.VMEM((block_x + 64, y + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(a7, a61, wl7, wr7, wl61, wr61, fgp, bgp)
    return fg, bg


def dual_gaussian_blur(im: jnp.ndarray, sigma_fg: float, sigma_bg: float,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gaussian(im, sigma_fg), gaussian(im, sigma_bg)) via z-axis banded
    matmuls + the fused Pallas x/y kernel.  Exact scipy 'reflect' parity
    (same discrete kernels as ops.filters.gaussian_filter)."""
    from .filters import gaussian_kernel1d, _conv1d_along_axis

    k_fg = gaussian_kernel1d(sigma_fg)
    k_bg = gaussian_kernel1d(sigma_bg)
    imf = im.astype(jnp.float32)
    fgz = _conv1d_along_axis(imf, k_fg, 0, "reflect")
    bgz = _conv1d_along_axis(imf, k_bg, 0, "reflect")
    return dual_blur_xy_pallas(fgz, bgz, tuple(k_fg.tolist()),
                               tuple(k_bg.tolist()), interpret=interpret)


# ---------------------------------------------------------------------------
# Fully fused seeding classifier: dual blur + 3^3 stencil + level map in ONE
# kernel (the blurred stacks never touch HBM)
# ---------------------------------------------------------------------------


def _blur_stencil_kernel(params_smem, axf_ref, axb_ref, wlf_ref, wrf_ref,
                         wlb_ref, wrb_ref, fg_hbm, bg_hbm,
                         qdiff_out, hist_out,
                         fgv, bgv, ring_fg, ring_bg, sem,
                         *, n_lvl_static: int):
    """One (x-block, z-step): xy-blur plane k of both stacks into a 3-slot
    ring, then emit the 3^3 max/min stencil + threshold-level classification
    for plane k-1 from the ring.

    The spatial output is the single `qdiff` map: `diff` where the voxel
    qualifies (local max, inside the edge margin), `-inf` otherwise — the
    level map is only needed for the histogram, which is accumulated
    in-kernel, so writing it to HBM would be pure waste (get_seeds
    re-derives any level comparison from qdiff with identical arithmetic).

    Geometry: ring planes carry BX+8 x-rows covering core rows [-4, BX+4)
    (the x-pass matrix has BX+8 rows), so the x-stencil has exact halo-1
    data at block seams; the y-stencil uses +-inf edge columns (discarded
    by the min_edge_distance mask, exactly like the init-padded
    reduce_window of the unfused path); z edges replicate the boundary
    plane, which equals scipy 'reflect' for a 3-window.
    """
    i = pl.program_id(0)
    k = pl.program_id(1)
    nz = pl.num_programs(1) - 1
    nring, bxe, ycore = ring_fg.shape           # (3, BX+8, Y)
    bx = bxe - 8
    bxw, yp = fgv.shape                          # (BX+80, Y+128)
    nb = (yp - 128) // 128

    th = params_smem[0]
    n_lvl_f = params_smem[1]
    edge = params_smem[2].astype(jnp.int32)
    fz = params_smem[3].astype(jnp.int32)
    fx = params_smem[4].astype(jnp.int32)
    fy = params_smem[5].astype(jnp.int32)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def dot3(a, b):
        ah, al = split(a)
        bh, bl = split(b)
        f32 = jnp.float32
        return (jnp.dot(ah, bh, preferred_element_type=f32)
                + jnp.dot(ah, bl, preferred_element_type=f32)
                + jnp.dot(al, bh, preferred_element_type=f32))

    @pl.when(k < nz)
    def _load_and_blur():
        cp1 = pltpu.make_async_copy(
            fg_hbm.at[k, pl.ds(i * bx, bxw), :], fgv, sem.at[0])
        cp2 = pltpu.make_async_copy(
            bg_hbm.at[k, pl.ds(i * bx, bxw), :], bgv, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def pass_xy(v, a_ref, wl_ref, wr_ref):
            fxp = dot3(a_ref[:], v)                       # (BX+8, YP)
            fb = fxp.reshape(bxe, nb + 1, 128)
            left = fb[:, :nb].reshape(bxe * nb, 128)
            right = fb[:, 1:].reshape(bxe * nb, 128)
            out = dot3(left, wl_ref[:]) + dot3(right, wr_ref[:])
            return out.reshape(bxe, nb * 128)

        slot = jax.lax.rem(k, 3)
        ring_fg[pl.ds(slot, 1)] = pass_xy(fgv[:], axf_ref, wlf_ref,
                                          wrf_ref)[None]
        ring_bg[pl.ds(slot, 1)] = pass_xy(bgv[:], axb_ref, wlb_ref,
                                          wrb_ref)[None]

    @pl.when(k >= 1)
    def _emit():
        j = k - 1
        s_cur = jax.lax.rem(j, 3)
        s_prev = jnp.where(j > 0, jax.lax.rem(j + 2, 3), s_cur)
        s_next = jnp.where(k < nz, jax.lax.rem(k, 3), s_cur)

        def ring3(ring):
            cur = ring[pl.ds(s_cur, 1)][0]
            prev = ring[pl.ds(s_prev, 1)][0]
            nxt = ring[pl.ds(s_next, 1)][0]
            return prev, cur, nxt

        pf, cf, nf = ring3(ring_fg)
        pb, cb, nb_ = ring3(ring_bg)

        zmax = jnp.maximum(jnp.maximum(pf, cf), nf)           # (BX+8, Y)
        zmin = jnp.minimum(jnp.minimum(pb, cb), nb_)
        xmax = jnp.maximum(jnp.maximum(zmax[3:3 + bx], zmax[4:4 + bx]),
                           zmax[5:5 + bx])                    # (BX, Y)
        xmin = jnp.minimum(jnp.minimum(zmin[3:3 + bx], zmin[4:4 + bx]),
                           zmin[5:5 + bx])

        def y3(a, op, fill):
            # lane-shift via roll + iota-masked edge fill (Mosaic cannot
            # lower a lane-dim concatenate of mismatched offsets)
            yi = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            left = jnp.where(yi == 0, fill, pltpu.roll(a, 1, 1))
            right = jnp.where(yi == a.shape[1] - 1, fill,
                              pltpu.roll(a, a.shape[1] - 1, 1))
            return op(op(left, a), right)

        max3 = y3(xmax, jnp.maximum, -jnp.inf)
        min3 = y3(xmin, jnp.minimum, jnp.inf)
        core_fg = cf[4:4 + bx]
        core_bg = cb[4:4 + bx]
        local_max = (max3 == core_fg) & (min3 != core_bg)
        diff = core_fg - core_bg

        zi = j
        xi = jax.lax.broadcasted_iota(jnp.int32, (bx, ycore), 0) + i * bx
        yi = jax.lax.broadcasted_iota(jnp.int32, (bx, ycore), 1)
        edge_ok = ((zi >= edge) & (zi <= fz - edge)
                   & (xi >= edge) & (xi <= fx - edge)
                   & (yi >= edge) & (yi <= fy - edge))
        qualify = local_max & edge_ok

        n_lvl = n_lvl_f.astype(jnp.int32)
        frac = 1.0 - diff / jnp.maximum(th, 1e-6)
        level = jnp.ceil(frac * n_lvl_f).astype(jnp.int32)
        level = jnp.clip(level, 0, n_lvl)
        level = jnp.where(qualify, level, n_lvl)

        qdiff_out[0] = jnp.where(qualify, diff, -jnp.inf)

        # per-level counts accumulated across z steps (the (8, 128) block
        # satisfies the TPU tile minimum; only sublane 0 is meaningful)
        lanes = hist_out.shape[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
        hv = jnp.zeros((8, lanes), jnp.int32)
        for l in range(n_lvl_static):
            cnt = jnp.sum((level == l).astype(jnp.int32))
            hv = hv + jnp.where(lane == l, cnt, 0)
        prev_h = hist_out[0]
        hist_out[0] = jnp.where(k == 1, hv, prev_h + hv)


@partial(jax.jit, static_argnames=("n_lvl", "min_edge_distance",
                                   "sigma_fg", "sigma_bg", "block_x",
                                   "interpret"))
def fused_seed_classify(im: jnp.ndarray, sigma_fg: float, sigma_bg: float,
                        th_seed, n_lvl: int,
                        min_edge_distance: int = 2,
                        block_x: int = 64,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Seeding classifier in one fused pass: returns (qdiff f32,
    counts (n_lvl,)) with the exact semantics of the unfused
    ops/seeding.py path (gaussian blurs sigma_fg/sigma_bg, 3^3 stencil,
    dynamic-threshold level map) for min_edge_distance >= 1, filt_size 3.
    `qdiff` is the foreground-background signal where the voxel qualifies
    as a seed candidate and -inf elsewhere.

    Structure: (1) pad raw once in x/y (symmetric); (2) both z-passes as
    ONE banded-matmul einsum reading the padded raw a single time;
    (3) the pallas kernel streams z-planes through xy-blur into a VMEM
    ring and emits level/diff/hist directly — the blurred stacks never
    reach HBM (the unfused path writes and re-reads them, ~4 GB of
    traffic at 60x2048x2048).
    """
    from .filters import (CONV_PRECISION, _band_matrix, gaussian_kernel1d)

    z, x, y = im.shape
    k_fg = gaussian_kernel1d(sigma_fg)
    k_bg = gaussian_kernel1d(sigma_bg)
    r_max = max(len(k_fg), len(k_bg)) // 2
    assert r_max <= 36, "x-pass pad (36) must cover the kernel radius"
    assert r_max <= 64, "y-pass pad (64) must cover the kernel radius"
    assert min_edge_distance >= 1 and z >= 2
    block_x = min(block_x, x)
    while x % block_x:
        block_x //= 2
    assert block_x >= 8 and y % 128 == 0

    imf = im.astype(jnp.float32)
    imp = jnp.pad(imf, ((0, 0), (40, 40), (64, 64)), mode="symmetric")
    wz = np.stack([_band_matrix(z, tuple(k_fg.tolist()), "reflect"),
                   _band_matrix(z, tuple(k_bg.tolist()), "reflect")])
    fgbg = jnp.einsum("Kzw,wxy->Kzxy", jnp.asarray(wz), imp,
                      precision=CONV_PRECISION)

    axf = jnp.asarray(_x_weights(k_fg, block_x + 8, 36))
    axb = jnp.asarray(_x_weights(k_bg, block_x + 8, 36))
    wlf, wrf = map(jnp.asarray, _xy_weights(k_fg, 64))
    wlb, wrb = map(jnp.asarray, _xy_weights(k_bg, 64))

    params = jnp.stack([jnp.asarray(th_seed, jnp.float32),
                        jnp.float32(n_lvl),
                        jnp.float32(min_edge_distance),
                        jnp.float32(z), jnp.float32(x), jnp.float32(y)])

    gx = x // block_x
    qdiff, hist = pl.pallas_call(
        partial(_blur_stencil_kernel, n_lvl_static=n_lvl),
        grid=(gx, z + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # axf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # axb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wlf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wrf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wlb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wrb
            pl.BlockSpec(memory_space=pltpu.ANY),    # fgz padded
            pl.BlockSpec(memory_space=pltpu.ANY),    # bgz padded
        ],
        out_specs=[
            pl.BlockSpec((1, block_x, y),
                         lambda i, k: (jnp.maximum(k - 1, 0), i, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, k: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, x, y), jnp.float32),
            jax.ShapeDtypeStruct((gx, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_x + 80, y + 128), jnp.float32),
            pltpu.VMEM((block_x + 80, y + 128), jnp.float32),
            pltpu.VMEM((3, block_x + 8, y), jnp.float32),
            pltpu.VMEM((3, block_x + 8, y), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, axf, axb, wlf, wrf, wlb, wrb, fgbg[0], fgbg[1])
    counts = jnp.sum(hist[:, 0, :n_lvl], axis=0)
    return qdiff, counts


# ---------------------------------------------------------------------------
# Pyramid-background fused classifier: the bg blur (sigma ~7.5 -> 61-tap
# reach) runs on a 4x4-pooled grid and is bilinearly upsampled in-kernel,
# so the full-resolution background stack never exists in HBM.
# ---------------------------------------------------------------------------


def _up_x_matrix(bxe: int) -> np.ndarray:
    """(BXE, BXS+8) bilinear x-upsample matrix for one ring block.

    Ring row t holds fine row X0 - 4 + t (X0 = block start); the small
    buffer's row 0 holds pooled row X0/4 - 2 (two edge rows of lead-in),
    so the half-pixel-aligned source coordinate is (t + 2.5) / 4.
    Weights are multiples of 1/8 -- exact in bfloat16.
    """
    bxs = (bxe - 8) // 4
    u = np.zeros((bxe, bxs + 8), np.float32)
    for t in range(bxe):
        b = (t + 2.5) / 4.0
        i0 = int(np.floor(b))
        w = b - i0
        u[t, i0] += 1.0 - w
        u[t, i0 + 1] += w
    return u


def _up_y_matrix(ys_buf: int, y: int) -> np.ndarray:
    """(YS_BUF, Y) bilinear y-upsample matrix (lane contraction).

    Buffer lane 2 holds pooled column 0 (two edge columns of lead-in);
    fine column Y reads source coordinate (Y + 0.5) / 4 - 0.5 + 2.
    """
    u = np.zeros((ys_buf, y), np.float32)
    for col in range(y):
        b = (col + 0.5) / 4.0 - 0.5 + 2.0
        i0 = int(np.floor(b))
        w = b - i0
        u[i0, col] += 1.0 - w
        u[i0 + 1, col] += w
    return u


def _pyramid_stencil_kernel(params_smem, axf_ref, wlf_ref, wrf_ref,
                            ux_ref, uy_ref, fg_hbm, bgs_hbm,
                            qdiff_out, hist_out,
                            fgv, bgsv, ring_fg, ring_bg, sem,
                            *, n_lvl_static: int,
                            zk: "tuple | None" = None):
    """One (x-block, z-step): xy-blur the z-passed FOREGROUND plane,
    bilinearly upsample the pooled-and-blurred BACKGROUND plane, push
    both into 3-slot rings, then emit the 3^3 stencil + level classify
    for plane k-1 (same two-phase structure as _blur_stencil_kernel).

    The fg x window is only BX+32 rows (halo 16 each side: the fg kernel
    radius is <= 12 plus the stencil's 4-row ring reach) instead of the
    exact kernel's BX+80 -- the bg blur, whose 30-px reach forced that
    window, now arrives as a (BXS+8, YS_BUF) pooled tile and two MXU
    interpolation matmuls.

    Input DMAs are double-buffered: step k prefetches plane k+1 into the
    other slot before waiting on plane k, so the HBM reads ride under the
    blur/upsample compute (the start->wait-per-step form was
    latency-serialized at ~2k grid steps and left the kernel ~1.7x off
    its bandwidth bound).

    When `zk` (7 static z-blur taps, radius 3) is given, `fg_hbm` is the
    padded RAW stack and the fg z-pass happens HERE: raw planes stream
    through an 8-slot VMEM ring (planes k-3..k+3 live, +1 prefetch) and
    blurred plane k is the 7-tap f32 weighted sum of ring slots — the
    z-passed stack never exists in HBM, removing the host-side pad+einsum
    round-trip (~2.2 GB + 3x bf16 operand re-reads at 60x2048x2048).
    Boundary planes mirror symmetrically (scipy 'reflect'), matching the
    band matrix the einsum path uses.
    """
    i = pl.program_id(0)
    k = pl.program_id(1)
    nz = pl.num_programs(1) - 1
    nring, bxe, ycore = ring_fg.shape           # (3, BX+8, Y)
    bx = bxe - 8
    nslots, bxw, yp = fgv.shape                  # (2 | 8, BX+32, Y+128)
    nb = (yp - 128) // 128

    th = params_smem[0]
    n_lvl_f = params_smem[1]
    edge = params_smem[2].astype(jnp.int32)
    fz = params_smem[3].astype(jnp.int32)
    fx = params_smem[4].astype(jnp.int32)
    fy = params_smem[5].astype(jnp.int32)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    f32 = jnp.float32

    def dot3(a, b):
        ah, al = split(a)
        bh, bl = split(b)
        return (jnp.dot(ah, bh, preferred_element_type=f32)
                + jnp.dot(ah, bl, preferred_element_type=f32)
                + jnp.dot(al, bh, preferred_element_type=f32))

    def dot2_wb(w_bf16, b):
        """Exact-bf16 weights x f32 values in two MXU passes."""
        bh, bl = split(b)
        return (jnp.dot(w_bf16, bh, preferred_element_type=f32)
                + jnp.dot(w_bf16, bl, preferred_element_type=f32))

    def dot2_bw(a, w_bf16):
        ah, al = split(a)
        return (jnp.dot(ah, w_bf16, preferred_element_type=f32)
                + jnp.dot(al, w_bf16, preferred_element_type=f32))

    fz_mirror = params_smem[3].astype(jnp.int32)

    def fg_dma(slot, plane):
        if zk is not None:
            # symmetric-reflect plane index: raw planes outside [0, z)
            # mirror back in (band-matrix 'reflect' semantics)
            plane = jnp.where(plane < 0, -plane - 1, plane)
            plane = jnp.where(plane >= fz_mirror,
                              2 * fz_mirror - 1 - plane, plane)
        return pltpu.make_async_copy(
            fg_hbm.at[plane, pl.ds(i * bx + 24, bxw), :],
            fgv.at[slot], sem.at[0, slot])

    def bg_dma(slot, plane):
        return pltpu.make_async_copy(
            bgs_hbm.at[plane, pl.ds(i * (bx // 4), bx // 4 + 8), :],
            bgsv.at[slot], sem.at[1, slot])

    @pl.when(k == 0)
    def _warmup():
        if zk is None:
            fg_dma(0, 0).start()
        else:
            # blurred plane 0 needs raw planes -3..3 (mirrored); slot(p)
            # = (p + 3) % 8 so the steady-state ring holds k-3..k+4
            for p in range(-3, 4):
                fg_dma((p + 3) % 8, jnp.int32(p)).start()
        bg_dma(0, 0).start()

    @pl.when(k + 1 < nz)
    def _prefetch():
        if zk is None:
            fg_dma(jax.lax.rem(k + 1, 2), k + 1).start()
        else:
            # blur at step k+1 needs raw plane k+4 -> slot (k+7) % 8,
            # overwriting plane k-4 (last read at step k-1)
            fg_dma(jax.lax.rem(k + 7, 8), k + 4).start()
        bg_dma(jax.lax.rem(k + 1, 2), k + 1).start()

    @pl.when(k < nz)
    def _load_and_blur():
        cur = jax.lax.rem(k, 2)
        if zk is None:
            fg_dma(cur, k).wait()
            zblur = fgv[cur]
        else:
            @pl.when(k == 0)
            def _wait_warmup():
                for p in range(-3, 3):
                    fg_dma((p + 3) % 8, jnp.int32(p)).wait()

            fg_dma(jax.lax.rem(k + 6, 8), k + 3).wait()
            zblur = zk[0] * fgv[pl.ds(jax.lax.rem(k, 8), 1)][0]
            for j in range(1, 7):
                zblur = zblur + zk[j] * fgv[
                    pl.ds(jax.lax.rem(k + j, 8), 1)][0]
        bg_dma(cur, k).wait()

        fxp = dot3(axf_ref[:], zblur)                  # (BXE, YP)
        fb = fxp.reshape(bxe, nb + 1, 128)
        left = fb[:, :nb].reshape(bxe * nb, 128)
        right = fb[:, 1:].reshape(bxe * nb, 128)
        fgp = (dot3(left, wlf_ref[:])
               + dot3(right, wrf_ref[:])).reshape(bxe, nb * 128)

        # background: y-upsample on the small x grid, then x-upsample
        by = dot2_bw(bgsv[cur], uy_ref[:])             # (BXS+8, Y)
        bgp = dot2_wb(ux_ref[:], by)                   # (BXE, Y)

        slot = jax.lax.rem(k, 3)
        ring_fg[pl.ds(slot, 1)] = fgp[None]
        ring_bg[pl.ds(slot, 1)] = bgp[None]

    @pl.when(k >= 1)
    def _emit():
        j = k - 1
        s_cur = jax.lax.rem(j, 3)
        s_prev = jnp.where(j > 0, jax.lax.rem(j + 2, 3), s_cur)
        s_next = jnp.where(k < nz, jax.lax.rem(k, 3), s_cur)

        def ring3(ring):
            cur = ring[pl.ds(s_cur, 1)][0]
            prev = ring[pl.ds(s_prev, 1)][0]
            nxt = ring[pl.ds(s_next, 1)][0]
            return prev, cur, nxt

        pf, cf, nf = ring3(ring_fg)
        _, cb, _ = ring3(ring_bg)

        zmax = jnp.maximum(jnp.maximum(pf, cf), nf)           # (BX+8, Y)
        xmax = jnp.maximum(jnp.maximum(zmax[3:3 + bx], zmax[4:4 + bx]),
                           zmax[5:5 + bx])                    # (BX, Y)

        def y3(a, op, fill):
            yi = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            left = jnp.where(yi == 0, fill, pltpu.roll(a, 1, 1))
            right = jnp.where(yi == a.shape[1] - 1, fill,
                              pltpu.roll(a, a.shape[1] - 1, 1))
            return op(op(left, a), right)

        max3 = y3(xmax, jnp.maximum, -jnp.inf)
        core_fg = cf[4:4 + bx]
        core_bg = cb[4:4 + bx]
        # the plateau guard lives in the host-side sentinel (see the
        # wrapper): no fine-scale bg min stencil here
        local_max = max3 == core_fg
        diff = core_fg - core_bg

        zi = j
        xi = jax.lax.broadcasted_iota(jnp.int32, (bx, ycore), 0) + i * bx
        yi = jax.lax.broadcasted_iota(jnp.int32, (bx, ycore), 1)
        edge_ok = ((zi >= edge) & (zi <= fz - edge)
                   & (xi >= edge) & (xi <= fx - edge)
                   & (yi >= edge) & (yi <= fy - edge))
        qualify = local_max & edge_ok

        n_lvl = n_lvl_f.astype(jnp.int32)
        frac = 1.0 - diff / jnp.maximum(th, 1e-6)
        level = jnp.ceil(frac * n_lvl_f).astype(jnp.int32)
        level = jnp.clip(level, 0, n_lvl)
        level = jnp.where(qualify, level, n_lvl)

        qdiff_out[0] = jnp.where(qualify, diff, -jnp.inf)

        lanes = hist_out.shape[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
        hv = jnp.zeros((8, lanes), jnp.int32)
        for l in range(n_lvl_static):
            cnt = jnp.sum((level == l).astype(jnp.int32))
            hv = hv + jnp.where(lane == l, cnt, 0)
        prev_h = hist_out[0]
        hist_out[0] = jnp.where(k == 1, hv, prev_h + hv)


@partial(jax.jit, static_argnames=("n_lvl", "min_edge_distance",
                                   "sigma_fg", "sigma_bg", "block_x",
                                   "interpret"))
def fused_seed_classify_pyramid(im: jnp.ndarray, sigma_fg: float,
                                sigma_bg: float, th_seed, n_lvl: int,
                                min_edge_distance: int = 2,
                                block_x: int = 64,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_seed_classify with a pyramid background: the bg Gaussian
    (the 30-px-reach pass that dominates the exact kernel's HBM traffic)
    runs on a 4x4 xy-pooled grid at sigma/4 and is bilinearly upsampled
    inside the kernel via MXU matmuls.

    Accuracy: pooling a sigma=7.5-smooth field is band-limited, so the
    approximation error is <~1.2% of the background value (~5 intensity
    units at camera scale); on planted-spot stacks the selected seed set
    is IDENTICAL to the exact path (tests/test_pallas.py).  The exact
    kernel remains the default; SeedConfig.pyramid_bg opts in.

    Traffic at 60x2048x2048 f32: the z-pass einsum halves (fg only) and
    the per-block x window shrinks from BX+80 to BX+32 rows -- ~6.5 GB
    vs ~11 GB for the exact kernel.
    """
    from .filters import (CONV_PRECISION, _band_matrix, _conv1d_along_axis,
                          gaussian_kernel1d)

    z, x, y = im.shape
    k_fg = gaussian_kernel1d(sigma_fg)
    k_bg = gaussian_kernel1d(sigma_bg)
    r_fg = len(k_fg) // 2
    assert r_fg <= 12, "fg x halo (16) must cover the kernel radius + 4"
    assert r_fg <= 64, "y-pass pad (64) must cover the kernel radius"
    assert min_edge_distance >= 1 and z >= 2
    block_x = min(block_x, x)
    while x % block_x:
        block_x //= 2
    assert block_x >= 32 and block_x % 32 == 0, \
        "pyramid path needs 32-aligned x blocks (pooled rows stay 8-aligned)"
    assert x % 4 == 0 and y % 4 == 0 and y % 128 == 0
    bxe = block_x + 8
    bxs = block_x // 4
    xs, ys = x // 4, y // 4
    # pooled-bg buffer last dim must be a 128 multiple or its per-plane
    # DMA slice violates Mosaic's (8,128) tiling (y=2048 gives 640 and is
    # naturally aligned; y=128 gives 160 and is not).  The extra columns
    # are edge-padding multiplied by zero upsample weights.
    ys_buf = -((ys + 128) // -128) * 128

    imf = im.astype(jnp.float32)
    imp = jnp.pad(imf, ((0, 0), (40, 40), (64, 64)), mode="symmetric")
    # fg z-pass: fused into the kernel when the taps fit its fixed
    # radius-3 ring (the standard sigma 0.75 -> radius 3) and z is deep
    # enough for single-mirror boundary indexing; else the banded-matmul
    # einsum materializes fgz in HBM (the pre-r5 form)
    fuse_z = r_fg <= 3 and z >= 8
    if fuse_z:
        zk = np.zeros(7, np.float32)
        zk[3 - r_fg:4 + r_fg] = k_fg
        fg_in = imp
    else:
        zk = None
        wz = _band_matrix(z, tuple(k_fg.tolist()), "reflect")
        fg_in = jnp.einsum("zw,wxy->zxy", jnp.asarray(wz), imp,
                           precision=CONV_PRECISION)

    # pooled background pyramid: mean-pool 4x4, z-blur at full kernel,
    # xy-blur at sigma/4 (pooling's own bandlimit makes up the rest;
    # validated <=1.2% of bg against the exact blur).  reduce_window
    # form: the reshape-mean materializes a lane-retiled copy and runs
    # ~7 ms slower at FOV scale (scripts/profile_pad_pool.py)
    pooled = jax.lax.reduce_window(imf, 0.0, jax.lax.add,
                                   (1, 4, 4), (1, 4, 4), "VALID") / 16.0
    k_bgs = gaussian_kernel1d(float(sigma_bg) / 4.0)
    bgs = _conv1d_along_axis(pooled, k_bg, 0, "reflect")
    bgs = _conv1d_along_axis(bgs, k_bgs, 1, "reflect")
    bgs = _conv1d_along_axis(bgs, k_bgs, 2, "reflect")
    # Plateau guard.  The exact path rejects voxels where min3(bg) == bg:
    # on smooth f32 backgrounds that is (a) whole flat/saturated plateaus
    # and (b) the measure-zero set of strict local-minimum voxels.  A
    # bilinear surface has local minima AT its sample points, so keeping
    # the fine-scale min-tie here would spuriously reject ~0.4% of
    # voxels (every pooled cell that is an axial local minimum).  The
    # pyramid path therefore guards plateaus at cell resolution — cells
    # whose 3^3 neighborhood has zero range get a large finite sentinel
    # that drives diff far below any threshold (+inf would turn the
    # interpolation matmul's explicit zeros into NaNs) — and does not
    # reject strict-minimum voxels (they are never fg maxima over
    # threshold on real backgrounds).
    def ext3(a, axis, op):
        lo = jnp.concatenate([jax.lax.slice_in_dim(a, 0, 1, axis=axis),
                              jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1,
                                                   axis=axis)], axis=axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(a, 1, a.shape[axis],
                                                   axis=axis),
                              jax.lax.slice_in_dim(a, a.shape[axis] - 1,
                                                   a.shape[axis],
                                                   axis=axis)], axis=axis)
        return op(op(lo, a), hi)

    def box3(a, op):
        return ext3(ext3(ext3(a, 0, op), 1, op), 2, op)

    bmax = box3(bgs, jnp.maximum)
    bmin = box3(bgs, jnp.minimum)
    # relative tolerance: f32 summation-order noise on constant input is
    # ~2e-6 of the value, real background texture is >= 1e-4 over 3 cells
    flat = (bmax - bmin) <= 4e-5 * jnp.maximum(jnp.abs(bmax), 1.0)
    bgs = jnp.where(flat, jnp.float32(1e9), bgs)
    # 2 lead-in edge rows/cols (bilinear clamp), tails to aligned sizes
    bgp = jnp.pad(bgs, ((0, 0), (2, 14), (2, ys_buf - ys - 2)),
                  mode="edge")

    axf = jnp.asarray(_x_weights(k_fg, bxe, 12))        # (BXE, BX+32)
    wlf, wrf = map(jnp.asarray, _xy_weights(k_fg, 64))
    ux = jnp.asarray(_up_x_matrix(bxe), jnp.bfloat16)
    uy = jnp.asarray(_up_y_matrix(ys_buf, y), jnp.bfloat16)

    params = jnp.stack([jnp.asarray(th_seed, jnp.float32),
                        jnp.float32(n_lvl),
                        jnp.float32(min_edge_distance),
                        jnp.float32(z), jnp.float32(x), jnp.float32(y)])

    gx = x // block_x
    qdiff, hist = pl.pallas_call(
        partial(_pyramid_stencil_kernel, n_lvl_static=n_lvl,
                zk=tuple(zk.tolist()) if fuse_z else None),
        grid=(gx, z + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # axf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wlf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wrf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # uy
            pl.BlockSpec(memory_space=pltpu.ANY),    # fgz padded
            pl.BlockSpec(memory_space=pltpu.ANY),    # bg small padded
        ],
        out_specs=[
            pl.BlockSpec((1, block_x, y),
                         lambda i, k: (jnp.maximum(k - 1, 0), i, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, k: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, x, y), jnp.float32),
            jax.ShapeDtypeStruct((gx, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 if fuse_z else 2, block_x + 32, y + 128),
                       jnp.float32),
            pltpu.VMEM((2, bxs + 8, ys_buf), jnp.float32),
            pltpu.VMEM((3, bxe, y), jnp.float32),
            pltpu.VMEM((3, bxe, y), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
        interpret=interpret,
    )(params, axf, wlf, wrf, ux, uy, fg_in, bgp)
    counts = jnp.sum(hist[:, 0, :n_lvl], axis=0)
    return qdiff, counts

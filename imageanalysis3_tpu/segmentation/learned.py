"""Learned cell segmentation: a small 3D UNet predicting cellpose-style
outputs (center-directed flow field + cell probability) and a
flow-following mask reconstruction, all jittable.

Behavior target: the reference's production segmentation is Cellpose 3D
on polyT+DAPI followed by random-walker refinement
(segmentation_tools/cell.py:192-362).  Cellpose itself is a torch
package the reference shells out to; the TPU-native equivalent here is
the same *computation* as a functional JAX program:

  * `unet_apply` — an anisotropy-aware 3D UNet ((1,2,2) pooling, so z
    stays unpooled at typical 8-60 plane stacks) emitting a 3-vector
    flow per voxel plus a cell-probability logit;
  * `masks_from_flows` — cellpose's dynamics step: every foreground
    voxel is advected along the flow field (trilinear sampling,
    `lax.fori_loop`), landing positions are histogrammed, basin peaks
    become cells, and each voxel joins the cell its trajectory lands in;
  * `labels_to_flows` — training-target generation (unit vectors toward
    each cell's center of mass), enabling both fine-tuning on-device
    (`fit_unet`, optax) and the synthetic-truth credibility tests;
  * `save_weights` / `load_weights` — .npz param I/O, the pluggable
    path for externally converted weights.

Everything is static-shaped and jit/vmap-safe; the rollout and the
basin clustering use fixed iteration counts and capacity caps instead
of data-dependent loops.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .nuclei import propagate_labels


# ---------------------------------------------------------------------------
# Small functional 3D UNet
# ---------------------------------------------------------------------------


def _conv_init(rng, k, c_in, c_out):
    fan_in = c_in * int(np.prod(k))
    w = jax.random.normal(rng, k + (c_in, c_out), jnp.float32) \
        * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def _conv(p, x, stride=(1, 1, 1)):
    """x: (Z, X, Y, C) -> (Z', X', Y', C'); SAME padding."""
    y = jax.lax.conv_general_dilated(
        x[None], p["w"], window_strides=stride, padding="SAME",
        dimension_numbers=("NZXYC", "ZXYIO", "NZXYC"))[0]
    return y + p["b"]


def _norm(x):
    """Channel-wise instance norm (no learned affine — the conv biases
    absorb the shift)."""
    mu = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def init_unet_params(rng, in_channels: int = 1, base: int = 16,
                     levels: int = 3) -> Dict:
    """He-initialized parameter pytree for `unet_apply`."""
    keys = iter(jax.random.split(rng, 6 * levels + 4))
    enc, dec = [], []
    c_prev = in_channels
    widths = [base * 2 ** i for i in range(levels)]
    for c in widths:
        enc.append({"a": _conv_init(next(keys), (3, 3, 3), c_prev, c),
                    "b": _conv_init(next(keys), (3, 3, 3), c, c)})
        c_prev = c
    for i in reversed(range(levels - 1)):
        c = widths[i]
        dec.append({"a": _conv_init(next(keys), (3, 3, 3),
                                    c_prev + c, c),
                    "b": _conv_init(next(keys), (3, 3, 3), c, c)})
        c_prev = c
    head = _conv_init(next(keys), (1, 1, 1), c_prev, 4)
    return {"enc": enc, "dec": dec, "head": head}


def unet_apply(params: Dict, im: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, Z, X, Y) image -> (flow (3, Z, X, Y), cellprob logits
    (Z, X, Y)).  Pooling is (1, 2, 2): z stays at native depth (stacks
    are 8-60 planes; xy is 2048^2), mirroring the anisotropy handling
    the reference gets from its resize-to-isotropic round trip."""
    x = jnp.moveaxis(jnp.asarray(im, jnp.float32), 0, -1)   # (Z,X,Y,C)
    x = (x - x.mean()) / (x.std() + 1e-6)
    skips: List[jnp.ndarray] = []
    for i, lvl in enumerate(params["enc"]):
        x = jax.nn.relu(_norm(_conv(lvl["a"], x)))
        x = jax.nn.relu(_norm(_conv(lvl["b"], x)))
        if i < len(params["enc"]) - 1:
            skips.append(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "SAME")
    for lvl in params["dec"]:
        skip = skips.pop()
        x = jax.image.resize(x, skip.shape[:3] + (x.shape[-1],),
                             "nearest")
        x = jnp.concatenate([x, skip], axis=-1)
        x = jax.nn.relu(_norm(_conv(lvl["a"], x)))
        x = jax.nn.relu(_norm(_conv(lvl["b"], x)))
    out = _conv(params["head"], x)                          # (Z,X,Y,4)
    flow = jnp.moveaxis(out[..., :3], -1, 0)
    return flow, out[..., 3]


# ---------------------------------------------------------------------------
# Flow dynamics -> masks (cellpose dynamics, functional form)
# ---------------------------------------------------------------------------


def _trilinear(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample (C, Z, X, Y) at (N, 3) float points, clamped."""
    shape = jnp.asarray(vol.shape[1:], jnp.float32)
    p = jnp.clip(pts, 0.0, shape - 1.0)
    lo = jnp.floor(p).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.asarray(vol.shape[1:]) - 1)
    f = p - lo.astype(jnp.float32)
    out = 0.0
    for dz in (0, 1):
        for dx in (0, 1):
            for dy in (0, 1):
                iz = jnp.where(dz, hi[:, 0], lo[:, 0])
                ix = jnp.where(dx, hi[:, 1], lo[:, 1])
                iy = jnp.where(dy, hi[:, 2], lo[:, 2])
                w = (jnp.where(dz, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dx, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dy, f[:, 2], 1 - f[:, 2]))
                out = out + w[None] * vol[:, iz, ix, iy]
    return out                                              # (C, N)


@partial(jax.jit, static_argnames=("n_iters",))
def follow_flows(flow: jnp.ndarray, fg: jnp.ndarray,
                 n_iters: int = 40, step: float = 1.0) -> jnp.ndarray:
    """Advect every voxel center along `flow` (3, Z, X, Y) for
    `n_iters` Euler steps; background voxels stay put.  Returns the
    landing positions as a (Z, X, Y, 3) float array."""
    shape = flow.shape[1:]
    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in shape], indexing="ij"),
                     axis=-1)                                # (Z,X,Y,3)
    pts0 = grid.reshape(-1, 3)
    move = fg.reshape(-1).astype(jnp.float32)

    def body(_, pts):
        v = _trilinear(flow, pts).T                          # (N, 3)
        return pts + step * v * move[:, None]

    pts = jax.lax.fori_loop(0, n_iters, body, pts0)
    return pts.reshape(shape + (3,))


@partial(jax.jit, static_argnames=("n_iters", "max_cells", "min_count",
                                   "merge_iters", "bin_zxy"))
def masks_from_flows(flow: jnp.ndarray, cellprob: jnp.ndarray,
                     prob_threshold: float = 0.0,
                     n_iters: int = 40,
                     max_cells: int = 64,
                     min_count: int = 20,
                     merge_iters: int = 16,
                     bin_zxy: Tuple[int, int, int] = (2, 4, 4)
                     ) -> jnp.ndarray:
    """Cellpose dynamics: foreground voxels flow to their cell's
    attractor; landing-density peaks become cells (capped at
    `max_cells`), and each voxel takes the label of the basin its
    trajectory lands in.  Returns (Z, X, Y) int32 labels (0 = bg).

    Landings are histogrammed on a grid coarsened by `bin_zxy`:
    trained flows land voxels in a cloud a few voxels wide around the
    true center (not at a single attractor voxel the way analytic
    flows do), and on the fine grid that cloud splinters into many
    small local-maximum basins that over-segment the cell.  Binning at
    roughly the landing-cloud width collapses each cloud into one
    dominant bin; peaks closer than one coarse bin to a stronger peak
    are suppressed as fragments of the same attractor (this caps the
    resolvable cell-center separation at ~2 coarse bins, the same
    resolution compromise cellpose's own landing-histogram smoothing
    makes, dynamics.get_masks upstream)."""
    shape = cellprob.shape
    fg = cellprob > prob_threshold
    land = follow_flows(flow, fg, n_iters=n_iters)
    idx = jnp.round(land).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.asarray(shape) - 1)
    cs = tuple(-(-s // b) for s, b in zip(shape, bin_zxy))
    cidx = idx // jnp.asarray(bin_zxy)
    flat = (cidx[..., 0] * cs[1] + cidx[..., 1]) * cs[2] + cidx[..., 2]
    counts = jnp.zeros(int(np.prod(cs)), jnp.int32).at[
        flat.ravel()].add(fg.ravel().astype(jnp.int32))
    counts3 = counts.reshape(cs)
    # unique per-bin score (index ramp breaks count ties) so each
    # plateau yields exactly one 3^3 local maximum
    ramp = (jnp.arange(counts.size) % 997).astype(jnp.float32) / 997.0
    score3 = counts.astype(jnp.float32).reshape(cs) \
        + ramp.reshape(cs) * 0.5
    r = 2  # 5^3 peak footprint, matching cellpose's size-5 max filter
    pad = jnp.pad(score3, r, constant_values=-1.0)
    windows = [pad[r + dz:cs[0] + r + dz,
                   r + dx:cs[1] + r + dx,
                   r + dy:cs[2] + r + dy]
               for dz in range(-r, r + 1) for dx in range(-r, r + 1)
               for dy in range(-r, r + 1)]
    neigh_max = jnp.stack(windows).max(0)
    is_peak = (score3 >= neigh_max) & (counts3 >= min_count)
    peak_scores = jnp.where(is_peak, score3, 0.0).ravel()
    top_v, top_i = jax.lax.top_k(peak_scores, max_cells)
    # suppress peaks within Chebyshev distance r (coarse bins) of a
    # strictly stronger peak — fragments of the same landing cloud
    pz = top_i // (cs[1] * cs[2])
    px = (top_i // cs[2]) % cs[1]
    py = top_i % cs[2]
    pc = jnp.stack([pz, px, py], axis=-1)                    # (K, 3)
    cheb = jnp.max(jnp.abs(pc[:, None] - pc[None, :]), axis=-1)
    dominated = jnp.any((top_v[None, :] > top_v[:, None])
                        & (cheb <= r), axis=1)
    valid = (top_v > 0) & ~dominated
    seeds = jnp.zeros(int(np.prod(cs)), jnp.int32)
    lab_ids = jnp.arange(1, max_cells + 1, dtype=jnp.int32)
    seeds = seeds.at[top_i].set(jnp.where(valid, lab_ids, 0))
    seeds3 = seeds.reshape(cs)
    # absorb the rest of each landing cloud: propagate over nonzero bins
    sink_labels = propagate_labels(seeds3, counts3 > 0,
                                   max_iters=merge_iters)
    labels = sink_labels.ravel()[flat.ravel()].reshape(shape)
    return jnp.where(fg, labels, 0).astype(jnp.int32)


def segment_cells_learned(im: jnp.ndarray, params: Dict,
                          prob_threshold: float = 0.0,
                          n_iters: int = 40,
                          max_cells: int = 64,
                          min_count: int = 20,
                          bin_zxy: Tuple[int, int, int] = (2, 4, 4)
                          ) -> jnp.ndarray:
    """(C, Z, X, Y) image (e.g. polyT + DAPI channels) -> (Z, X, Y)
    int32 cell labels via the learned flow model (the TPU-native
    replacement for the reference's Cellpose 3D call,
    segmentation_tools/cell.py:192-270).  `bin_zxy` is the landing
    histogram's bin size; it bounds the minimum resolvable cell-center
    separation (~2 bins), so shrink it alongside any image pooling."""
    flow, logits = unet_apply(params, jnp.asarray(im))
    return masks_from_flows(flow, logits,
                            prob_threshold=prob_threshold,
                            n_iters=n_iters, max_cells=max_cells,
                            min_count=min_count, bin_zxy=bin_zxy)


def segment_fov_learned(im: jnp.ndarray, params: Dict,
                        downsample: Tuple[int, int, int] = (1, 4, 4),
                        **kwargs) -> jnp.ndarray:
    """Full-FOV learned segmentation at production scale: average-pool
    the (C, Z, X, Y) stack by `downsample`, segment on the coarse grid,
    and nearest-upsample the labels back to full resolution.

    The reference resizes stacks before Cellpose for exactly this
    reason (segmentation_tools/cell.py:214-240 resize-to-isotropic
    round trip); at 2048^2 the fine-grid flow rollout would otherwise
    materialize multi-GB landing grids.  Cell-scale objects (tens of
    pixels) survive 4x xy pooling untouched.  `params` must be trained
    at the pooled working resolution (cellpose's fixed-diameter
    calibration plays the same role).  Unless overridden, the landing
    bins shrink with the pooling so the resolvable cell-center
    separation stays constant in full-resolution pixels."""
    im = jnp.asarray(im, jnp.float32)
    dz, dx, dy = downsample
    if "bin_zxy" not in kwargs:
        kwargs["bin_zxy"] = tuple(
            max(1, b // d) for b, d in zip((2, 4, 4), downsample))
    c, z, x, y = im.shape
    zc, xc, yc = z // dz, x // dx, y // dy
    pooled = im[:, :zc * dz, :xc * dx, :yc * dy].reshape(
        c, zc, dz, xc, dx, yc, dy).mean(axis=(2, 4, 6))
    labels = segment_cells_learned(pooled, params, **kwargs)
    up = jnp.repeat(jnp.repeat(jnp.repeat(labels, dz, axis=0), dx,
                               axis=1), dy, axis=2)
    return jnp.pad(up, ((0, z - zc * dz), (0, x - xc * dx),
                        (0, y - yc * dy)), mode="edge")


# ---------------------------------------------------------------------------
# Training targets + fine-tuning
# ---------------------------------------------------------------------------


def labels_to_flows(labels: np.ndarray,
                    max_labels: int = 256) -> Tuple[np.ndarray,
                                                    np.ndarray]:
    """Ground-truth (flow (3, Z, X, Y), fg (Z, X, Y)) from an int label
    volume: each labeled voxel gets the unit vector toward its cell's
    center of mass (the tractable stand-in for cellpose's
    heat-diffusion flows — identical fixed point for convex cells)."""
    labels = np.asarray(labels)
    flow = np.zeros((3,) + labels.shape, np.float32)
    zz, xx, yy = np.meshgrid(*[np.arange(s) for s in labels.shape],
                             indexing="ij")
    coords = np.stack([zz, xx, yy], -1).astype(np.float32)
    for l in range(1, min(int(labels.max()), max_labels) + 1):
        m = labels == l
        if not m.any():
            continue
        center = coords[m].mean(0)
        vec = center[None] - coords[m]
        norm = np.linalg.norm(vec, axis=1, keepdims=True)
        vec = vec / np.maximum(norm, 1e-6)
        for a in range(3):
            flow[a][m] = vec[:, a]
    return flow, (labels > 0)


def unet_loss(params: Dict, im: jnp.ndarray, flow_t: jnp.ndarray,
              fg_t: jnp.ndarray) -> jnp.ndarray:
    """MSE on flows inside cells + class-balanced sigmoid BCE on cell
    probability.  Cells cover a small fraction of the stack, so the BCE
    averages foreground and background voxels separately — otherwise
    the background term dominates and foreground logits take thousands
    of steps to cross the 0 decision threshold `masks_from_flows`
    uses."""
    flow, logits = unet_apply(params, im)
    m = fg_t.astype(jnp.float32)
    mse = jnp.sum(((flow - flow_t) ** 2) * m[None]) \
        / (3.0 * jnp.maximum(jnp.sum(m), 1.0))
    bce_vox = (jnp.maximum(logits, 0) - logits * m
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    n_fg = jnp.maximum(jnp.sum(m), 1.0)
    n_bg = jnp.maximum(jnp.sum(1.0 - m), 1.0)
    bce = 0.5 * (jnp.sum(bce_vox * m) / n_fg
                 + jnp.sum(bce_vox * (1.0 - m)) / n_bg)
    return mse + bce


def fit_unet(params: Dict, images, label_volumes,
             n_steps: int = 200, lr: float = 1e-3,
             rng: Optional[np.random.Generator] = None) -> Dict:
    """Fine-tune on (image, labels) pairs with Adam (optax).  Targets
    are generated once via `labels_to_flows`."""
    import optax

    data = [(jnp.asarray(im, jnp.float32),) + tuple(
        map(jnp.asarray, labels_to_flows(lb)))
        for im, lb in zip(images, label_volumes)]
    opt = optax.adam(lr)
    state = opt.init(params)
    step_fn = jax.jit(lambda p, s, im, fl, fgm: _fit_step(
        p, s, im, fl, fgm, opt))
    rng = rng or np.random.default_rng(0)
    for k in range(n_steps):
        im, fl, fgm = data[int(rng.integers(len(data)))]
        params, state, _loss = step_fn(params, state, im, fl, fgm)
    return params


def _fit_step(params, opt_state, im, flow_t, fg_t, opt):
    loss, grads = jax.value_and_grad(unet_loss)(params, im, flow_t, fg_t)
    updates, opt_state = opt.update(grads, opt_state)
    import optax
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# Weight I/O (the pluggable path for externally converted weights)
# ---------------------------------------------------------------------------


def save_weights(params: Dict, path: str) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_weights(path: str, like: Dict) -> Dict:
    """Load .npz weights into the structure of `like` (shapes checked)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"missing weight {key}")
        arr = data[key]
        if arr.shape != v.shape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {v.shape}")
        out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)

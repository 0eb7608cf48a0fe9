"""Cellpose CPnet as a functional JAX program + torch-checkpoint converter.

The reference's production segmentation calls the torch ``cellpose``
package with pretrained weights (``model_type='nuclei'``,
segmentation_tools/cell.py:192-252).  `segmentation/learned.py` provides
the cellpose-CLASS capability (flows + dynamics) with a trainable 3D
UNet; THIS module provides the cellpose-MODEL capability: a faithful
functional port of cellpose's CPnet architecture (residual 2D UNet with
global style vectors, cellpose 2.x ``resnet_torch.py``) so actual
pretrained cellpose checkpoints (``~/.cellpose/models/nuclei*``) convert
directly and run on TPU.

Architecture replicated (cellpose 2.x `CPnet(nbase, nout=3, sz=3)`):

  * ``batchconv(i,o,sz)``   = BatchNorm2d -> ReLU -> Conv2d(sz, pad same)
  * ``batchconv0(i,o,sz)``  = BatchNorm2d -> Conv2d (no ReLU; residual proj)
  * ``resdown(i,o)``: x = proj(x) + conv1(conv0(x)); x = x + conv3(conv2(x))
  * ``downsample``: resdown per level, 2x2 max-pool between levels
  * ``make_style``: global avg-pool of the deepest feature, L2-normalized
  * ``batchconvstyle``: x (+ skip y) + Linear(style)[:, None, None] -> batchconv
  * ``resup(i,o)``: x = proj(x) + conv1(style, conv0(x), y=skip);
                    x = x + conv3(style, conv2(style, x))
  * ``upsample``: deepest resup gets itself as skip; then nearest-2x
    upsample + resup per level
  * ``output``: batchconv(nbase_up[0], 3, 1) -> [dY, dX, cellprob]

Checkpoint layer mapping (torch state_dict key -> param tree path) is
documented in :func:`convert_cellpose_state_dict`.  BatchNorm runs in
inference mode from the checkpoint's running statistics.

Caveat, stated plainly: this port is written against cellpose 2.x's
published architecture; the parity test (tests/test_cellpose_net.py)
verifies converter + JAX forward against an in-repo torch replica of
that architecture built with cellpose's exact module names — it proves
the conversion pipeline end-to-end, not binary equivalence with any
specific upstream cellpose release.  Feed a real checkpoint through
`convert_cellpose_state_dict` and any naming/shape drift fails loudly
rather than silently.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

#: cellpose 'nuclei'/'cyto' geometry: 2 input channels (image, zeros for
#: nuclei), 4 levels, 3 outputs [dY, dX, cellprob]
DEFAULT_NBASE = (2, 32, 64, 128, 256)
BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Functional forward
# ---------------------------------------------------------------------------


def _bn(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Inference-mode BatchNorm over (H, W, C) from running stats."""
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _conv2d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, C'); SAME padding, HWIO weights."""
    y = jax.lax.conv_general_dilated(
        x[None], p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return y + p["b"]


def _batchconv(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return _conv2d(p["conv"], jax.nn.relu(_bn(p["bn"], x)))


def _batchconv0(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return _conv2d(p["conv"], _bn(p["bn"], x))


def _batchconvstyle(p: Dict, style: jnp.ndarray, x: jnp.ndarray,
                    y=None) -> jnp.ndarray:
    if y is not None:
        x = x + y
    feat = style @ p["full"]["w"] + p["full"]["b"]
    return _batchconv(p, x + feat[None, None, :])


def _resdown(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    x = _batchconv0(p["proj"], x) \
        + _batchconv(p["conv"][1], _batchconv(p["conv"][0], x))
    return x + _batchconv(p["conv"][3], _batchconv(p["conv"][2], x))


def _resup(p: Dict, x: jnp.ndarray, y: jnp.ndarray,
           style: jnp.ndarray) -> jnp.ndarray:
    x = _batchconv0(p["proj"], x) + _batchconvstyle(
        p["conv"][1], style, _batchconv(p["conv"][0], x), y=y)
    return x + _batchconvstyle(
        p["conv"][3], style, _batchconvstyle(p["conv"][2], style, x))


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (2, 2, 1), (2, 2, 1), "VALID")


def cpnet_apply(params: Dict, im: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, H, W) image -> ((2, H, W) flow [dY, dX], (H, W) cellprob
    logits).  H and W must be divisible by 2**(levels-1) (cellpose pads
    to multiples the same way; see `pad_to_cpnet`)."""
    x = jnp.moveaxis(jnp.asarray(im, jnp.float32), 0, -1)   # (H, W, C)
    skips: List[jnp.ndarray] = []
    for i, lvl in enumerate(params["down"]):
        if i > 0:
            x = _maxpool2(x)
        x = _resdown(lvl, x)
        skips.append(x)
    style = jnp.mean(x, axis=(0, 1))
    style = style / jnp.maximum(jnp.linalg.norm(style), 1e-6)
    up = params["up"]
    x = _resup(up[-1], skips[-1], skips[-1], style)
    for n in range(len(up) - 2, -1, -1):
        x = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
        x = _resup(up[n], x, skips[n], style)
    out = _batchconv(params["output"], x)                    # (H, W, 3)
    return jnp.moveaxis(out[..., :2], -1, 0), out[..., 2]


def pad_to_cpnet(im: np.ndarray, levels: int) -> Tuple[np.ndarray,
                                                       Tuple[int, int]]:
    """Edge-pad (C, H, W) so H, W divide 2**(levels-1); returns the pad
    amounts for cropping outputs back."""
    div = 2 ** (levels - 1)
    ph = (-im.shape[1]) % div
    pw = (-im.shape[2]) % div
    if ph or pw:
        im = np.pad(im, ((0, 0), (0, ph), (0, pw)), mode="edge")
    return im, (ph, pw)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def _take(sd: Dict, key: str, shape: Tuple[int, ...]) -> jnp.ndarray:
    if key not in sd:
        raise KeyError(f"cellpose checkpoint missing {key}")
    arr = np.asarray(sd[key], np.float32)
    if arr.shape != shape:
        raise ValueError(f"{key}: checkpoint shape {arr.shape} != "
                         f"expected {shape}")
    return jnp.asarray(arr)


def _bn_from(sd, prefix, c):
    return {"gamma": _take(sd, f"{prefix}.weight", (c,)),
            "beta": _take(sd, f"{prefix}.bias", (c,)),
            "mean": _take(sd, f"{prefix}.running_mean", (c,)),
            "var": _take(sd, f"{prefix}.running_var", (c,))}


def _conv_from(sd, prefix, c_in, c_out, k):
    w = _take(sd, f"{prefix}.weight", (c_out, c_in, k, k))
    return {"w": jnp.transpose(w, (2, 3, 1, 0)),       # OIHW -> HWIO
            "b": _take(sd, f"{prefix}.bias", (c_out,))}


def _batchconv_from(sd, prefix, c_in, c_out, k):
    """batchconv = Sequential(BatchNorm2d, ReLU, Conv2d) -> keys .0 / .2"""
    return {"bn": _bn_from(sd, f"{prefix}.0", c_in),
            "conv": _conv_from(sd, f"{prefix}.2", c_in, c_out, k)}


def _batchconv0_from(sd, prefix, c_in, c_out, k):
    """batchconv0 = Sequential(BatchNorm2d, Conv2d) -> keys .0 / .1"""
    return {"bn": _bn_from(sd, f"{prefix}.0", c_in),
            "conv": _conv_from(sd, f"{prefix}.1", c_in, c_out, k)}


def _linear_from(sd, prefix, c_in, c_out):
    w = _take(sd, f"{prefix}.weight", (c_out, c_in))
    return {"w": jnp.transpose(w), "b": _take(sd, f"{prefix}.bias",
                                              (c_out,))}


def convert_cellpose_state_dict(state_dict: Dict,
                                nbase: Sequence[int] = DEFAULT_NBASE,
                                nout: int = 3, sz: int = 3) -> Dict:
    """torch CPnet state_dict (tensors or numpy) -> `cpnet_apply` pytree.

    Layer mapping (cellpose 2.x resnet_torch.py module names):

      downsample.down.res_down_{n}.conv.conv_{t}.{0,2}   t=0..3  (BN, Conv)
      downsample.down.res_down_{n}.proj.{0,1}                    (BN, Conv 1x1)
      upsample.up.res_up_{n}.conv.conv_0.{0,2}                   (plain batchconv)
      upsample.up.res_up_{n}.conv.conv_{t}.conv.{0,2}    t=1..3  (style batchconv)
      upsample.up.res_up_{n}.conv.conv_{t}.full          t=1..3  (style Linear)
      upsample.up.res_up_{n}.proj.{0,1}
      output.{0,2}                                                (BN, Conv 1x1)

    Accepts the raw ``torch.save(net.state_dict(), f)`` layout cellpose
    writes.  Tensors may be torch tensors or numpy arrays.  Extra keys
    (``*.num_batches_tracked``, diam buffers) are ignored; missing or
    mis-shaped keys raise with the offending name.
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    nbase = list(nbase)
    n_levels = len(nbase) - 1
    down = []
    for n in range(n_levels):
        c_in, c_out = nbase[n], nbase[n + 1]
        pre = f"downsample.down.res_down_{n}"
        down.append({
            "proj": _batchconv0_from(sd, f"{pre}.proj", c_in, c_out, 1),
            "conv": [
                _batchconv_from(sd, f"{pre}.conv.conv_0", c_in, c_out, sz),
                _batchconv_from(sd, f"{pre}.conv.conv_1", c_out, c_out, sz),
                _batchconv_from(sd, f"{pre}.conv.conv_2", c_out, c_out, sz),
                _batchconv_from(sd, f"{pre}.conv.conv_3", c_out, c_out, sz),
            ]})
    # upsample channel plan: nbaseup = nbase[1:] + [nbase[-1]]
    nbaseup = nbase[1:] + [nbase[-1]]
    style_ch = nbaseup[-1]
    up = []
    for n in range(1, len(nbaseup)):
        c_in, c_out = nbaseup[n], nbaseup[n - 1]
        pre = f"upsample.up.res_up_{n - 1}"
        up.append({
            "proj": _batchconv0_from(sd, f"{pre}.proj", c_in, c_out, 1),
            "conv": [
                _batchconv_from(sd, f"{pre}.conv.conv_0", c_in, c_out, sz),
            ] + [
                {**_batchconv_from(sd, f"{pre}.conv.conv_{t}.conv",
                                   c_out, c_out, sz),
                 "full": _linear_from(sd, f"{pre}.conv.conv_{t}.full",
                                      style_ch, c_out)}
                for t in (1, 2, 3)
            ]})
    params = {
        "down": down,
        "up": up,
        "output": _batchconv_from(sd, "output", nbaseup[0], nout, 1),
    }
    return params


def load_cellpose_checkpoint(path: str,
                             nbase: Sequence[int] = DEFAULT_NBASE
                             ) -> Dict:
    """Load a cellpose ``.pt``/``*_torch_*`` checkpoint file and convert
    (requires torch for deserialization only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd \
            and not any("." in k for k in sd):
        sd = sd["state_dict"]
    return convert_cellpose_state_dict(sd, nbase=nbase)


# ---------------------------------------------------------------------------
# 3D driver: orthogonal-slice flow assembly (cellpose do_3D)
# ---------------------------------------------------------------------------


def _normalize99(x: jnp.ndarray) -> jnp.ndarray:
    """Cellpose's percentile normalization (1st..99th -> 0..1)."""
    lo = jnp.percentile(x, 1.0)
    hi = jnp.percentile(x, 99.0)
    return (x - lo) / jnp.maximum(hi - lo, 1e-6)


@partial(jax.jit, static_argnames=())
def _run_slices(params, vol2: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    """vol2: (S, C, H, W) slice batch -> ((S, 2, H, W), (S, H, W)).
    Sequential lax.map keeps one slice's activations live at a time
    (a vmapped CPnet over 60 full-FOV slices would hold ~30 GB of
    level-0 features)."""
    return jax.lax.map(lambda s: cpnet_apply(params, s), vol2)


def cellpose_flows_3d(params: Dict, vol: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, Z, X, Y) volume -> ((3, Z, X, Y) flow, (Z, X, Y) cellprob)
    by running CPnet over the three orthogonal slice stacks and
    averaging each flow component over its two contributing views —
    cellpose's ``do_3D=True`` flow assembly.  Input is percentile-
    normalized per volume; spatial dims should divide 8 (`pad_to_cpnet`).
    """
    vol = jnp.asarray(vol, jnp.float32)
    vol = _normalize99(vol)
    c, z, x, y = vol.shape
    flow = jnp.zeros((3, z, x, y), jnp.float32)
    prob = jnp.zeros((z, x, y), jnp.float32)

    # view 1: xy planes along z -> net dY=dX axis, dX=dY axis
    f, p = _run_slices(params, jnp.moveaxis(vol, 1, 0))      # (Z,C,X,Y)
    flow = flow.at[1].add(f[:, 0]).at[2].add(f[:, 1])
    prob = prob + p
    # view 2: zy planes along x -> dY=dZ, dX=dY
    f, p = _run_slices(params, jnp.moveaxis(vol, 2, 0)[:, :, :, :])
    # f: (X, 2, Z, Y) -> scatter back with axes (z, y) at fixed x
    flow = flow.at[0].add(jnp.moveaxis(f[:, 0], 0, 1))
    flow = flow.at[2].add(jnp.moveaxis(f[:, 1], 0, 1))
    prob = prob + jnp.moveaxis(p, 0, 1)
    # view 3: zx planes along y -> dY=dZ, dX=dX
    f, p = _run_slices(params, jnp.moveaxis(vol, 3, 0))
    flow = flow.at[0].add(jnp.moveaxis(f[:, 0], 0, 2))
    flow = flow.at[1].add(jnp.moveaxis(f[:, 1], 0, 2))
    prob = prob + jnp.moveaxis(p, 0, 2)

    return flow / 2.0, prob / 3.0


def segment_cells_cellpose(vol: jnp.ndarray, params: Dict,
                           prob_threshold: float = 0.0,
                           n_iters: int = 40, max_cells: int = 64,
                           min_count: int = 20,
                           bin_zxy: Tuple[int, int, int] = (2, 4, 4)
                           ) -> jnp.ndarray:
    """(C, Z, X, Y) -> (Z, X, Y) int32 cell labels using converted
    cellpose weights: orthogonal-slice CPnet flows + the repo's flow
    dynamics (learned.masks_from_flows) — the TPU path for the
    reference's pretrained-cellpose production segmentation
    (segmentation_tools/cell.py:192-252)."""
    from .learned import masks_from_flows

    flow, prob = cellpose_flows_3d(params, vol)
    return masks_from_flows(flow, prob, prob_threshold=prob_threshold,
                            n_iters=n_iters, max_cells=max_cells,
                            min_count=min_count, bin_zxy=bin_zxy)

"""Cellpose CPnet port: torch-checkpoint conversion + forward parity.

Builds a torch replica of cellpose 2.x's CPnet (resnet_torch.py
architecture, exact module names -> exact state_dict keys), randomizes
every parameter AND BatchNorm running stat, converts the state_dict
with `convert_cellpose_state_dict`, and checks the JAX forward against
the torch forward numerically.  This proves the converter + functional
port end-to-end against the documented architecture (see the module
docstring's caveat about upstream releases)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from imageanalysis3_tpu.segmentation.cellpose_net import (  # noqa: E402
    cpnet_apply, convert_cellpose_state_dict, pad_to_cpnet,
    cellpose_flows_3d, segment_cells_cellpose)

SZ = 3


def batchconv(i, o, sz):
    return nn.Sequential(nn.BatchNorm2d(i, eps=1e-5),
                         nn.ReLU(inplace=True),
                         nn.Conv2d(i, o, sz, padding=sz // 2))


def batchconv0(i, o, sz):
    return nn.Sequential(nn.BatchNorm2d(i, eps=1e-5),
                         nn.Conv2d(i, o, sz, padding=sz // 2))


class resdown(nn.Module):
    def __init__(self, i, o, sz):
        super().__init__()
        self.conv = nn.Sequential()
        self.proj = batchconv0(i, o, 1)
        for t in range(4):
            self.conv.add_module(f"conv_{t}",
                                 batchconv(i if t == 0 else o, o, sz))

    def forward(self, x):
        x = self.proj(x) + self.conv[1](self.conv[0](x))
        return x + self.conv[3](self.conv[2](x))


class downsample(nn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.down = nn.Sequential()
        for n in range(len(nbase) - 1):
            self.down.add_module(f"res_down_{n}",
                                 resdown(nbase[n], nbase[n + 1], sz))
        self.maxpool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        xd = []
        for n in range(len(self.down)):
            y = self.maxpool(xd[n - 1]) if n > 0 else x
            xd.append(self.down[n](y))
        return xd


class batchconvstyle(nn.Module):
    def __init__(self, i, o, style_ch, sz):
        super().__init__()
        self.conv = batchconv(i, o, sz)
        self.full = nn.Linear(style_ch, o)

    def forward(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = self.full(style)
        return self.conv(x + feat.unsqueeze(-1).unsqueeze(-1))


class resup(nn.Module):
    def __init__(self, i, o, style_ch, sz):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.add_module("conv_0", batchconv(i, o, sz))
        for t in (1, 2, 3):
            self.conv.add_module(f"conv_{t}",
                                 batchconvstyle(o, o, style_ch, sz))
        self.proj = batchconv0(i, o, 1)

    def forward(self, x, y, style):
        x = self.proj(x) + self.conv[1](style, self.conv[0](x), y=y)
        return x + self.conv[3](style, self.conv[2](style, x))


class upsample(nn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.upsampling = nn.Upsample(scale_factor=2, mode="nearest")
        self.up = nn.Sequential()
        for n in range(1, len(nbase)):
            self.up.add_module(f"res_up_{n - 1}",
                               resup(nbase[n], nbase[n - 1],
                                     nbase[-1], sz))

    def forward(self, style, xd):
        x = self.up[-1](xd[-1], xd[-1], style)
        for n in range(len(self.up) - 2, -1, -1):
            x = self.upsampling(x)
            x = self.up[n](x, xd[n], style)
        return x


class CPnetTorch(nn.Module):
    """cellpose 2.x CPnet replica (module names = state_dict keys)."""

    def __init__(self, nbase, nout=3, sz=3):
        super().__init__()
        self.downsample = downsample(nbase, sz)
        nbaseup = nbase[1:] + [nbase[-1]]
        self.upsample = upsample(nbaseup, sz)
        self.output = batchconv(nbaseup[0], nout, 1)

    def forward(self, x):
        xd = self.downsample(x)
        style = torch.nn.functional.avg_pool2d(
            xd[-1], kernel_size=(xd[-1].shape[-2], xd[-1].shape[-1]))
        style = style.flatten(1)
        style = style / torch.norm(style, dim=1, keepdim=True)
        return self.output(self.upsample(style, xd))


def _randomized_net(nbase, seed=0):
    torch.manual_seed(seed)
    net = CPnetTorch(nbase, nout=3, sz=SZ).eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)
    return net


NBASE = [2, 8, 16, 32]


def test_cpnet_forward_parity_with_torch():
    net = _randomized_net(NBASE)
    params = convert_cellpose_state_dict(net.state_dict(), nbase=NBASE)
    rng = np.random.default_rng(1)
    im = rng.normal(0, 1, (2, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(im)[None])[0].numpy()
    flow, prob = cpnet_apply(params, im)
    np.testing.assert_allclose(np.asarray(flow), ref[:2],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(prob), ref[2],
                               rtol=1e-4, atol=1e-4)


def test_convert_rejects_shape_and_key_drift():
    net = _randomized_net(NBASE)
    sd = dict(net.state_dict())
    bad = dict(sd)
    bad["output.2.weight"] = torch.zeros(4, 8, 1, 1)
    with pytest.raises(ValueError, match="output.2.weight"):
        convert_cellpose_state_dict(bad, nbase=NBASE)
    missing = {k: v for k, v in sd.items()
               if k != "downsample.down.res_down_0.proj.1.bias"}
    with pytest.raises(KeyError, match="res_down_0.proj.1.bias"):
        convert_cellpose_state_dict(missing, nbase=NBASE)


def test_cellpose_3d_driver_shapes_and_dynamics():
    """Orthogonal-slice 3D flow assembly + mask dynamics run end to end
    on converted weights (quality comes from real checkpoints; this
    pins shapes, padding, and the flow/prob axis wiring)."""
    net = _randomized_net(NBASE, seed=3)
    params = convert_cellpose_state_dict(net.state_dict(), nbase=NBASE)
    rng = np.random.default_rng(2)
    vol = rng.uniform(0, 1000, (2, 8, 16, 24)).astype(np.float32)
    vol_p, (ph, pw) = pad_to_cpnet(vol[0][None].repeat(2, 0), len(NBASE))
    assert (ph, pw) == (0, 0)
    flow, prob = cellpose_flows_3d(params, vol)
    assert flow.shape == (3, 8, 16, 24)
    assert prob.shape == (8, 16, 24)
    assert np.isfinite(np.asarray(flow)).all()
    labels = segment_cells_cellpose(vol, params, max_cells=8,
                                    min_count=1, bin_zxy=(2, 2, 2))
    assert labels.shape == (8, 16, 24)
    assert labels.dtype == np.int32

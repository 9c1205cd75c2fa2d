"""Checkpoint-import parity: build a torch model with the reference's module
structure (state_dict key layout included), import its weights through
``import_interpreter_state_dict``, and require our flax forward to match the
torch forward in eval mode to float tolerance.

This simultaneously validates: layer_config interpreter structure, conv/BN
weight layout transforms, the stacked-expert DyConv rewrite, and head
wiring — i.e. that a real reference .ckpt would load and reproduce outputs.
"""

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.utils.torch_import import import_interpreter_state_dict

# ---------------------------------------------------------- torch oracle


class TCNNBlock(nn.Module):
    def __init__(self, c_in, c_out, bn_act=True, **kw):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, bias=not bn_act, **kw)
        self.bn = nn.BatchNorm2d(c_out)
        self.leaky = nn.LeakyReLU(0.1)
        self.use_bn_act = bn_act

    def forward(self, x):
        return self.leaky(self.bn(self.conv(x))) if self.use_bn_act \
            else self.conv(x)


class TResidualBlock(nn.Module):
    def __init__(self, ch, use_residual=True, num_repeats=1):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Sequential(TCNNBlock(ch, ch // 2, kernel_size=1),
                           TCNNBlock(ch // 2, ch, kernel_size=3, padding=1))
             for _ in range(num_repeats)])
        self.use_residual = use_residual
        self.num_repeats = num_repeats

    def forward(self, x):
        for layer in self.layers:
            x = layer(x) + self.use_residual * x
        return x


class TScalePrediction(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.conv = TCNNBlock(c_in, 2 * c_in, kernel_size=3, padding=1)

    def forward(self, x):
        return self.conv(x)


class TDyConv(nn.Module):
    def __init__(self, c_in, c_out, kernel_size=3, stride=1, padding=0,
                 num_dy=4):
        super().__init__()
        self.num_dy, self.c_out, self.k = num_dy, c_out, kernel_size
        self.stride, self.padding = stride, padding
        hidden = num_dy if c_in == 3 else int(c_in * 0.25) + 1
        self.attention = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(c_in, hidden, 1, bias=False),
            nn.ReLU(inplace=True),
            nn.Conv2d(hidden, num_dy, 1, bias=True))
        self.weights = nn.Parameter(
            torch.randn(num_dy, c_out, c_in, kernel_size, kernel_size))
        self.bn = nn.BatchNorm2d(c_out)
        self.silu = nn.SiLU()

    def forward(self, x, attn_temp):
        b, c = x.shape[:2]
        a = self.attention(x).view(b, -1)
        a = torch.softmax(a / attn_temp, 1)
        filt = torch.mm(a, self.weights.view(self.num_dy, -1)).view(
            b * self.c_out, c, self.k, self.k)
        x = x.reshape(1, b * c, *x.shape[2:])
        x = nn.functional.conv2d(x, filt, stride=self.stride,
                                 padding=self.padding, groups=b)
        x = x.view(b, self.c_out, *x.shape[2:])
        return self.silu(self.bn(x))


class TorchDyYOLO(nn.Module):
    """Reference-structure interpreter model producing the reference's
    state_dict key layout (layers.{i}..., yolo_head.detection_head...)."""

    def __init__(self, layer_config, n_anchors=3):
        super().__init__()
        self.layers = nn.ModuleList()
        c = 3
        head_c = []
        for tok in layer_config:
            if tok[0] == "B":
                self.layers.append(TResidualBlock(c, num_repeats=tok[1]))
            elif tok[0] == "S":
                self.layers += [
                    TResidualBlock(c, use_residual=False, num_repeats=1),
                    TCNNBlock(c, c // 2, kernel_size=1),
                    TScalePrediction(c // 2)]
                head_c.append(c)
                c = c // 2
            elif tok[0] == "U":
                self.layers.append(nn.Upsample(scale_factor=2))
                c = c * 3
            elif tok[0] == "DyConv":
                o, k, s = tok[1:]
                self.layers.append(TDyConv(c, o, k, s,
                                           1 if k == 3 else 0))
                c = o
            else:
                o, k, s = tok
                self.layers.append(TCNNBlock(
                    c, o, kernel_size=k, stride=s,
                    padding=1 if k == 3 else 0))
                c = o

        class Head(nn.Module):
            def __init__(self, chans):
                super().__init__()
                self.detection_head = nn.ModuleList()
                for ch in chans:
                    self.detection_head.append(nn.ModuleDict(dict(
                        obj=nn.ModuleDict(dict(
                            conv_obj=nn.Conv2d(ch, n_anchors, 1))),
                        bbox=nn.ModuleDict(dict(
                            conv_bbox=nn.Conv2d(ch, n_anchors * 4, 1))))))

        self.yolo_head = Head(head_c)
        self.n_anchors = n_anchors

    def forward(self, x, attn_temp=30.0):
        outs, routes = [], []
        taps = []
        for layer in self.layers:
            if isinstance(layer, TScalePrediction):
                taps.append(layer(x))
                continue
            if isinstance(layer, TDyConv):
                x = layer(x, attn_temp)
            else:
                x = layer(x)
            if isinstance(layer, TResidualBlock) and layer.num_repeats == 8:
                routes.append(x)
            elif isinstance(layer, nn.Upsample):
                x = torch.cat([x, routes.pop()], dim=1)
        res = []
        for tap, dh in zip(taps, self.yolo_head.detection_head):
            obj = dh["obj"]["conv_obj"](tap)
            bbox = dh["bbox"]["conv_bbox"](tap)
            b, _, h, w = obj.shape
            res.append((
                bbox.view(b, self.n_anchors, 4, h, w).permute(0, 1, 3, 4, 2),
                obj.view(b, self.n_anchors, 1, h, w).permute(0, 1, 3, 4, 2)))
        return res


# ----------------------------------------------------------------- test

CFG = (
    ("DyConv", 8, 3, 1),
    (16, 3, 2),
    ("B", 1),
    (32, 3, 2),
    ("B", 8),
    (64, 3, 2),
    ("B", 8),
    (128, 3, 2),
    ("B", 1),
    (64, 1, 1),
    (128, 3, 1),
    ("S",),
    ("DyConv", 32, 1, 1),
    ("U",),
    (32, 1, 1),
    (64, 3, 1),
    ("S",),
    (16, 1, 1),
    ("U",),
    (16, 1, 1),
    (32, 3, 1),
    ("S",),
)


def test_torch_import_forward_parity(rng):
    torch.manual_seed(0)
    tm = TorchDyYOLO(CFG).eval()
    # randomize BN running stats so the import actually matters
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = import_interpreter_state_dict(sd, CFG)

    jm = DyYOLO(layer_config=CFG)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_outs = tm(torch.tensor(x).permute(0, 3, 1, 2))

    j_outs = jm.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)

    assert len(t_outs) == len(j_outs) == 3
    for (t_bbox, t_obj), j in zip(t_outs, j_outs):
        np.testing.assert_allclose(
            np.asarray(j.bbox), t_bbox.numpy(), rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(j.obj), t_obj.numpy(), rtol=5e-3, atol=5e-4)


def test_import_covers_all_torch_params():
    tm = TorchDyYOLO(CFG)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = import_interpreter_state_dict(sd, CFG)
    n_torch = sum(v.size for k, v in sd.items()
                  if "num_batches_tracked" not in k)
    n_ours = sum(np.asarray(v).size for v in jax.tree.leaves(params))
    n_ours += sum(np.asarray(v).size for v in jax.tree.leaves(stats))
    assert n_ours == n_torch

    # the imported tree must be loadable by the flax model (same structure)
    jm = DyYOLO(layer_config=CFG)
    ref = jm.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(
                     ref["params"])}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert ref_paths == got_paths

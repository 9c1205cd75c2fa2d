"""PyTorch → JAX checkpoint import for the interpreter models.

Maps a reference Lightning state_dict (reference checkpoints are ~515 MB
``best-*.ckpt`` files, dvc.lock:223-227) onto our flax param/batch_stats
trees, walking the ``layer_config`` tokens in the same order the reference
interpreter builds its ``nn.ModuleList`` (reference model/BaselineModel.py:
63-101, model/DyYOLO.py:63-112).

Layout transforms:
  Conv2d  (O, I, kh, kw)        → HWIO (kh, kw, I, O)
  Linear  (O, I)                → (I, O)
  1x1 attention convs           → Dense kernels (I, O)
  DyConv experts (E, O, I, k, k)→ stacked (k, k, I, E·O)  [e-major flat]
  BatchNorm weight/bias/running_mean/running_var
          → scale/bias + batch_stats mean/var
"""

from typing import Dict, Tuple

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear_w(w):
    return np.transpose(np.asarray(w), (1, 0))


def _attn_conv_w(w):
    # (O, I, 1, 1) conv used as a dense layer
    return np.transpose(np.asarray(w)[:, :, 0, 0], (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _bn(params, stats, prefix_t, dst, sd):
    _set(params, dst + ("scale",), sd[prefix_t + ".weight"])
    _set(params, dst + ("bias",), sd[prefix_t + ".bias"])
    _set(stats, dst + ("mean",), sd[prefix_t + ".running_mean"])
    _set(stats, dst + ("var",), sd[prefix_t + ".running_var"])


def _cnnblock(params, stats, t_prefix, dst, sd):
    """reference CNNBlock: .conv (Conv2d), .bn (BatchNorm2d)."""
    _set(params, dst + ("Conv_0", "kernel"), _conv_w(sd[t_prefix + ".conv.weight"]))
    if t_prefix + ".conv.bias" in sd:
        _set(params, dst + ("Conv_0", "bias"), sd[t_prefix + ".conv.bias"])
    _bn(params, stats, t_prefix + ".bn", dst + ("BatchNorm_0",), sd)


def import_interpreter_state_dict(state_dict: Dict[str, np.ndarray],
                                  layer_config) -> Tuple[dict, dict]:
    """Convert a reference BaselineModel/DyYOLO state_dict to
    (params, batch_stats) trees rooted at our model top level."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    net = ("net",)

    ref_i = 0          # reference nn.ModuleList index
    counters = {"CNNBlock": 0, "ResidualBlock": 0, "ScalePrediction": 0,
                "DyConvModule": 0}

    def next_name(cls):
        n = f"{cls}_{counters[cls]}"
        counters[cls] += 1
        return n

    def copy_resblock(t_idx, dst_name, num_repeats):
        base = net + (dst_name,)
        for r in range(num_repeats):
            for j in range(2):  # Sequential(CNNBlock, CNNBlock)
                _cnnblock(params, stats,
                          f"layers.{t_idx}.layers.{r}.{j}",
                          base + (f"CNNBlock_{2 * r + j}",), sd)

    for tok in layer_config:
        if tok[0] == "B":
            copy_resblock(ref_i, next_name("ResidualBlock"), tok[1])
            ref_i += 1
        elif tok[0] == "S":
            copy_resblock(ref_i, next_name("ResidualBlock"), 1)
            _cnnblock(params, stats, f"layers.{ref_i + 1}",
                      net + (next_name("CNNBlock"),), sd)
            sp = next_name("ScalePrediction")
            _cnnblock(params, stats, f"layers.{ref_i + 2}.conv",
                      net + (sp, "CNNBlock_0"), sd)
            ref_i += 3
        elif tok[0] == "U":
            ref_i += 1  # nn.Upsample: no params
        elif tok[0] == "DyConv":
            name = next_name("DyConvModule")
            base = net + (name,)
            p = f"layers.{ref_i}"
            _set(params, base + ("attn_fc1", "kernel"),
                 _attn_conv_w(sd[f"{p}.attention.1.weight"]))
            _set(params, base + ("attn_fc2", "kernel"),
                 _attn_conv_w(sd[f"{p}.attention.3.weight"]))
            _set(params, base + ("attn_fc2", "bias"),
                 sd[f"{p}.attention.3.bias"])
            # (E, O, I, kh, kw) → (kh, kw, I, E·O), expert-major flat
            w = np.asarray(sd[f"{p}.weights"])
            e, o, i, kh, kw = w.shape
            w = np.transpose(w, (3, 4, 2, 0, 1)).reshape(kh, kw, i, e * o)
            _set(params, base + ("experts",), w)
            _bn(params, stats, f"{p}.bn", base + ("BatchNorm_0",), sd)
            ref_i += 1
        else:
            _cnnblock(params, stats, f"layers.{ref_i}",
                      net + (next_name("CNNBlock"),), sd)
            ref_i += 1

    # YOLOHead: detection_head.{h}.{obj,bbox}.conv_{obj,bbox}
    h = 0
    while f"yolo_head.detection_head.{h}.obj.conv_obj.weight" in sd:
        base = net + ("yolo_head",)
        _set(params, base + (f"obj_{h}", "Conv_0", "kernel"),
             _conv_w(sd[f"yolo_head.detection_head.{h}.obj.conv_obj.weight"]))
        _set(params, base + (f"obj_{h}", "Conv_0", "bias"),
             sd[f"yolo_head.detection_head.{h}.obj.conv_obj.bias"])
        _set(params, base + (f"bbox_{h}", "Conv_0", "kernel"),
             _conv_w(sd[f"yolo_head.detection_head.{h}.bbox.conv_bbox.weight"]))
        _set(params, base + (f"bbox_{h}", "Conv_0", "bias"),
             sd[f"yolo_head.detection_head.{h}.bbox.conv_bbox.bias"])
        h += 1

    return params, stats


def load_lightning_checkpoint(path: str, layer_config):
    """Load a reference .ckpt file and convert (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return import_interpreter_state_dict(sd, layer_config)

"""PyTorch checkpoint → JAX parameter converter for Global_and_Local.

Reproducing the reference's released Dice requires loading its ``.pth``
checkpoints (saved as ``{'network': state_dict}``, reference
``main.py:857-872``). This maps the torch state-dict names recorded in
``models/ours.py:1717-1747`` onto our flax tree:

  * per-view ModuleDict weights (``init_block.{v}``, ``layer{s}.{v}``,
    ``classifier.{v}``, ``centerness.{v}``) de-interleave into the stacked
    leading view axis of our ``nn.vmap`` parameters;
  * torch conv ``(O, I, kh, kw)`` → flax kernel ``(kh, kw, I, O)``;
    1×1×1 Conv3d (TPAVI θ/φ/g/W_z) → Dense ``(I, O)``;
  * BN ``weight/bias/running_mean/running_var`` → ``scale/bias`` params +
    ``mean/var`` batch_stats; LayerNorm ``weight/bias`` → ``scale/bias``.

Skipped on purpose: the ``network.*`` template submodule (a constructor
artifact — its weights are deep-copied, never used at inference) and the
dead TPAVI audio path ``align_channel`` (reference ``ours.py:801``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

from glfusion_tpu.config import ModelConfig


def _conv(w) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense_from_conv3d(w) -> np.ndarray:
    """(O, I, 1, 1, 1) → (I, O)."""
    w = np.asarray(w)
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _np(w) -> np.ndarray:
    return np.asarray(w)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def put(self, tree: Dict, path: Sequence[str], value: np.ndarray):
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    def conv_per_view(self, sd, tkeys, path, with_bias: bool):
        self.put(self.params, path + ("kernel",),
                 np.stack([_conv(sd[k + ".weight"]) for k in tkeys]))
        if with_bias:
            self.put(self.params, path + ("bias",),
                     np.stack([_np(sd[k + ".bias"]) for k in tkeys]))

    def bn_per_view(self, sd, tkeys, path):
        self.put(self.params, path + ("scale",),
                 np.stack([_np(sd[k + ".weight"]) for k in tkeys]))
        self.put(self.params, path + ("bias",),
                 np.stack([_np(sd[k + ".bias"]) for k in tkeys]))
        self.put(self.stats, path + ("mean",),
                 np.stack([_np(sd[k + ".running_mean"]) for k in tkeys]))
        self.put(self.stats, path + ("var",),
                 np.stack([_np(sd[k + ".running_var"]) for k in tkeys]))

    def dense3d(self, sd, tkey, path):
        self.put(self.params, path + ("kernel",),
                 _dense_from_conv3d(sd[tkey + ".weight"]))
        self.put(self.params, path + ("bias",), _np(sd[tkey + ".bias"]))

    def bn_single(self, sd, tkey, path):
        self.put(self.params, path + ("scale",), _np(sd[tkey + ".weight"]))
        self.put(self.params, path + ("bias",), _np(sd[tkey + ".bias"]))
        self.put(self.stats, path + ("mean",), _np(sd[tkey + ".running_mean"]))
        self.put(self.stats, path + ("var",), _np(sd[tkey + ".running_var"]))


def _head_mapping(tb: _TreeBuilder, sd, views, torch_root: str,
                  flax_root: str, rates: Sequence[int]):
    """DeepLab head: Sequential(ASPP, conv3×3, BN, ReLU, conv1×1)
    (reference models/deeplabv3.py:102-110)."""
    def keys(suffix):
        return [f"{torch_root}.{v}.{suffix}" for v in views]

    # ASPP branch 0: Sequential(conv1×1, BN, ReLU) = convs.0
    tb.conv_per_view(sd, keys("0.convs.0.0"), (flax_root, "aspp", "b0_conv"),
                     with_bias=False)
    tb.bn_per_view(sd, keys("0.convs.0.1"), (flax_root, "aspp", "b0_bn"))
    # dilated branches convs.1..len(rates)
    for i in range(len(rates)):
        tb.conv_per_view(sd, keys(f"0.convs.{i + 1}.0"),
                         (flax_root, "aspp", f"b{i + 1}_conv"), with_bias=False)
        tb.bn_per_view(sd, keys(f"0.convs.{i + 1}.1"),
                       (flax_root, "aspp", f"b{i + 1}_bn"))
    # pooling branch convs.N: [AdaptiveAvgPool, conv, BN, ReLU]
    n = len(rates) + 1
    tb.conv_per_view(sd, keys(f"0.convs.{n}.1"),
                     (flax_root, "aspp", "pool_conv"), with_bias=False)
    tb.bn_per_view(sd, keys(f"0.convs.{n}.2"), (flax_root, "aspp", "pool_bn"))
    # projection
    tb.conv_per_view(sd, keys("0.project.0"),
                     (flax_root, "aspp", "project_conv"), with_bias=False)
    tb.bn_per_view(sd, keys("0.project.1"), (flax_root, "aspp", "project_bn"))
    # conv3×3 + BN + out conv
    tb.conv_per_view(sd, keys("1"), (flax_root, "conv"), with_bias=False)
    tb.bn_per_view(sd, keys("2"), (flax_root, "bn"))
    tb.conv_per_view(sd, keys("4"), (flax_root, "out_conv"), with_bias=True)


def _tpavi_mapping(tb: _TreeBuilder, sd, torch_root: str, flax_root: str):
    for name in ("theta", "phi", "g"):
        tb.dense3d(sd, f"{torch_root}.{name}", (flax_root, name))
    tb.dense3d(sd, f"{torch_root}.W_z.0", (flax_root, "w_z_conv"))
    tb.bn_single(sd, f"{torch_root}.W_z.1", (flax_root, "w_z_bn"))
    tb.put(tb.params, (flax_root, "norm", "scale"),
           _np(sd[f"{torch_root}.norm_layer.weight"]))
    tb.put(tb.params, (flax_root, "norm", "bias"),
           _np(sd[f"{torch_root}.norm_layer.bias"]))


def convert_state_dict(sd: Mapping[str, "np.ndarray"],
                       cfg: ModelConfig) -> Dict[str, Dict]:
    """torch state dict (CPU tensors or arrays) → {'params', 'batch_stats'}."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in sd.items()}
    views = list(cfg.views)
    tb = _TreeBuilder()

    # stem (init_block.{v}: [conv1, bn1, relu, maxpool])
    tb.conv_per_view(sd, [f"init_block.{v}.0" for v in views],
                     ("backbone", "stem_conv"), with_bias=True)
    tb.bn_per_view(sd, [f"init_block.{v}.1" for v in views],
                   ("backbone", "stem_bn"))

    # residual stages
    for s, blocks in enumerate(cfg.block_sizes, start=1):
        for b in range(blocks):
            root = ("backbone", f"layer{s}_block{b}")
            for j in (1, 2, 3):
                tb.conv_per_view(
                    sd, [f"layer{s}.{v}.{b}.conv{j}" for v in views],
                    root + (f"conv{j}",), with_bias=False)
                tb.bn_per_view(sd, [f"layer{s}.{v}.{b}.bn{j}" for v in views],
                               root + (f"bn{j}",))
            if f"layer{s}.{views[0]}.{b}.downsample.0.weight" in sd:
                tb.conv_per_view(
                    sd, [f"layer{s}.{v}.{b}.downsample.0" for v in views],
                    root + ("downsample_conv",), with_bias=False)
                tb.bn_per_view(
                    sd, [f"layer{s}.{v}.{b}.downsample.1" for v in views],
                    root + ("downsample_bn",))

    _head_mapping(tb, sd, views, "classifier", "classifier", cfg.aspp_rates)
    _head_mapping(tb, sd, views, "centerness", "centerness", cfg.aspp_rates)

    if f"global_attn.theta.weight" in sd:
        _tpavi_mapping(tb, sd, "global_attn", "global_attn")
    if f"local_attn.theta.weight" in sd:
        _tpavi_mapping(tb, sd, "local_attn", "local_attn")

    return {"params": tb.params, "batch_stats": tb.stats}


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Dict]:
    """Load a reference ``net_XXXXX.pth`` and convert (main.py:857-872)."""
    import torch

    data = torch.load(path, map_location="cpu")
    sd = data.get("network", data)
    # eval-side checkpoints may carry the DataParallel 'module.' prefix
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    return convert_state_dict(sd, cfg)

"""torchvision ImageNet-ResNet-50 state dict → flagship backbone init.

The reference's training recipe starts from an ImageNet-pretrained
backbone: ``Global_and_Local`` builds
``deeplabv3_resnet50_iekd(pretrained=False, ...)`` (``models/ours.py:148``)
whose ``_segm_model_iekd`` default ``pretrained_backbone: bool = True``
constructs ``torchvision.models.resnet50(pretrained=True)``
(``models/segmentation.py:197-207``). The IEKD wrapper then REPLACES only
``conv1`` with a fresh 1-channel stride-1 conv (``models/_utils.py:192``),
so layer1..layer4 AND ``bn1`` keep their ImageNet weights while the stem
conv is random. The per-view ModuleDicts are deep copies of that one
template (``models/ours.py:1724-1734``), so every view starts from the
SAME ImageNet weights.

This module reproduces that initialization from a LOCAL torchvision
``resnet50`` state-dict file (the standard ``resnet50-*.pth``; this
environment has no egress so the file must be supplied — see
``utils/helpers.py`` for the cache contract):

  * ``layer{s}.{b}.conv{j}.weight`` (O,I,kh,kw) → flax
    ``layer{s}_block{b}.conv{j}.kernel`` (kh,kw,I,O), broadcast over the
    stacked view axis;
  * ``bn*`` weight/bias → scale/bias params, running_mean/var →
    batch_stats; ``downsample.{0,1}`` → ``downsample_{conv,bn}``;
  * ``conv1.*`` (replaced by the 1-ch stem) and ``fc.*`` (no classifier
    head here) are skipped, exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np

from glfusion_tpu.config import ModelConfig


def _put(tree: Dict, path: Sequence[str], value: np.ndarray) -> None:
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def convert_torchvision_resnet(
        sd: Mapping[str, "np.ndarray"],
        cfg: ModelConfig) -> Dict[str, Dict]:
    """torchvision resnet50-style state dict → {'params', 'batch_stats'}
    containing ONLY the flagship ``backbone`` subtree (minus the stem
    conv, which the reference replaces), each leaf broadcast over the
    ``len(cfg.views)`` stacked view axis."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in sd.items()}
    v = len(cfg.views)

    def per_view(x: np.ndarray) -> np.ndarray:
        return np.broadcast_to(x, (v,) + x.shape).copy()

    def conv(tkey: str, path: Tuple[str, ...]) -> None:
        w = sd[f"{tkey}.weight"]
        _put(params, path + ("kernel",),
             per_view(np.transpose(w, (2, 3, 1, 0))))

    def bn(tkey: str, path: Tuple[str, ...]) -> None:
        _put(params, path + ("scale",), per_view(sd[f"{tkey}.weight"]))
        _put(params, path + ("bias",), per_view(sd[f"{tkey}.bias"]))
        _put(stats, path + ("mean",), per_view(sd[f"{tkey}.running_mean"]))
        _put(stats, path + ("var",), per_view(sd[f"{tkey}.running_var"]))

    params: Dict = {}
    stats: Dict = {}
    # conv1 is NOT mapped: the reference replaces it with a fresh
    # 1-channel stride-1 conv (models/_utils.py:192); bn1 IS kept.
    bn("bn1", ("backbone", "stem_bn"))
    for s, blocks in enumerate(cfg.block_sizes, start=1):
        for b in range(blocks):
            root = ("backbone", f"layer{s}_block{b}")
            for j in (1, 2, 3):
                conv(f"layer{s}.{b}.conv{j}", root + (f"conv{j}",))
                bn(f"layer{s}.{b}.bn{j}", root + (f"bn{j}",))
            if f"layer{s}.{b}.downsample.0.weight" in sd:
                conv(f"layer{s}.{b}.downsample.0",
                     root + ("downsample_conv",))
                bn(f"layer{s}.{b}.downsample.1",
                   root + ("downsample_bn",))
    return {"params": params, "batch_stats": stats}


def merge_backbone(variables: Mapping, converted: Mapping) -> Dict:
    """Overlay the converted backbone leaves onto an initialized variable
    collection (params or batch_stats subtree), shape-checked. Leaves not
    named by ``converted`` (the stem conv, the heads, the attentions) keep
    their initialization — mirroring the reference, whose only random
    backbone piece is the replaced conv1."""
    def rec(base, over, path):
        if not isinstance(over, Mapping):
            have = np.shape(base)
            want = np.shape(over)
            if tuple(have) != tuple(want):
                raise ValueError(
                    f"ImageNet backbone shape mismatch at {'/'.join(path)}: "
                    f"model has {tuple(have)}, state dict gives "
                    f"{tuple(want)} — the file is not a torchvision "
                    "resnet50 matching this config")
            return np.asarray(over, dtype=np.asarray(base).dtype)
        out = dict(base)
        for k, sub in over.items():
            if k not in out:
                raise ValueError(
                    f"ImageNet backbone names a parameter the model lacks: "
                    f"{'/'.join(path + (k,))}")
            out[k] = rec(out[k], sub, path + (k,))
        return out

    return rec(variables, converted, ())


def load_imagenet_backbone(path: str, cfg: ModelConfig) -> Dict[str, Dict]:
    """Load a local torchvision ``resnet50`` .pth and convert. Accepts the
    raw state dict or a {'state_dict': ...} wrapper."""
    import torch

    data = torch.load(path, map_location="cpu")
    sd = data.get("state_dict", data) if isinstance(data, dict) else data
    return convert_torchvision_resnet(sd, cfg)

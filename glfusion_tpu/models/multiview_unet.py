"""Multi-view U-Net baselines (reference ``models/ours.py``).

``baseline_unet :2416`` — per-view independent U-Nets (widths 64..1024),
5-class 1×1 head, no cross-view communication. Returns
``(d1, None, None, x5)``: per-view logits at input resolution plus the
bottleneck features (used for the cycle loss).

``multiview_unet :2518`` — identical, plus a TPAVI dot-product non-local
block over the stacked per-view bottleneck features x5 (1024 ch at H/16)
before decoding (reference ``:2597-2602``).

TPU-first: the per-view ModuleDict replicas become one stacked-parameter
``nn.vmap`` axis; encoder and decoder are vmapped separately so the fusion
sits between two fully-batched segments of one compiled graph.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.models.tpavi import TPAVI
from glfusion_tpu.models.unet import DoubleConv, UpConv, _max_pool_2x2


def _per_view(module_cls):
    return nn.vmap(
        module_cls,
        in_axes=(0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0,
                       "intermediates": 0},
        split_rngs={"params": True, "dropout": True},
    )


class _Encoder(nn.Module):
    widths: Sequence[int]
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        skips = []
        for i, w in enumerate(self.widths):
            if i > 0:
                x = _max_pool_2x2(x)
            x = DoubleConv(w, dtype=self.dtype, name=f"enc{i + 1}")(x, train)
            skips.append(x)
        return tuple(skips)


class _Decoder(nn.Module):
    widths: Sequence[int]
    out_channels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, skips, train: bool):
        widths = tuple(self.widths)
        x = skips[-1]
        for i in range(len(widths) - 2, -1, -1):
            x = UpConv(widths[i], dtype=self.dtype,
                       name=f"up{i + 2}")(x, train)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = DoubleConv(widths[i], dtype=self.dtype,
                           name=f"dec{i + 2}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="head")(x)


class MultiviewUNet(nn.Module):
    """Per-view U-Nets with optional bottleneck TPAVI fusion.

    fuse=False → baseline_unet (reference :2416);
    fuse=True  → multiview_unet (reference :2518).
    Input (V, B, H, W, 1); H, W % 16 == 0.
    """

    num_classes: int = 5
    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    fuse: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        skips = _per_view(_Encoder)(widths=tuple(self.widths),
                                    dtype=self.dtype, name="encoder")(x, train)
        x5 = skips[-1]  # (V, B, h, w, widths[-1])
        if self.fuse:
            attn = TPAVI(dtype=self.dtype, name="global_attn")
            x5 = jnp.swapaxes(
                attn(jnp.swapaxes(x5, 0, 1), train), 0, 1)
            skips = skips[:-1] + (x5,)
        mask = _per_view(_Decoder)(widths=tuple(self.widths),
                                   out_channels=self.num_classes,
                                   dtype=self.dtype,
                                   name="decoder")(skips, train)
        return {"mask": mask, "bottleneck": x5}

"""ResNet-50 backbone with the reference's "IEKD" deviations, NHWC/flax.

Behavioral contract (for checkpoint parity with the PyTorch reference):
  * Stem is a 1-channel, stride-1, 7×7 conv with padding 2 AND bias
    (``nn.Conv2d(1, 64, kernel_size=7, stride=1, padding=2)``, reference
    ``models/_utils.py:192`` — nn.Conv2d default bias=True), so 112² input
    gives a 110² stem map, 55² after maxpool, 28² at layer2+.
  * torchvision bottleneck topology with
    ``replace_stride_with_dilation=[False, True, True]`` (reference
    ``models/segmentation.py:100-102``): layer3/4 keep stride 1; the first
    block of a dilated stage uses the PREVIOUS dilation, later blocks the
    doubled one (torchvision ``_make_layer`` rule).
  * BatchNorm eps 1e-5, momentum 0.1 (torch default).

TPU-first notes: NHWC layout; the per-view replicas of the reference
(deep-copied ModuleDicts, ``models/ours.py:1724-1734``) become a stacked
parameter axis via ``nn.vmap`` in the assembly (models/glfusion.py), turning
the sequential per-view loop into one compiled grouped computation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.ops.pooling import max_pool_3x3_s2

_BN = dict(epsilon=1e-5, momentum=0.9)  # flax momentum 0.9 == torch momentum 0.1


def _stem_conv(module: nn.Module, x: jnp.ndarray, stem_width: int,
               dtype, im2col: bool) -> jnp.ndarray:
    """The IEKD 7×7 stride-1 pad-2 biased stem conv.

    im2col=True lowers it as conv_general_dilated_patches + one einsum.
    Measured verdict (r2): under the flagship's per-view ``nn.vmap`` the
    Cin=1 native conv lowers as a slow grouped conv and the im2col form
    wins IN ISOLATION (fwd+bwd 15.1 vs 21.4 ms at the 120-frame cycle
    shape) — but in the FULL train step it is a net loss (0.3736 vs
    0.3693 s; the (V,B,110,110,49) patches temp adds ~350 MB under an
    already HBM-pressured graph) and inference is within noise. Default
    False; the lowering is kept for configurations with spare HBM. Same
    math, f32 accumulation; summation order differs from the native conv
    by float reassociation only. The parameter tree
    ('stem_conv/{kernel,bias}', shapes, init) is identical to the nn.Conv
    form, so checkpoints and the torch converter are unaffected.
    """
    cin = x.shape[-1]
    sc = module.scope.push("stem_conv")
    kernel = sc.param("kernel", nn.initializers.lecun_normal(),
                      (7, 7, cin, stem_width))
    bias = sc.param("bias", nn.initializers.zeros, (stem_width,))
    if not im2col:
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(dtype)
    cols = jax.lax.conv_general_dilated_patches(
        x.astype(dtype), (7, 7), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (..., Cin*49)
    # patches order channels as (Cin, 7, 7) spatial-minor
    wk = kernel.astype(dtype).transpose(2, 0, 1, 3).reshape(
        cin * 49, stem_width)
    y = jnp.einsum("bhwk,ko->bhwo", cols, wk,
                   preferred_element_type=jnp.float32)
    return y.astype(dtype) + bias.astype(dtype)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1×1 → 3×3(stride,dilation) → 1×1(×4)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    expansion: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        out_ch = self.planes * self.expansion
        needs_proj = (self.strides != 1) or (x.shape[-1] != out_ch)

        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn1", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.strides, self.strides),
                    padding=((self.dilation, self.dilation),
                             (self.dilation, self.dilation)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn2", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn3", **_BN)(y)

        if needs_proj:
            x = nn.Conv(out_ch, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=dtype, name="downsample_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                             name="downsample_bn", **_BN)(x)
        return nn.relu(x + y)


class IEKDStem(nn.Module):
    """Stand-alone IEKD stem (conv 7×7 s1 p2 + BN + ReLU + maxpool) for
    stage-interleaved assemblies (reference model20's ``init_block``,
    ``models/ours.py:1124-1129``)."""

    stem_width: int = 64
    dtype: str = "float32"
    stem_im2col: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        x = _stem_conv(self, x, self.stem_width, dtype, self.stem_im2col)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="stem_bn", **_BN)(x)
        return max_pool_3x3_s2(nn.relu(x))


class ResNetStage(nn.Module):
    """One ResNet stage as a stand-alone module, so assemblies can run
    cross-view fusion BETWEEN stages (reference model20 feeds the fused
    stage-k features into stage k+1, ``models/ours.py:1175-1186``).

    ``first_dilation``/``dilation`` follow the torchvision ``_make_layer``
    rule: the first block of a dilated stage uses the previous dilation."""

    planes: int
    blocks: int
    stride: int = 1
    first_dilation: int = 1
    dilation: int = 1
    expansion: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for b in range(self.blocks):
            x = Bottleneck(
                planes=self.planes,
                strides=self.stride if b == 0 else 1,
                dilation=self.first_dilation if b == 0 else self.dilation,
                expansion=self.expansion,
                dtype=self.dtype,
                name=f"block{b}",
            )(x, train)
        return x


def stage_plan(block_sizes: Sequence[int], widths: Sequence[int],
               dilate_stages: Sequence[bool]):
    """Per-stage (blocks, planes, stride, first_dilation, dilation) under
    the torchvision replace_stride_with_dilation rule — the single source
    of truth shared by ResNetIEKD and stage-interleaved assemblies."""
    plan = []
    dilation = 1
    for stage, (blocks, planes, dilate) in enumerate(
            zip(block_sizes, widths, dilate_stages)):
        stride = 1 if stage == 0 else 2
        prev_dilation = dilation
        if dilate:  # torchvision: dilation *= stride; stride = 1
            dilation *= stride
            stride = 1
        plan.append((blocks, planes, stride, prev_dilation, dilation))
    return plan


class ResNetIEKD(nn.Module):
    """1-channel stride-1-stem dilated ResNet; returns the layer4 feature map.

    Input  (B, H, W, 1) → output (B, H', W', widths[-1]*expansion)
    with H' = H/4 at the reference sizes (112 → 28).
    """

    stem_width: int = 64
    block_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    expansion: int = 4
    dilate_stages: Sequence[bool] = (False, False, True, True)
    dtype: str = "float32"
    remat: bool = False
    # per-stage remat mask (len == len(block_sizes)); None → all stages
    # when remat=True
    remat_stages: Sequence[bool] | None = None
    # im2col lowering for the 1-channel stem conv (see _stem_conv):
    # isolated-vmap win, full-graph loss under HBM pressure — default off
    stem_im2col: bool = False
    # return a dict of tap activations ({"stem", "layer1".."layer4"}) instead
    # of only layer4 (multi-stage fusion, reference models/ours.py model20;
    # IEKD layer taps, reference models/_utils.py:222-231)
    return_taps: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        # Stem: 7×7 s1 p2 with bias (the IEKD swap), BN, ReLU, maxpool 3×3 s2
        # p1. (A fused Pallas stem — conv+BN+ReLU+maxpool in one HBM pass —
        # was built and measured SLOWER than this XLA lowering at every
        # tested design point; the closed kernel book lives in experiments/
        # and BASELINE.md "stem kernel book".)
        x = _stem_conv(self, x, self.stem_width, dtype, self.stem_im2col)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="stem_bn", **_BN)(x)
        x = nn.relu(x)
        stem_act = x  # pre-maxpool ('x_layerbs', reference _utils.py:222)
        x = max_pool_3x3_s2(x)

        remat_mask = self.remat_stages
        if remat_mask is None:
            remat_mask = (self.remat,) * len(self.block_sizes)
        elif len(remat_mask) != len(self.block_sizes):
            raise ValueError(
                f"remat_stages has {len(remat_mask)} entries for "
                f"{len(self.block_sizes)} stages")
        remat_block = nn.remat(Bottleneck, static_argnums=(2,))

        taps = {"stem": stem_act}
        plan = stage_plan(self.block_sizes, self.widths, self.dilate_stages)
        for stage, (blocks, planes, stride, first_dil, dil) in enumerate(plan):
            block_cls = remat_block if remat_mask[stage] else Bottleneck
            for b in range(blocks):
                x = block_cls(
                    planes=planes,
                    strides=stride if b == 0 else 1,
                    dilation=first_dil if b == 0 else dil,
                    expansion=self.expansion,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            taps[f"layer{stage + 1}"] = x
        return taps if self.return_taps else x

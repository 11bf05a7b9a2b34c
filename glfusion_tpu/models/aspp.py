"""DeepLabV3 ASPP head (reference ``models/deeplabv3.py:102-166``), NHWC/flax.

Head = ASPP(rates 12/24/36 + image pooling, 5×256→256 projection, dropout .5)
→ 3×3 conv + BN + ReLU → 1×1 conv to num_classes. The global-pooling branch's
bilinear upsample from 1×1 is an exact broadcast.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_BN = dict(epsilon=1e-5, momentum=0.9)


def _tap_bounds(r: int, d: int, size: int):
    """Output-index range [lo, hi) whose source index i + d·r is in bounds."""
    lo = max(0, -d * r)
    hi = min(size, size - d * r)
    return lo, hi


class _KernelHolder(nn.Module):
    """Bare kernel parameter with an nn.Conv-compatible tree path
    (``<name>/kernel``) so checkpoint conversion is unaffected."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


def _add_border_taps(x: jnp.ndarray, kernel: jnp.ndarray, r: int,
                     center: jnp.ndarray) -> jnp.ndarray:
    """Add a dilated 3×3 conv's non-center in-bounds taps onto ``center``.

    x: (..., H, W, Cin); kernel: (3, 3, Cin, Cout); center: the f32 center
    contribution (x @ kernel[1,1]) for every position.
    """
    h, w = x.shape[-3], x.shape[-2]
    out = center
    for ti, dy in enumerate((-1, 0, 1)):
        ylo, yhi = _tap_bounds(r, dy, h)
        if yhi <= ylo:
            continue
        for tj, dx in enumerate((-1, 0, 1)):
            if ti == 1 and tj == 1:
                continue  # center already included
            xlo, xhi = _tap_bounds(r, dx, w)
            if xhi <= xlo:
                continue
            src = x[..., ylo + dy * r:yhi + dy * r,
                    xlo + dx * r:xhi + dx * r, :]
            part = jnp.einsum("...c,co->...o", src, kernel[ti, tj],
                              preferred_element_type=jnp.float32)
            out = out.at[..., ylo:yhi, xlo:xhi, :].add(part)
    return out


class DilatedConv3x3(nn.Module):
    """Bias-free 3×3 dilated conv with clipped-tap decomposition.

    ASPP applies rates (12, 24, 36) to the reference's 28×28 f4 maps, where
    most kernel taps read far outside the map and contribute only zero
    padding. The conv is EXACTLY the sum over its 9 taps of a shifted 1×1
    contraction restricted to the in-bounds output region:

        y[i, j] += x[i + dy·r, j + dx·r] @ W[dy, dx]   where in bounds.

    At 28², rate 36 keeps only the center tap (9× fewer FLOPs), rate 24
    keeps 4-wide border strips (≈5×), rate 12 16-wide strips (≈2×) — in
    total roughly half the whole model's FLOPs at reference shapes, exactly
    (summation regrouped; partials accumulate in f32). The full conv path
    is kept for rates where clipping saves nothing. The parameter stays
    (3, 3, Cin, Cout) so torch checkpoint conversion is unchanged.
    """

    features: int
    rate: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features))
        kernel = kernel.astype(dtype)
        h, w = x.shape[-3], x.shape[-2]
        r = self.rate

        # static cost of the decomposition vs the full conv (active output
        # positions × taps)
        active = 0
        for dy in (-1, 0, 1):
            ylo, yhi = _tap_bounds(r, dy, h)
            for dx in (-1, 0, 1):
                xlo, xhi = _tap_bounds(r, dx, w)
                active += max(0, yhi - ylo) * max(0, xhi - xlo)
        if active * 2 >= 9 * h * w:
            return jax.lax.conv_general_dilated(
                x.astype(dtype), kernel, (1, 1), ((r, r), (r, r)),
                rhs_dilation=(r, r),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        xv = x.astype(dtype)
        out = jnp.zeros(x.shape[:-1] + (self.features,), jnp.float32)
        for ti, dy in enumerate((-1, 0, 1)):
            ylo, yhi = _tap_bounds(r, dy, h)
            if yhi <= ylo:
                continue
            for tj, dx in enumerate((-1, 0, 1)):
                xlo, xhi = _tap_bounds(r, dx, w)
                if xhi <= xlo:
                    continue
                src = xv[..., ylo + dy * r:yhi + dy * r,
                         xlo + dx * r:xhi + dx * r, :]
                part = jnp.einsum("...c,co->...o", src, kernel[ti, tj],
                                  preferred_element_type=jnp.float32)
                out = out.at[..., ylo:yhi, xlo:xhi, :].add(part)
        return out.astype(dtype)


class ASPP(nn.Module):
    channels: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dropout: float = 0.5
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        h, w = x.shape[-3], x.shape[-2]

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, dtype=dtype,
                                name=name, **_BN)

        def decomposes(rate: int) -> bool:
            active = 0
            for dy in (-1, 0, 1):
                ylo, yhi = _tap_bounds(rate, dy, h)
                for dx in (-1, 0, 1):
                    xlo, xhi = _tap_bounds(rate, dx, w)
                    active += max(0, yhi - ylo) * max(0, xhi - xlo)
            return active * 2 < 9 * h * w

        fuse_centers = all(decomposes(r) for r in self.rates)

        branches = []
        if fuse_centers:
            # MXU-utilization fusion: the 1×1 branch and every dilated
            # branch's CENTER tap are independent 1×1 contractions of the
            # same input — run them as ONE (C → (1+R)·ch) matmul and split.
            # Each output channel is the same dot product as in the
            # per-branch form, so values are unchanged; border taps of each
            # dilated branch are then added on their in-bounds regions.
            b0_k = _KernelHolder((1, 1, x.shape[-1], self.channels),
                                 name="b0_conv")()
            dil_ks = [
                _KernelHolder((3, 3, x.shape[-1], self.channels),
                              name=f"b{i + 1}_conv")()
                for i in range(len(self.rates))
            ]
            big = jnp.concatenate(
                [b0_k[0, 0]] + [k[1, 1] for k in dil_ks],
                axis=-1).astype(dtype)
            centers = jnp.einsum("...c,co->...o", x.astype(dtype), big,
                                 preferred_element_type=jnp.float32)
            parts = jnp.split(centers, 1 + len(self.rates), axis=-1)
            branches.append(nn.relu(bn("b0_bn")(parts[0].astype(dtype))))
            for i, rate in enumerate(self.rates):
                y = _add_border_taps(x.astype(dtype), dil_ks[i].astype(dtype),
                                     rate, parts[i + 1])
                branches.append(nn.relu(bn(f"b{i + 1}_bn")(y.astype(dtype))))
        else:
            y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=dtype,
                        name="b0_conv")(x)
            branches.append(nn.relu(bn("b0_bn")(y)))
            for i, rate in enumerate(self.rates):
                y = DilatedConv3x3(self.channels, rate, dtype=self.dtype,
                                   name=f"b{i + 1}_conv")(x)
                branches.append(nn.relu(bn(f"b{i + 1}_bn")(y)))
        # image-pooling branch: global avg → 1×1 conv → BN → ReLU → broadcast
        p = jnp.mean(x, axis=(-3, -2), keepdims=True)
        p = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=dtype,
                    name="pool_conv")(p)
        p = nn.relu(bn("pool_bn")(p))
        branches.append(jnp.broadcast_to(
            p, x.shape[:-3] + (x.shape[-3], x.shape[-2], self.channels)))

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=dtype,
                    name="project_conv")(y)
        y = nn.relu(bn("project_bn")(y))
        y = nn.Dropout(self.dropout, deterministic=not train,
                       name="project_dropout")(y)
        return y


class DeepLabHead(nn.Module):
    """ASPP → 3×3 conv/BN/ReLU → 1×1 conv logits (no upsampling here)."""

    num_outputs: int
    channels: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dropout: float = 0.5
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        y = ASPP(channels=self.channels, rates=self.rates,
                 dropout=self.dropout, dtype=self.dtype, name="aspp")(x, train)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, name="conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_outputs, (1, 1), use_bias=True, dtype=dtype,
                    name="out_conv")(y)
        return y

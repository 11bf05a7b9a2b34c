"""UTNet — hybrid conv/transformer U-Net baseline (reference ``models/utnet.py``).

Behavior contract (reference ``models/utnet.py:11-103`` + blocks in
``models/conv_trans_utils.py`` / ``models/unet_utils.py``):

  * 5-stage encoder at widths base·(1,2,4,8,16); stages named in
    ``block_list`` use MaxPool→pre-act ResBlock→N×BasicTransBlock
    (``down_block_trans :385``), others plain conv down blocks.
  * LinearAttention (``conv_trans_utils.py:150``): depthwise-separable qkv,
    k/v bilinearly downsampled (align_corners=True) to a reduce_size² grid —
    attention cost is O(HW·r²), MXU-friendly static shapes. Relative position
    bias (Swin-style table, ``RelativePositionBias :344``) is ADDED BEFORE
    the 1/√d scale (faithful to the reference's ``:204-208`` order).
  * Decoder: cross-attention up blocks (``up_block_trans :414``) where the
    high-res map queries the low-res one, plus residual ×2-bilinear conv_ch
    path, skip concat, pre-act ResBlock. Non-transformer stages use plain
    ``up_block`` (``unet_utils.py:280``). Up blocks are keyed on the SKIP
    level (up1 iff '3' in block_list, …, up4 iff '0').
  * The reference's optional aux heads (out1..3, gated by ``aux_loss``) are
    NOT ported — no caller in the reference enables them.

UTNet_Encoderonly (``:105``) = transformer encoder + plain conv decoder,
selected here with ``decoder_attn=False``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from glfusion_tpu.ops.resize import resize_bilinear_ac

_BN = dict(epsilon=1e-5, momentum=0.9)


class DepthwiseSeparableConv(nn.Module):
    """depthwise 3×3 + pointwise 1×1, both bias-free (reference :14-24)."""

    features: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise")(x)


class PreActBasicBlock(nn.Module):
    """Pre-activation residual block (reference conv_trans_utils.py:46-78)."""

    features: int
    strides: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)  # the identity shortcut must not promote
        residue = x
        out = nn.BatchNorm(use_running_average=not train, name="bn1",
                           dtype=self.dtype, **_BN)(x)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2",
                           dtype=self.dtype, **_BN)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        if self.strides != 1 or x.shape[-1] != self.features:
            residue = nn.BatchNorm(use_running_average=not train,
                                   name="short_bn", dtype=self.dtype,
                                   **_BN)(residue)
            residue = nn.relu(residue)
            residue = nn.Conv(self.features, (1, 1),
                              strides=(self.strides,) * 2, use_bias=False,
                              dtype=self.dtype, name="short_conv")(residue)
        return out + residue


class RelativePositionBias(nn.Module):
    """Swin-style 2-D relative position bias over an h×w key grid, expanded
    to an H×W query grid by repeat (reference conv_trans_utils.py:344-382)."""

    num_heads: int
    h: int
    w: int

    @nn.compact
    def __call__(self, qh: int, qw: int) -> jnp.ndarray:
        table = self.param(
            "table", nn.initializers.normal(0.02),
            ((2 * self.h - 1) * (2 * self.w - 1), self.num_heads))
        ch, cw = np.arange(self.h), np.arange(self.w)
        coords = np.stack(np.meshgrid(ch, cw, indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += self.h - 1
        rel[:, :, 1] += self.w - 1
        rel[:, :, 0] *= 2 * self.h - 1
        index = rel.sum(-1)  # (hw, hw) static
        bias = table[jnp.asarray(index.reshape(-1))]
        bias = bias.reshape(self.h, self.w, self.h * self.w, self.num_heads)
        bias = jnp.repeat(bias, qh // self.h, axis=0)
        bias = jnp.repeat(bias, qw // self.w, axis=1)
        bias = bias.reshape(qh * qw, self.h * self.w, self.num_heads)
        return jnp.transpose(bias, (2, 0, 1))  # (heads, QHW, hw)


def _split_heads(t: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, H, W, heads*dh) → (B, heads, HW, dh) with the reference's
    '(dim_head heads)' channel order (conv_trans_utils.py:197-199)."""
    b, h, w, c = t.shape
    dh = c // heads
    t = t.reshape(b, h * w, dh, heads)
    return jnp.transpose(t, (0, 3, 1, 2))


def _merge_heads(t: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, heads, n, dh = t.shape
    t = jnp.transpose(t, (0, 2, 3, 1))  # (B, HW, dh, heads)
    return t.reshape(b, h, w, dh * heads)


class LinearAttention(nn.Module):
    """Spatial-reduction MHA (reference conv_trans_utils.py:150-215)."""

    heads: int
    reduce_size: int = 8
    rel_pos: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        inner = c  # dim_head = c // heads (reference utnet.py ctor)
        qkv = DepthwiseSeparableConv(inner * 3, dtype=self.dtype,
                                     name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        r = self.reduce_size
        if h != r:
            k = resize_bilinear_ac(k, (r, r))
            v = resize_bilinear_ac(v, (r, r))
        q = _split_heads(q, self.heads)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k)
        if self.rel_pos:
            bias = RelativePositionBias(
                self.heads, r, r, name="rel_pos")(h, w)
            attn = attn + bias.astype(attn.dtype)  # fp32 table, no promote
        attn = attn * (inner // self.heads) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out, h, w)
        return DepthwiseSeparableConv(c, dtype=self.dtype, name="to_out")(out)


class CrossAttention(nn.Module):
    """Decoder cross-attention: high-res queries low-res keys/values
    (reference LinearAttentionDecoder, conv_trans_utils.py:217-283)."""

    out_ch: int
    heads: int
    reduce_size: int = 8
    rel_pos: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, q_feat, kv_feat, train: bool):
        bh, hh, wh, _ = q_feat.shape
        inner = self.out_ch
        kv = DepthwiseSeparableConv(inner * 2, dtype=self.dtype,
                                    name="to_kv")(kv_feat)
        k, v = jnp.split(kv, 2, axis=-1)
        q = DepthwiseSeparableConv(inner, dtype=self.dtype,
                                   name="to_q")(q_feat)
        r = self.reduce_size
        if kv_feat.shape[1] != r:
            k = resize_bilinear_ac(k, (r, r))
            v = resize_bilinear_ac(v, (r, r))
        q = _split_heads(q, self.heads)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k)
        if self.rel_pos:
            bias = RelativePositionBias(
                self.heads, r, r, name="rel_pos")(hh, wh)
            attn = attn + bias.astype(attn.dtype)
        attn = attn * (inner // self.heads) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out, hh, wh)
        return DepthwiseSeparableConv(self.out_ch, dtype=self.dtype,
                                      name="to_out")(out)


class BasicTransBlock(nn.Module):
    """BN → attention (+x) → BN/ReLU/1×1 (+res) (reference :80-107)."""

    heads: int
    reduce_size: int = 8
    rel_pos: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        out = nn.BatchNorm(use_running_average=not train, name="bn1",
                           dtype=self.dtype, **_BN)(x)
        out = LinearAttention(self.heads, self.reduce_size, self.rel_pos,
                              dtype=self.dtype, name="attn")(out, train)
        out = out + x
        residue = out
        out = nn.BatchNorm(use_running_average=not train, name="bn2",
                           dtype=self.dtype, **_BN)(out)
        out = nn.relu(out)
        out = nn.Conv(x.shape[-1], (1, 1), use_bias=False, dtype=self.dtype,
                      name="mlp")(out)
        return out + residue


class TransDecoderBlock(nn.Module):
    """Cross-attn up block (reference BasicTransDecoderBlock :109-148)."""

    out_ch: int
    heads: int
    reduce_size: int = 8
    rel_pos: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, low, high, train: bool):
        # residual path: 1×1 conv on low, bilinear (ac=True) to high's size
        residue = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                          name="conv_ch")(low)
        residue = resize_bilinear_ac(residue, high.shape[1:3])
        ln = nn.BatchNorm(use_running_average=not train, name="bn_l",
                          dtype=self.dtype, **_BN)(low)
        hn = nn.BatchNorm(use_running_average=not train, name="bn_h",
                          dtype=self.dtype, **_BN)(high)
        out = CrossAttention(self.out_ch, self.heads, self.reduce_size,
                             self.rel_pos, dtype=self.dtype,
                             name="attn")(hn, ln, train)
        out = out + residue
        residue = out
        out = nn.BatchNorm(use_running_average=not train, name="bn2",
                           dtype=self.dtype, **_BN)(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="mlp")(out)
        return out + residue


class UTNet(nn.Module):
    """Reference UTNet (block_list='234', num_blocks=[1,2,4] defaults)."""

    num_classes: int = 1
    base: int = 32
    block_list: str = "234"
    num_blocks: Sequence[int] = (1, 2, 4)
    heads: Sequence[int] = (2, 4, 8)
    reduce_size: int = 8
    rel_pos: bool = True
    decoder_attn: bool = True  # False → UTNet_Encoderonly (reference :105)
    # also return the deepest encoder feature map (the bottleneck) so
    # assemblies/trainers can reuse it (e.g. cycle features)
    return_features: bool = False
    dtype: str = "float32"  # compute dtype (params stay fp32)

    def _stage_cfg(self, stage: int):
        """Map encoder stage 1..4 to (is_trans, num_attn, heads).

        Reference indexing: stage s uses num_heads[s-4] / num_blocks[s-4]
        from the END of the lists (utnet.py:29-52).
        """
        trans = str(stage) in self.block_list
        nb = list(self.num_blocks)
        hd = list(self.heads)
        # python negative indexing over the provided short lists
        idx = stage - 5  # stage1→-4, stage2→-3, stage3→-2, stage4→-1
        heads = hd[idx] if -len(hd) <= idx else hd[0]
        nblk = nb[idx] if -len(nb) <= idx else nb[0]
        return trans, nblk, heads

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        base = self.base
        widths = [base, 2 * base, 4 * base, 8 * base, 16 * base]

        # inc: BasicBlock(in→base) + (trans | BasicBlock) — the FIRST
        # pre-act block sees the raw input (its bn1 normalizes the input
        # channels and the 1×1 shortcut projects them), utnet.py:17-25;
        # there is no extra plain conv in front
        h1 = PreActBasicBlock(base, dtype=self.dtype,
                              name="inc_block")(x, train)
        if "0" in self.block_list:
            h1 = BasicTransBlock(self.heads[0], self.reduce_size,
                                 self.rel_pos, dtype=self.dtype,
                                 name="inc_trans")(h1, train)
        else:
            h1 = PreActBasicBlock(base, dtype=self.dtype,
                                  name="inc_block2")(h1, train)

        feats = [h1]
        for s in range(1, 5):
            trans, nblk, heads = self._stage_cfg(s)
            y = nn.max_pool(feats[-1], (2, 2), strides=(2, 2))
            y = PreActBasicBlock(widths[s], dtype=self.dtype,
                                 name=f"down{s}_conv")(y, train)
            if trans:
                for bidx in range(nblk):
                    y = BasicTransBlock(
                        heads, self.reduce_size, self.rel_pos,
                        dtype=self.dtype,
                        name=f"down{s}_trans{bidx}")(y, train)
            else:
                y = PreActBasicBlock(widths[s], dtype=self.dtype,
                                     name=f"down{s}_conv2")(y, train)
            feats.append(y)

        out = feats[4]
        for s in range(4, 0, -1):
            skip = feats[s - 1]
            # the up block is keyed on the SKIP level's trans-ness —
            # up1 iff '3', up2 iff '2', up3 iff '1', up4 iff '0'
            # (utnet.py:17-49) — while its heads come from stage s's
            # num_heads slot (up1 = num_heads[-1], ...)
            trans = str(s - 1) in self.block_list
            _, _, heads = self._stage_cfg(s)
            if self.decoder_attn and trans:
                out = TransDecoderBlock(
                    widths[s - 1], heads, self.reduce_size, self.rel_pos,
                    dtype=self.dtype,
                    name=f"up{s}_attn")(out, skip, train)
                out = jnp.concatenate([out, skip], axis=-1)
                out = PreActBasicBlock(widths[s - 1], dtype=self.dtype,
                                       name=f"up{s}_conv")(out, train)
            else:
                # plain up_block (reference unet_utils.py:280-311)
                up = resize_bilinear_ac(out, skip.shape[1:3])
                up = nn.Conv(widths[s - 1], (1, 1), dtype=self.dtype,
                             name=f"up{s}_conv_ch")(up)
                out = jnp.concatenate([skip, up], axis=-1)
                out = PreActBasicBlock(widths[s - 1], dtype=self.dtype,
                                       name=f"up{s}_conv")(out, train)
                out = PreActBasicBlock(widths[s - 1], dtype=self.dtype,
                                       name=f"up{s}_conv2")(out, train)

        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="outc")(out)
        return (out, feats[4]) if self.return_features else out

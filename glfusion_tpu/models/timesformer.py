"""Multi-view TimeSformer for scalar video regression
(reference ``models/TimeSformer.py``).

Behavior contract:
  * Input (B, V, F, H, W) single-channel multi-view video; per-view
    14×14-patch embedding (patch_dim = p², 1 channel, reference ``:287``),
    one learnable cls token PER VIEW (``:249``).
  * Each depth layer: divided space-time attention — time attention folds
    tokens as (view·frame) per spatial site, space attention as
    (view·patch) per frame (the einops patterns at ``:321-322``) — then a
    GEGLU feed-forward; every sublayer is pre-LayerNorm with residual.
  * Rotary position embeddings: 1-D over the (V·F) time axis
    (``RotaryEmbedding :53``, whose ``n*4`` accounts for V=4 views) and
    axial 2-D over the (V·hp, wp) space grid (``AxialRotaryEmbedding :22``,
    whose ``h *= 4`` likewise). Applied to q/k before attention.
  * The cls token of each view attends over ALL of that view's tokens;
    cls keys/values are prepended to every time/space attention group.
  * Head: concat the V cls tokens → LayerNorm → Linear(num_classes)
    (``:273-276``) — a scalar for mPAP regression in the smoke block.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat
from flax import linen as nn


def _rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    x = rearrange(x, "... (d j) -> ... d j", j=2)
    x1, x2 = x[..., 0], x[..., 1]
    return rearrange(jnp.stack((-x2, x1), axis=-1), "... d j -> ... (d j)")


def _apply_rot(q, k, rot: Tuple[jnp.ndarray, jnp.ndarray]):
    sin, cos = rot
    rd = sin.shape[-1]
    q_r, q_p = q[..., :rd], q[..., rd:]
    k_r, k_p = k[..., :rd], k[..., rd:]
    q_r = q_r * cos + _rotate_every_two(q_r) * sin
    k_r = k_r * cos + _rotate_every_two(k_r) * sin
    return (jnp.concatenate([q_r, q_p], -1),
            jnp.concatenate([k_r, k_p], -1))


def frame_rotary(n_tokens: int, dim_head: int):
    """1-D rotary over the folded (V·F) axis (reference RotaryEmbedding :53)."""
    inv = 1.0 / (10000 ** (np.arange(0, dim_head, 2, dtype=np.float64)
                           / dim_head))
    freqs = np.arange(n_tokens)[:, None] * inv[None, :]
    freqs = np.concatenate([freqs, freqs], -1)[None]  # (1, N, dim_head)
    return jnp.asarray(np.sin(freqs), jnp.float32), \
        jnp.asarray(np.cos(freqs), jnp.float32)


def axial_rotary(h: int, w: int, dim_head: int, max_freq: float = 10.0):
    """Axial 2-D rotary over an h×w grid (reference AxialRotaryEmbedding :22);
    the caller passes h already scaled by V."""
    d4 = dim_head // 4
    scales = np.logspace(0.0, math.log(max_freq / 2) / math.log(2), d4,
                         base=2.0)[None]
    h_seq = np.linspace(-1, 1, h)[:, None] * scales * math.pi
    w_seq = np.linspace(-1, 1, w)[:, None] * scales * math.pi
    x_sinu = np.broadcast_to(h_seq[:, None, :], (h, w, d4))
    y_sinu = np.broadcast_to(w_seq[None, :, :], (h, w, d4))
    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], -1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], -1)
    sin = sin.reshape(h * w, -1)
    cos = cos.reshape(h * w, -1)
    sin = np.repeat(sin, 2, axis=-1)[None]
    cos = np.repeat(cos, 2, axis=-1)[None]
    return jnp.asarray(sin, jnp.float32), jnp.asarray(cos, jnp.float32)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0  # after GEGLU, before fc2 (reference :120-127)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype,
                     name="fc1")(x)
        y, gates = jnp.split(y, 2, axis=-1)
        y = y * nn.gelu(gates)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class DividedAttention(nn.Module):
    """Space or time attention with per-view cls routing (reference :156-216)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0  # on the output projection (reference :170-172)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, fold_from: str, fold_to: str, rot,
                 train: bool = False, **dims):
        h = self.heads
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b v n (h d) -> (b h) v n d", h=h)
                   for t in (q, k, v))
        q = q * self.dim_head ** -0.5

        cls_q, q_ = q[:, :, :1], q[:, :, 1:]
        cls_k, k_ = k[:, :, :1], k[:, :, 1:]
        cls_v, v_ = v[:, :, :1], v[:, :, 1:]

        # cls of each view attends over all that view's tokens
        sim = jnp.einsum("bvid,bvjd->bvij", cls_q, k)
        cls_out = jnp.einsum("bvij,bvjd->bvid", nn.softmax(sim, -1), v)

        # fold for time ((b n) (v f) d) or space ((b f) (v n) d)
        q_, k_, v_ = (rearrange(t, f"{fold_from} -> {fold_to}", **dims)
                      for t in (q_, k_, v_))
        if rot is not None:
            # fp32 sin/cos tables must not promote a bf16 chain
            q_, k_ = _apply_rot(q_, k_, tuple(
                t.astype(q_.dtype) for t in rot))
        r = q_.shape[0] // cls_k.shape[0]
        ck = repeat(cls_k, "b v n d -> (b r) (v n) d", r=r)
        cv = repeat(cls_v, "b v n d -> (b r) (v n) d", r=r)
        k_ = jnp.concatenate([ck, k_], axis=1)
        v_ = jnp.concatenate([cv, v_], axis=1)

        sim = jnp.einsum("bid,bjd->bij", q_, k_)
        out = jnp.einsum("bij,bjd->bid", nn.softmax(sim, -1), v_)
        out = rearrange(out, f"{fold_to} -> {fold_from}", **dims)
        out = jnp.concatenate([cls_out, out], axis=2)
        out = rearrange(out, "(b h) v n d -> b v n (h d)", h=h)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class TimeSformer(nn.Module):
    """(B, V, F, H, W) multi-view video → (B, num_classes)."""

    dim: int = 196
    num_classes: int = 1
    patch_size: int = 14
    depth: int = 12
    heads: int = 4
    dim_head: int = 48
    # the reference class defaults both to 0; its mPAP smoke config
    # (:337-338) sets 0.1 — exposed so the recipe is reproducible
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: str = "float32"  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, video, train: bool = False):
        b, v, f, hh, ww = video.shape
        p = self.patch_size
        assert hh % p == 0 and ww % p == 0
        hp, wp = hh // p, ww // p
        n = hp * wp

        patches = rearrange(video, "b v f (h p1) (w p2) -> b v (f h w) (p1 p2)",
                            p1=p, p2=p)
        tokens = nn.Dense(self.dim, dtype=self.dtype,
                          name="patch_embed")(patches)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (v, self.dim)).astype(self.dtype)
        cls = repeat(cls, "v d -> b v 1 d", b=b)
        x = jnp.concatenate([cls, tokens], axis=2)

        time_rot = frame_rotary(v * f, self.dim_head)
        space_rot = axial_rotary(v * hp, wp, self.dim_head)

        for i in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype, name=f"l{i}_time_norm")(x)
            x = DividedAttention(self.dim, self.heads, self.dim_head,
                                 self.attn_dropout, dtype=self.dtype,
                                 name=f"l{i}_time_attn")(
                y, "b v (f n) d", "(b n) (v f) d",
                time_rot, train=train, n=n, f=f, v=v) + x
            y = nn.LayerNorm(dtype=self.dtype, name=f"l{i}_space_norm")(x)
            x = DividedAttention(self.dim, self.heads, self.dim_head,
                                 self.attn_dropout, dtype=self.dtype,
                                 name=f"l{i}_space_attn")(
                y, "b v (f n) d", "(b f) (v n) d",
                space_rot, train=train, n=n, f=f, v=v) + x
            y = nn.LayerNorm(dtype=self.dtype, name=f"l{i}_ff_norm")(x)
            x = GEGLUFeedForward(self.dim, dropout=self.ff_dropout,
                                 dtype=self.dtype,
                                 name=f"l{i}_ff")(y, train=train) + x

        cls_out = x[:, :, 0].reshape(b, -1)  # concat V cls tokens
        cls_out = nn.LayerNorm(dtype=self.dtype, name="out_norm")(cls_out)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="out_fc")(cls_out)

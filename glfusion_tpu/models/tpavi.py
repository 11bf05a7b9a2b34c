"""TPAVI non-local fusion block (reference ``models/ours.py:770-917``, mode='dot').

Operates on a stacked multi-view feature volume. The reference layout is
(B, C, V, H, W); ours is channels-last (B, V, H, W, C). Semantics preserved:

  theta/phi/g : 1×1×1 convs C → C/2   (per-token Dense, bias=True)
  f = theta @ phi^T ; y = (f / N) @ g  over N = V·H·W tokens  (no softmax)
  W_z : 1×1×1 conv C/2 → C + BatchNorm3d with ZERO-init scale and bias
        (reference ``:826-827``) → at init the block is identity + LayerNorm
  z = LayerNorm(W_z(y) + x) over the channel axis (eps 1e-5)

The unused audio path (``align_channel`` Linear, reference ``:801,855-861``)
is intentionally omitted; GL-Fusion never passes audio.

TPU-first: the matmul pair is reassociated to theta @ (phi^T g) / N — exact
in real arithmetic, O(N·C'²) instead of O(N²·C') FLOPs and no N² HBM traffic
(see ops/nonlocal_attn.py). A fused Pallas kernel covers the naive order for
bit-parity runs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention

_BN = dict(epsilon=1e-5, momentum=0.9)


class TPAVI(nn.Module):
    """mode='dot' is GL-Fusion's production path; 'gaussian'/'embedded'/
    'concatenate' complete the reference module's API
    (``models/TPAVI.py:6-156``):

      gaussian    : f = softmax(x xᵀ)            (raw features, no θ/φ)
      embedded    : f = softmax(θ(x) φ(kv)ᵀ)
      dot         : f = θ(x) φ(kv)ᵀ / N          (no softmax)
      concatenate : f[i,j] = ReLU(W_f [θᵢ‖φⱼ]) / N
    """

    inter_channels: int | None = None
    attn_impl: str = "auto"  # 'auto' | 'naive' | 'reassoc' | 'pallas'
    mode: str = "dot"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 kv: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, V, H, W, C) → (B, V, H, W, C).

        kv: optional same-shape feature volume supplying the φ keys
        (cross-view attention — the intent of the reference's
        ``tpavi_vv_multiview``, ``models/ResNet_AVSModel.py:221-227``;
        its shipped audio-path reshape crashes on echo shapes, so the
        cross path is implemented by intent: queries/values from x,
        keys from the other view). Defaults to self-attention.
        """
        b, v, h, w, c = x.shape
        inter = self.inter_channels or max(c // 2, 1)
        dtype = jnp.dtype(self.dtype)
        n = v * h * w

        tokens = x.reshape(b, n, c)
        kv_tokens = tokens if kv is None else kv.reshape(b, n, c)

        if self.mode != "gaussian" and kv is None and not train:
            # Self-attention fast path (eval only): θ, φ, g all project the
            # SAME tokens with independent weights — run them as ONE
            # C → 3·C′ matmul (weights concatenated at apply time via the
            # scope API, so the parameter tree, init values, and
            # checkpoint-name mapping are identical to three nn.Dense
            # calls; outputs are mathematically identical — each output
            # channel is the same dot product, differing from the split
            # form by float reassociation only, so bitwise equality is
            # backend-dependent: confirmed for f32 CPU, not guaranteed for
            # the wider bf16 matmul's tiling). One
            # read of the (B·N, C) token matrix instead of three:
            # measured +1.4 % inference throughput; the fused form's
            # backward measured ~2 % slower, so training keeps the
            # three-matmul form (BASELINE.md).
            ks, bs = [], []
            for name in ("theta", "phi", "g"):
                s = self.scope.push(name)
                ks.append(s.param("kernel", nn.initializers.lecun_normal(),
                                  (c, inter)))
                bs.append(s.param("bias", nn.initializers.zeros, (inter,)))
            big = jnp.concatenate(ks, axis=-1).astype(dtype)
            bias = jnp.concatenate(bs).astype(dtype)
            fused = tokens.astype(dtype) @ big + bias
            theta, phi, g = jnp.split(fused, 3, axis=-1)
        else:
            g = nn.Dense(inter, dtype=dtype, name="g")(tokens)
            theta = phi = None

        if self.mode == "gaussian":
            f = jnp.einsum("bic,bjc->bij", tokens, kv_tokens)
            y = jnp.einsum("bij,bjd->bid", nn.softmax(f, -1), g)
        else:
            if theta is None:
                theta = nn.Dense(inter, dtype=dtype, name="theta")(tokens)
                phi = nn.Dense(inter, dtype=dtype, name="phi")(kv_tokens)
            if self.mode == "dot":
                if self.attn_impl == "pallas":
                    from glfusion_tpu.ops.tpavi_pallas import (
                        fused_dot_nonlocal)
                    y = fused_dot_nonlocal(theta, phi, g)
                else:
                    y = dot_nonlocal_attention(theta, phi, g,
                                               impl=self.attn_impl)
            elif self.mode == "embedded":
                f = jnp.einsum("bic,bjc->bij", theta, phi)
                y = jnp.einsum("bij,bjd->bid", nn.softmax(f, -1), g)
            elif self.mode == "concatenate":
                # pairwise concat → 1-ch conv → ReLU (reference :121-132)
                wf = nn.Dense(1, name="w_f")
                ti = jnp.broadcast_to(theta[:, :, None, :],
                                      (b, n, n, inter))
                pj = jnp.broadcast_to(phi[:, None, :, :], (b, n, n, inter))
                f = nn.relu(
                    wf(jnp.concatenate([ti, pj], -1))[..., 0])
                y = jnp.einsum("bij,bjd->bid", f / n, g)
            else:
                raise ValueError(f"unknown mode {self.mode!r}")

        wy = nn.Dense(c, dtype=dtype, name="w_z_conv")(y)
        wy = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                          scale_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="w_z_bn", **_BN)(wy)
        z = wy + tokens
        z = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="norm")(z)
        return z.reshape(b, v, h, w, c)

"""Dot-product non-local attention core (the TPAVI hot op).

The reference TPAVI module (``models/ours.py:770-917``, mode='dot') computes,
over N = V·H·W tokens with C' = C/2 projected channels:

    f = theta @ phi^T            # (B, N, N)
    y = (f / N) @ g              # (B, N, C')

This is attention without softmax — a pair of large matmuls. Materializing f
costs N²·4 bytes of HBM per batch element (22 MB at N=2352); on TPU we instead
fuse the pair so f only ever lives in VMEM tiles (see
``glfusion_tpu/ops/tpavi_pallas.py``), or — mathematically equivalent and even
cheaper when N > C' — reassociate the product:

    y = theta @ (phi^T @ g) / N  # (B, N, C') via a (C', C') intermediate

Both paths are exposed here; ``dot_nonlocal_attention`` picks by policy.
Reassociation is exact in real arithmetic; in floats it changes summation
order, so checkpoint-parity evaluation can force the naive order.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot_nonlocal_attention(theta: jnp.ndarray, phi: jnp.ndarray, g: jnp.ndarray,
                           *, impl: str = "auto") -> jnp.ndarray:
    """y[b,i,:] = sum_j <theta[b,i], phi[b,j]> / N * g[b,j].

    Args:
      theta, phi, g: (B, N, C') token projections.
      impl: 'naive' (materialize the N×N map, reference order),
            'reassoc' (N>C' optimal: (C'×C') intermediate),
            'auto' (reassoc when it is the cheaper contraction).
    Returns:
      (B, N, C')
    """
    n = theta.shape[-2]
    c = theta.shape[-1]
    if impl == "auto":
        impl = "reassoc" if n > c else "naive"
    if impl == "reassoc":
        # (B, C', C') intermediate: phi^T @ g, then theta @ that.
        pg = jnp.einsum("bjc,bjd->bcd", phi, g,
                        preferred_element_type=jnp.float32)
        y = jnp.einsum("bic,bcd->bid", theta, pg,
                       preferred_element_type=jnp.float32)
        return y / n
    if impl == "naive":
        f = jnp.einsum("bic,bjc->bij", theta, phi,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("bij,bjd->bid", f / n, g,
                          preferred_element_type=jnp.float32)
    raise ValueError(f"unknown impl {impl!r}")

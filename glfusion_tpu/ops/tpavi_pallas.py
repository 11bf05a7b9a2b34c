"""Fused Pallas TPU kernel for the TPAVI dot non-local attention.

Computes y = (theta @ phi^T / N) @ g over N tokens without ever materializing
the N×N similarity map in HBM (the reference materializes it at
``models/ours.py:881,902`` — 22 MB per batch element at N=2352).

Grid is (B, N/TM, N/TK); each step computes a (TM, TK) tile of the similarity
map in VMEM, immediately contracts it against the matching g tile and
accumulates the (TM, C') output block in a float32 VMEM scratch accumulator.
Tokens are padded to the 128-lane boundary by the wrapper; padded phi/g rows
contribute exactly zero because g is zero there and the division uses the
TRUE token count N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(n: int, c_pad: int, itemsize: int) -> int:
    """Token tile (used for both the query and key axes): the largest
    exact divisor of the sublane-aligned N whose working set fits VMEM.

    Exact-divisor tiles avoid padding and shrink the grid (measured 2×
    faster than the generic 256 at the reference shape). The VMEM budget
    accounts for double-buffered inputs (3 blocks ×2), the output block
    (×2) and the f32 accumulator; exceeding it crashes the TPU compiler
    with a scoped-vmem OOM.
    """
    sublane = 16 if itemsize <= 2 else 8
    n_al = _round_up(n, sublane)
    budget = 14 * 1024 * 1024
    per_row = c_pad * (8 * itemsize + 4)
    cap = max(budget // per_row, 128)
    for d in range(2, 32):
        t = n_al // d
        if n_al % d == 0 and t <= cap and t % sublane == 0:
            return t
    return 256


def _kernel(theta_ref, phi_ref, g_ref, out_ref, acc_ref, *, n_true: int,
            n_k_steps: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # (TM, TK) similarity tile on the MXU, fp32 accumulate.
    f = jax.lax.dot_general(
        theta_ref[0], phi_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Contract against g tile; scale by true token count.
    acc_ref[:] += jnp.dot(f, g_ref[0], preferred_element_type=jnp.float32) / n_true

    @pl.when(k == n_k_steps - 1)
    def _flush():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_dot_nonlocal_fwd_impl(theta: jnp.ndarray, phi: jnp.ndarray,
                                 g: jnp.ndarray,
                                 interpret: bool = False) -> jnp.ndarray:
    """y[b] = (theta[b] @ phi[b]^T / N) @ g[b] for (B, N, C') operands."""
    b, n, c = theta.shape
    c_pad = _round_up(c, 128)
    tile = _pick_tile(n, c_pad, theta.dtype.itemsize)
    n_pad = _round_up(n, tile)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, c_pad - c)))

    theta_p, phi_p, g_p = pad(theta), pad(phi), pad(g)
    n_k_steps = n_pad // tile

    grid = (b, n_pad // tile, n_k_steps)
    out = pl.pallas_call(
        functools.partial(_kernel, n_true=n, n_k_steps=n_k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c_pad), lambda bi, i, k: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c_pad), lambda bi, i, k: (bi, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c_pad), lambda bi, i, k: (bi, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c_pad), lambda bi, i, k: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_pad), theta.dtype),
        scratch_shapes=[pltpu.VMEM((tile, c_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * n_pad * c_pad,
            bytes_accessed=3 * b * n_pad * c_pad * theta.dtype.itemsize
            + b * n_pad * c_pad * theta.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(theta_p, phi_p, g_p)
    return out[:, :n, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dot_nonlocal(theta: jnp.ndarray, phi: jnp.ndarray, g: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas forward + analytic backward, so the kernel is trainable.

    The backward of y = (θφᵀ/N)g reassociates every term into (C', C')
    intermediates — no N² map is ever materialized:
        dθ = dy (gᵀφ) / N,  dφ = g (dyᵀθ) / N,  dg = φ (θᵀdy) / N.
    Exact in real arithmetic; float summation order differs from the naive
    chain the same way the default reassoc forward does.
    """
    return _fused_dot_nonlocal_fwd_impl(theta, phi, g, interpret)


def _fdn_fwd(theta, phi, g, interpret):
    return (_fused_dot_nonlocal_fwd_impl(theta, phi, g, interpret),
            (theta, phi, g))


def _fdn_bwd(interpret, res, dy):
    theta, phi, g = res
    n = theta.shape[-2]
    f32 = jnp.float32
    gtp = jnp.einsum("bjd,bjc->bdc", g, phi, preferred_element_type=f32)
    dtheta = jnp.einsum("bid,bdc->bic", dy, gtp,
                        preferred_element_type=f32) / n
    dyt = jnp.einsum("bid,bic->bdc", dy, theta, preferred_element_type=f32)
    dphi = jnp.einsum("bjd,bdc->bjc", g, dyt, preferred_element_type=f32) / n
    tdy = jnp.einsum("bic,bid->bcd", theta, dy, preferred_element_type=f32)
    dg = jnp.einsum("bjc,bcd->bjd", phi, tdy, preferred_element_type=f32) / n
    return (dtheta.astype(theta.dtype), dphi.astype(phi.dtype),
            dg.astype(g.dtype))


fused_dot_nonlocal.defvjp(_fdn_fwd, _fdn_bwd)

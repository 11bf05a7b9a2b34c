"""Pallas fused IEKD stem: 7×7 s1 conv + train-BN + ReLU + maxpool, one HBM pass.

Why a hand kernel HERE (and almost nowhere else): the stem is a measured
XLA weakness, not a strength (BASELINE.md r2) —

  * under the per-view ``nn.vmap`` the Cin=1 7×7 conv lowers as a
    ``batch_group_count`` grouped conv that is 2.1× slower than the plain
    form (6.1 vs 2.9 ms fwd at the 120-frame shape);
  * the im2col rewrite fixes the isolated op but LOSES in the full train
    step: its (V,B,110,110,49) patches temp adds ~350 MB of HBM under an
    already-pressured graph;
  * train-mode BN makes XLA materialize the (B,110,110,64) conv map and
    re-read it (stats pass + normalize pass), doubling the stage's
    bandwidth; stem+layer1 burn ~49 ms of fwd+bwd per cycle pass at
    ≤10 % of peak.

This kernel family keeps the 110² conv map out of HBM entirely: the grid
is (image, row-slab) — each invocation computes a ~10-row slab of the conv
in VMEM via an im2col matmul and fuses the BN/ReLU/pool epilogue (or the
backward) over it, so VMEM stays bounded at one slab (~5 MB). The
parity-split padded input (see below) is computed once per image into a
persistent VMEM scratch and sliced per-slab with ``pl.ds``. HBM traffic
drops to [read x a few times + write pooled once] — the 112²×1 input is
~50× smaller than the 110²×64 map. The backward is a custom VJP in the
same style (conv recomputed per slab, global BN reductions in two passes,
per-(image, slab) weight-gradient partials, dx accumulated in scratch).

Mosaic-shaped design (each choice worked around a real lowering failure):
  * NO stride-2 vector ops (``vector.extract_strided_slice`` forbids
    stride 2) and NO 3D ``dot_general`` (unsupported shape cast): the
    pool's column parity is obtained by computing the even-x and odd-x
    conv outputs SEPARATELY from parity-split input images (the split is
    an exact one-hot 2D matmul on the tiny padded input); the row parity
    uses leading-dim reshape tricks only.
  * A monolithic per-image kernel allocated 54 MB of scoped VMEM and a
    statically-unrolled in-kernel slab loop still peaked at 32 MB (no
    cross-iteration stack reuse) — hence the slab GRID dimension.
  * patches build in f32 — non-trivial minor-dim insertion (the stack)
    is only supported for 32-bit types.
  * per-channel vectors pass as (1, C) and per-image reductions return
    (B, S, 1, C): the last two dims of every block equal the array dims,
    satisfying the (8, 128) tiling rule.
  * jnp.pad / ``.at[...].add`` lower to ops capturing empty i32 constants
    (pallas_call rejects them) — concat-based ``_zpad``/``_add_at``
    replace them.
  * image boundaries use iota masks over a uniform virtual-row system
    (h rows −1 and ≥hc are −inf) instead of shape-varying pads, so every
    slab has identical static shapes.

Semantics match the flax modules it replaces (models/resnet.py):
  conv: 7×7, stride 1, padding 2, bias (reference models/_utils.py:192)
  BN:   eps 1e-5; batch stats over (B, H', W'); var = E[z²]−E[z]²
        (flax's single-pass form); y = (z−μ)·rsqrt(σ²+eps)·γ + β
  pool: 3×3 stride 2 padding 1.
One intentional deviation: max-pool backward routes gradient to EVERY
position equal to the window max (XLA's SelectAndScatter picks the first).
Ties between distinct positive conv outputs are measure-zero; ties at
zero are killed by the ReLU gradient mask, so training is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_K = 7   # kernel size
_P = 2   # conv padding
_RP = 28  # pool-output rows per slab (slab h rows = 2·_RP+1)
_RS = 56  # conv rows per slab in the stats kernel
_NEG = -3.0e38  # -inf stand-in


# v5e has 128 MiB of VMEM; Mosaic's default 16 MiB scoped cap rejects
# even modest im2col slabs (measured: a 16-row patch stack "allocates"
# 21.6 MiB because unaligned slice relayouts are not stack-reused).
_VMEM_LIMIT = 110 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    """Pallas interpreter on non-TPU backends (CPU tests).

    Caveat: this keys on the HOST's default backend at trace time, not the
    lowering target — AOT-lowering for a TPU topology from a CPU-backend
    host would embed the interpreter expansion. Device-less AOT tools must
    keep ``stem_pallas=False`` (tools/compile_multichip.py does)."""
    return jax.default_backend() != "tpu"


def _pool_dims(hc: int) -> int:
    """3×3 s2 p1 output size for an hc-long axis."""
    return (hc + 2 - 3) // 2 + 1


def _dg2(a, b, contract):
    """2D×2D dot_general (the only matmul form Mosaic supports here)."""
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32)


def _zpad(v, widths, value=0.0):
    """Concatenate-based pad (static widths only)."""
    for ax, (lo, hi) in enumerate(widths):
        if lo:
            shp = list(v.shape)
            shp[ax] = lo
            v = jnp.concatenate([jnp.full(shp, value, v.dtype), v], axis=ax)
        if hi:
            shp = list(v.shape)
            shp[ax] = hi
            v = jnp.concatenate([v, jnp.full(shp, value, v.dtype)], axis=ax)
    return v


def _add_at(acc, val, offsets):
    """acc += val placed at per-axis static ``offsets``."""
    widths = [(off, acc.shape[ax] - off - val.shape[ax])
              for ax, off in enumerate(offsets)]
    return acc + _zpad(val, widths, 0.0)


def _parity_mats(n: int):
    """One-hot column-parity selectors: SE (ne, n) picks cols 2a,
    SO (no, n) picks cols 2a+1."""
    ne, no = (n + 1) // 2, n // 2
    col = jax.lax.broadcasted_iota(jnp.int32, (ne, n), 1)
    a = jax.lax.broadcasted_iota(jnp.int32, (ne, n), 0)
    se = (col == 2 * a).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (no, n), 1)
    a = jax.lax.broadcasted_iota(jnp.int32, (no, n), 0)
    so = (col == 2 * a + 1).astype(jnp.float32)
    return se, so


def _geom(h: int, w: int):
    """Static geometry shared by all kernels."""
    hc, wc = h - 2, w - 2
    hp, wp = _pool_dims(hc), _pool_dims(wc)
    we, wo = (wc + 1) // 2, wc // 2
    ne, no = (w + 4 + 1) // 2, (w + 4) // 2
    s_pool = -(-hp // _RP)
    s_stat = -(-hc // _RS)
    # scratch rows: +1 dummy top row (virtual h row −1 reads xpad row −1);
    # bottom slack so every slab's reads/scatters stay in bounds
    rs = max(2 * s_pool * _RP + _K, s_stat * _RS + _K) + 2
    rs = max(rs, h + 4 + 1)
    return hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs


def _fill_parity_scratch(x_ref, xe_ref, xo_ref, h: int, w: int, rs: int):
    """Once per image (s == 0): pad + parity-split into scratch.

    Scratch row r holds xpad row r−1 (one dummy top row so virtual h row
    −1 reads in-bounds); rows beyond h+5 are zeros."""
    xpad = _zpad(x_ref[0].astype(jnp.float32), ((_P, _P), (_P, _P)))
    se, so = _parity_mats(w + 4)
    xe = _dg2(xpad, se, ((1,), (1,)))
    xo = _dg2(xpad, so, ((1,), (1,)))
    xe_ref[:] = _zpad(xe, ((1, rs - (h + 4) - 1), (0, 0)))
    xo_ref[:] = _zpad(xo, ((1, rs - (h + 4) - 1), (0, 0)))


def _conv_parity_rows(xe_ref, xo_ref, wr, bias, yr, rows: int,
                      we: int, wo: int):
    """Even-x / odd-x conv outputs for ``rows`` virtual h rows starting at
    scratch row ``yr`` (traced).

    Even output x=2x':  input col 2x'+j → xe[x'+b] (j=2b) / xo[x'+b] (j=2b+1)
    Odd  output x=2x'+1: input col 2x'+j+1 → xo[x'+b] (j=2b) / xe[x'+b+1]
    Returns (z_e (rows·we, C), z_o (rows·wo, C), patches_e, patches_o)."""
    bias = bias.astype(jnp.float32)[None, :]
    wf = wr.astype(jnp.float32)

    def patches_for(parity):
        width = we if parity == 0 else wo
        cols = []
        for i in range(_K):
            for j in range(_K):
                b = j // 2
                if parity == 0:
                    ref, c0 = (xe_ref, b) if j % 2 == 0 else (xo_ref, b)
                else:
                    ref, c0 = (xo_ref, b) if j % 2 == 0 else (xe_ref, b + 1)
                cols.append(ref[pl.ds(yr + i, rows), c0:c0 + width])
        return jnp.stack(cols, axis=-1).reshape(rows * width, _K * _K)

    pe = patches_for(0)
    po = patches_for(1)
    ze = _dg2(pe, wf, ((1,), (0,))) + bias
    zo = _dg2(po, wf, ((1,), (0,))) + bias
    return ze, zo, pe, po


def _valid_mask(v0, rows: int, width: int, hc: int):
    """(rows, width, 1) bool: virtual h row (v0 + r) ∈ [0, hc)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, width, 1), 0) + v0
    return (r >= 0) & (r < hc)


def _wmax(he, ho, wp: int, wc: int):
    """Per-row 3-wide stride-2 column window max via the parity split:
    window q = {odd[q−1], even[q], odd[q]}."""
    rpad = 1 if wc % 2 else 0
    hop = _zpad(ho, ((0, 0), (1, rpad), (0, 0)), _NEG)
    return jnp.maximum(jnp.maximum(he[:, :wp], hop[:, :wp]),
                       hop[:, 1:1 + wp])


def _row_even(m, nloc: int):
    """Rows 0, 2, …, 2(nloc−1) of a (2·nloc−1, ·, ·) array via a
    leading-dim reshape split (no strided vector ops)."""
    nm = m.shape[0]
    m = _zpad(m, ((0, 2 * nloc - nm), (0, 0), (0, 0)))
    return m.reshape(nloc, 2, m.shape[1], m.shape[2])[:, 0]


def _row_even_up(v, nm: int):
    """Inverse of _row_even: rows of v at even rows, zeros elsewhere."""
    z = jnp.zeros_like(v)
    up = jnp.stack([v, z], axis=1).reshape(2 * v.shape[0], v.shape[1],
                                           v.shape[2])
    return up[:nm]


def _slab_h(xe_ref, xo_ref, w_ref, b_ref, a_ref, o_ref, p0, *, hc, we, wo):
    """One pool slab's conv + BN-affine + ReLU: virtual h rows
    [2p0−1, 2p0+2·_RP), invalid rows masked to −inf.

    Returns (he, ho, ze, zo, pe, po, valid_e, valid_o) — h maps are
    (rows, width, C); z/patches stay flat."""
    rows = 2 * _RP + 1
    v0 = 2 * p0 - 1
    ze, zo, pe, po = _conv_parity_rows(xe_ref, xo_ref, w_ref[:], b_ref[0],
                                       v0 + 1, rows, we, wo)
    c = ze.shape[-1]
    av, ov = a_ref[0][None, :], o_ref[0][None, :]
    ve = _valid_mask(v0, rows, we, hc)
    vo = _valid_mask(v0, rows, wo, hc)
    he = jnp.where(ve, jnp.maximum(ze * av + ov, 0.0).reshape(rows, we, c),
                   _NEG)
    ho = jnp.where(vo, jnp.maximum(zo * av + ov, 0.0).reshape(rows, wo, c),
                   _NEG)
    return he, ho, ze, zo, pe, po, ve, vo


def _slab_pool(he, ho, wp: int, wc: int):
    """(rows=2·_RP+1) masked h rows → (_RP, wp, C) pooled."""
    wm = _wmax(he, ho, wp, wc)
    nm = 2 * _RP - 1
    m = jnp.maximum(jnp.maximum(wm[0:nm], wm[1:1 + nm]), wm[2:2 + nm])
    return _row_even(m, _RP)


def _slab_pool_grad(he, ho, pooled, dy_loc, wp: int, wc: int):
    """(dh_e, dh_o) on the slab's h rows from THIS slab's windows."""
    rows = he.shape[0]
    nm = 2 * _RP - 1
    wm = _wmax(he, ho, wp, wc)
    u_dy = _row_even_up(dy_loc, nm)
    u_p = _row_even_up(pooled, nm)
    dwm = jnp.zeros(wm.shape, jnp.float32)
    for d in range(3):
        dwm = _add_at(dwm, jnp.where(wm[d:d + nm] == u_p, u_dy, 0.0),
                      (d, 0, 0))
    # column window members {odd[q−1], even[q], odd[q]}
    rpad = 1 if wc % 2 else 0
    hop = _zpad(ho, ((0, 0), (1, rpad), (0, 0)), _NEG)
    we = he.shape[1]
    dhe = _zpad(jnp.where(he[:, :wp] == wm, dwm, 0.0),
                ((0, 0), (0, we - wp), (0, 0)))
    dhop = _add_at(jnp.zeros(hop.shape, jnp.float32),
                   jnp.where(hop[:, :wp] == wm, dwm, 0.0), (0, 0, 0))
    dhop = _add_at(dhop, jnp.where(hop[:, 1:1 + wp] == wm, dwm, 0.0),
                   (0, 1, 0))
    dho = dhop[:, 1:hop.shape[1] - rpad]
    return dhe, dho


# --------------------------------------------------------------- kernels

def _stats_kernel(x_ref, w_ref, b_ref, sum_ref, sq_ref,
                  xe_ref, xo_ref, *, h, w):
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        _fill_parity_scratch(x_ref, xe_ref, xo_ref, h, w, rs)

    r0 = s * _RS
    ze, zo, _, _ = _conv_parity_rows(xe_ref, xo_ref, w_ref[:], b_ref[0],
                                     r0 + 1, _RS, we, wo)
    c = ze.shape[-1]
    me = _valid_mask(r0, _RS, we, hc).reshape(_RS * we, 1)
    mo = _valid_mask(r0, _RS, wo, hc).reshape(_RS * wo, 1)
    ze = jnp.where(me, ze, 0.0)
    zo = jnp.where(mo, zo, 0.0)
    sum_ref[0, 0, 0, :] = jnp.sum(ze, axis=0) + jnp.sum(zo, axis=0)
    sq_ref[0, 0, 0, :] = jnp.sum(ze * ze, axis=0) + jnp.sum(zo * zo, axis=0)


def _norm_pool_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, out_ref,
                      xe_ref, xo_ref, *, h, w, out_dtype):
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        _fill_parity_scratch(x_ref, xe_ref, xo_ref, h, w, rs)

    he, ho, *_ = _slab_h(xe_ref, xo_ref, w_ref, b_ref, a_ref, o_ref,
                         s * _RP, hc=hc, we=we, wo=wo)
    pooled = _slab_pool(he, ho, wp, wc)
    out_ref[0, 0] = pooled.astype(out_dtype)


def _bwd1_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, mu_ref, inv_ref, dy_ref,
                 dn_sum_ref, dnx_sum_ref, xe_ref, xo_ref, *, h, w):
    """Per-(image, slab) BN-backward partials Σdn, Σdn·x̂ (both linear in
    dh, so the window partition across slabs is exact)."""
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        _fill_parity_scratch(x_ref, xe_ref, xo_ref, h, w, rs)

    he, ho, ze, zo, _, _, ve, vo = _slab_h(
        xe_ref, xo_ref, w_ref, b_ref, a_ref, o_ref, s * _RP,
        hc=hc, we=we, wo=wo)
    c = ze.shape[-1]
    rows = 2 * _RP + 1
    pooled = _slab_pool(he, ho, wp, wc)
    dy_loc = dy_ref[0, 0].astype(jnp.float32)
    dhe, dho = _slab_pool_grad(he, ho, pooled, dy_loc, wp, wc)
    # he/ho are −inf at invalid rows ⇒ the n>0 gate also kills them
    dne = jnp.where(he.reshape(rows * we, c) > 0.0,
                    dhe.reshape(rows * we, c), 0.0)
    dno = jnp.where(ho.reshape(rows * wo, c) > 0.0,
                    dho.reshape(rows * wo, c), 0.0)
    mv, iv = mu_ref[0][None, :], inv_ref[0][None, :]
    dn_sum_ref[0, 0, 0, :] = jnp.sum(dne, axis=0) + jnp.sum(dno, axis=0)
    dnx_sum_ref[0, 0, 0, :] = (
        jnp.sum(dne * ((ze - mv) * iv), axis=0)
        + jnp.sum(dno * ((zo - mv) * iv), axis=0))


def _bwd2_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, mu_ref, inv_ref,
                 edn_ref, ednx_ref, dy_ref,
                 dw_ref, db_ref, dx_ref,
                 xe_ref, xo_ref, dxe_ref, dxo_ref, *, h, w, in_dtype):
    """Per-(image, slab) dW/dbias partials + scratch-accumulated dx.

    dz = a·dn − a·(E[dn] + x̂·E[dn·x̂]): the a·dn term is partitioned by
    window (this slab's windows), the row-local term by DISJOINT owned
    rows [2p0, 2p0+2·_RP) — each window and each row counted once."""
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        _fill_parity_scratch(x_ref, xe_ref, xo_ref, h, w, rs)
        dxe_ref[:] = jnp.zeros((rs, ne), jnp.float32)
        dxo_ref[:] = jnp.zeros((rs, no), jnp.float32)

    p0 = s * _RP
    he, ho, ze, zo, pe, po, ve, vo = _slab_h(
        xe_ref, xo_ref, w_ref, b_ref, a_ref, o_ref, p0,
        hc=hc, we=we, wo=wo)
    c = ze.shape[-1]
    rows = 2 * _RP + 1
    av = a_ref[0][None, :]
    pooled = _slab_pool(he, ho, wp, wc)
    dy_loc = dy_ref[0, 0].astype(jnp.float32)
    dhe, dho = _slab_pool_grad(he, ho, pooled, dy_loc, wp, wc)
    dze = av * jnp.where(he.reshape(rows * we, c) > 0.0,
                         dhe.reshape(rows * we, c), 0.0)
    dzo = av * jnp.where(ho.reshape(rows * wo, c) > 0.0,
                         dho.reshape(rows * wo, c), 0.0)

    # row-local term on OWNED rows: local rows [1, 1+2·_RP) ∧ valid
    mv, iv = mu_ref[0][None, :], inv_ref[0][None, :]
    ebase = av * edn_ref[0][None, :]
    ex = av * ednx_ref[0][None, :]

    def own_mask(width, vmask):
        loc = jax.lax.broadcasted_iota(jnp.int32, (rows, width, 1), 0)
        return ((loc >= 1) & (loc < 1 + 2 * _RP)
                & vmask).reshape(rows * width, 1)

    re = -(ebase + ex * ((ze - mv) * iv))
    ro = -(ebase + ex * ((zo - mv) * iv))
    dze = dze + jnp.where(own_mask(we, ve), re, 0.0)
    dzo = dzo + jnp.where(own_mask(wo, vo), ro, 0.0)

    dw_ref[0, 0] = (_dg2(pe, dze, ((0,), (0,)))
                    + _dg2(po, dzo, ((0,), (0,))))
    db_ref[0, 0, 0, :] = jnp.sum(dze, axis=0) + jnp.sum(dzo, axis=0)

    # conv-transpose into the parity scratch accumulators
    de = _dg2(dze, w_ref[:].astype(jnp.float32), ((1,), (1,))).reshape(
        rows, we, _K * _K)
    do = _dg2(dzo, w_ref[:].astype(jnp.float32), ((1,), (1,))).reshape(
        rows, wo, _K * _K)
    yr = 2 * p0  # scratch row of virtual h row v0 = 2p0−1
    for i in range(_K):
        for j in range(_K):
            k = i * _K + j
            b = j // 2
            if j % 2 == 0:
                dxe_ref[pl.ds(yr + i, rows), b:b + we] += de[:, :, k]
                dxo_ref[pl.ds(yr + i, rows), b:b + wo] += do[:, :, k]
            else:
                dxo_ref[pl.ds(yr + i, rows), b:b + we] += de[:, :, k]
                dxe_ref[pl.ds(yr + i, rows), b + 1:b + 1 + wo] += do[:, :, k]

    @pl.when(s == s_pool - 1)
    def _():
        se, so = _parity_mats(w + 4)
        full = (_dg2(dxe_ref[1:h + 5], se, ((1,), (0,)))
                + _dg2(dxo_ref[1:h + 5], so, ((1,), (0,))))
        dx_ref[0] = full[_P:_P + h, _P:_P + w].astype(in_dtype)


# ------------------------------------------------------------ entry points

def _spec_img(h, w, two_d_grid=True):
    if two_d_grid:
        return pl.BlockSpec((1, h, w), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _spec_vec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _spec_slabrow(c):
    """Per-(image, slab) per-channel reduction row: (B, S, 1, C) arrays,
    (1, 1, 1, C) blocks — last two block dims equal the array dims."""
    return pl.BlockSpec((1, 1, 1, c), lambda i, s: (i, s, 0, 0),
                        memory_space=pltpu.VMEM)


def _vec2(v):
    return v.reshape(1, -1)


def _scratch(h, w):
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    return [pltpu.VMEM((rs, ne), jnp.float32),
            pltpu.VMEM((rs, no), jnp.float32)]


def _batch_stats(x2, wr, bias):
    """(B,H,W) images → per-channel batch mean and E[z²] of the conv (f32)."""
    b, h, w = x2.shape
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    c = wr.shape[-1]
    sums, sqs = pl.pallas_call(
        functools.partial(_stats_kernel, h=h, w=w),
        grid=(b, s_stat),
        in_specs=[_spec_img(h, w), _spec_vec(), _spec_vec()],
        out_specs=(_spec_slabrow(c), _spec_slabrow(c)),
        out_shape=(jax.ShapeDtypeStruct((b, s_stat, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, s_stat, 1, c), jnp.float32)),
        scratch_shapes=_scratch(h, w),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x2, wr, _vec2(bias))
    n = b * hc * wc
    mean = jnp.sum(sums, axis=(0, 1, 2)) / n
    mean2 = jnp.sum(sqs, axis=(0, 1, 2)) / n
    return mean, mean2


def _norm_pool(x2, wr, bias, a, o, out_dtype):
    b, h, w = x2.shape
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    c = wr.shape[-1]
    out = pl.pallas_call(
        functools.partial(_norm_pool_kernel, h=h, w=w, out_dtype=out_dtype),
        grid=(b, s_pool),
        in_specs=[_spec_img(h, w)] + [_spec_vec()] * 4,
        out_specs=pl.BlockSpec((1, 1, _RP, wp, c),
                               lambda i, s: (i, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pool, _RP, wp, c), out_dtype),
        scratch_shapes=_scratch(h, w),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x2, wr, _vec2(bias), _vec2(a), _vec2(o))
    return out.reshape(b, s_pool * _RP, wp, c)[:, :hp]


def _pad_dy(dy, hp, s_pool):
    """(B, hp, wp, C) → (B, S, _RP, wp, C), zero rows past hp (tail pool
    slabs then contribute nothing — dy 0 zeroes every routed gradient)."""
    b, _, wp, c = dy.shape
    pad = s_pool * _RP - hp
    if pad:
        dy = jnp.pad(dy, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return dy.reshape(b, s_pool, _RP, wp, c)


@jax.custom_vjp
def fused_stem_train(x, kernel, bias, gamma, beta):
    """Training-mode fused stem.

    x: (B, H, W, 1); kernel: (7, 7, 1, C); bias/gamma/beta: (C,).
    Returns (pooled (B, hp, wp, C) in x.dtype, batch_mean, batch_var) —
    the caller updates BN running stats from the batch moments.
    """
    out, mu, var, _ = _train_fwd_impl(x, kernel, bias, gamma, beta)
    return out, mu, var


def _train_fwd_impl(x, kernel, bias, gamma, beta):
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    mu, mean2 = _batch_stats(x2, wr, bias)
    var = mean2 - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    a = gamma.astype(jnp.float32) * inv
    o = beta.astype(jnp.float32) - mu * a
    out = _norm_pool(x2, wr, bias, a, o, x.dtype)
    return out, mu, var, (inv, a, o)


def _train_fwd(x, kernel, bias, gamma, beta):
    out, mu, var, (inv, a, o) = _train_fwd_impl(x, kernel, bias, gamma, beta)
    return (out, mu, var), (x, kernel, bias, gamma, beta, mu, inv, a, o)


def _train_bwd(res, cts):
    # cotangents for (out, batch_mean, batch_var): the stat outputs feed
    # only the (stop-gradient) running-average update, so their cotangents
    # are zero; the in-graph dependence of the normalization on μ/σ² is
    # differentiated exactly below (standard train-BN backward).
    dy, _, _ = cts
    x, kernel, bias, gamma, beta, mu, inv, a, o = res
    b, h, w, _ = x.shape
    hc, wc, hp, wp, we, wo, ne, no, s_pool, s_stat, rs = _geom(h, w)
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    n_total = b * hc * wc
    dy5 = _pad_dy(dy, hp, s_pool)
    dy_spec = pl.BlockSpec((1, 1, _RP, wp, c),
                           lambda i, s: (i, s, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    dn_s, dnx_s = pl.pallas_call(
        functools.partial(_bwd1_kernel, h=h, w=w),
        grid=(b, s_pool),
        in_specs=[_spec_img(h, w)] + [_spec_vec()] * 6 + [dy_spec],
        out_specs=(_spec_slabrow(c), _spec_slabrow(c)),
        out_shape=(jax.ShapeDtypeStruct((b, s_pool, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, s_pool, 1, c), jnp.float32)),
        scratch_shapes=_scratch(h, w),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x2, wr, _vec2(bias), _vec2(a), _vec2(o), _vec2(mu), _vec2(inv), dy5)
    dgamma = jnp.sum(dnx_s, axis=(0, 1, 2))
    dbeta = jnp.sum(dn_s, axis=(0, 1, 2))
    edn = dbeta / n_total
    ednx = dgamma / n_total

    dw_p, db_p, dx2 = pl.pallas_call(
        functools.partial(_bwd2_kernel, h=h, w=w, in_dtype=x.dtype),
        grid=(b, s_pool),
        in_specs=[_spec_img(h, w)] + [_spec_vec()] * 8 + [dy_spec],
        out_specs=(pl.BlockSpec((1, 1, _K * _K, c),
                                lambda i, s: (i, s, 0, 0),
                                memory_space=pltpu.VMEM),
                   _spec_slabrow(c),
                   _spec_img(h, w)),
        out_shape=(jax.ShapeDtypeStruct((b, s_pool, _K * _K, c),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b, s_pool, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w), x.dtype)),
        scratch_shapes=_scratch(h, w) + [
            pltpu.VMEM((rs, ne), jnp.float32),
            pltpu.VMEM((rs, no), jnp.float32)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(x2, wr, _vec2(bias), _vec2(a), _vec2(o), _vec2(mu), _vec2(inv),
      _vec2(edn), _vec2(ednx), dy5)

    dkernel = jnp.sum(dw_p, axis=(0, 1)).reshape(
        _K, _K, 1, c).astype(kernel.dtype)
    dbias = jnp.sum(db_p, axis=(0, 1, 2)).astype(bias.dtype)
    return (dx2[..., None], dkernel, dbias,
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


fused_stem_train.defvjp(_train_fwd, _train_bwd)


def fused_stem_eval(x, kernel, bias, gamma, beta, ra_mean, ra_var):
    """Eval-mode fused stem (running statistics; no stat outputs)."""
    c = kernel.shape[-1]
    x2 = x[..., 0]
    wr = kernel.reshape(_K * _K, c).astype(x.dtype)
    inv = jax.lax.rsqrt(ra_var.astype(jnp.float32) + _EPS)
    a = gamma.astype(jnp.float32) * inv
    o = beta.astype(jnp.float32) - ra_mean.astype(jnp.float32) * a
    return _norm_pool(x2, wr, bias, a, o, x.dtype)


def reference_stem(x, kernel, bias, gamma, beta, mean, var):
    """Plain-jnp stem with EXPLICIT stats (for parity tests): conv + affine
    BN + ReLU + 3×3 s2 p1 maxpool, same math as the kernels."""
    z = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1),
        ((_P, _P), (_P, _P)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z + bias.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + _EPS)
    n = (z - mean) * inv * gamma + beta
    h = jnp.maximum(n, 0.0)
    from glfusion_tpu.ops.pooling import max_pool_3x3_s2
    return max_pool_3x3_s2(h)

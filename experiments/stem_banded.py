"""Banded-matmul Pallas fused stem: 7×7 s1 conv + train-BN + ReLU + maxpool.

Second-generation fused stem (the first, experiments/stem_pallas.py, is kept as the
measured negative result: its in-kernel im2col patch stack costs ~28 ms/pass
of lane↔sublane relayouts). Here the conv FLOPs go to the MXU with NO
in-kernel patch relayouts:

  * the parity split (even/odd output columns, required because Mosaic
    forbids stride-2 vector ops) happens OUTSIDE the kernel in XLA, where a
    strided slice is free: the kernel receives ``xeo`` (B, RB, NEO) — the
    zero-padded image with even|odd columns concatenated;
  * row-shifted copies of the slab are produced by 7 one-hot SHIFT MATMULS
    (S_i @ xeo — MXU work, no relayout) and lane-concatenated into patches
    P (hc, 7·NEOP);
  * the 7×7 conv is then ONE matmul per output parity against a banded
    weight matrix M (7·NEOP, we·C) whose bands hold the 49 kernel taps
    (built once per pallas_call from iota masks, in persistent VMEM
    scratch — rebuilt per view under ``nn.vmap`` because the build is
    predicated on the image grid index, which restarts per view);
  * the BN affine + ReLU + 3×3 s2 maxpool epilogue runs on the (hc, we·C)
    slab: column-window max via C-lane shifts of the odd slab, row-window
    max via static sublane shifts, stride-2 row selection via a one-hot
    matmul (selection is linear; −3.0e38 stands in for −inf so 0·pad is 0).

The output (B, hp, we·C) reshapes to (B, hp, wp, C) for free (row-major).
Training-mode batch statistics come from a first pass with the same
matmuls (masked sums of z and z² per channel); the normalize+pool pass
then consumes the batch affine. The backward is the XLA-differentiated
reference graph (jax.vjp over ``reference_stem`` with the saved batch
moments) — conv-backward is XLA's strength; the fwd HBM pass is the prize.

Semantics (identical contract to experiments/stem_pallas.py and the flax modules in
models/resnet.py; reference ``models/_utils.py:192``):
  conv 7×7 s1 p2 + bias; BN eps 1e-5, batch stats over (B, H', W'),
  var = E[z²]−E[z]²; maxpool 3×3 s2 p1. Max-pool backward (via XLA's
  SelectAndScatter in the recompute VJP) keeps XLA's first-match tie rule —
  unlike stem_pallas.py there is NO tie-handling deviation here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_K = 7
_P = 2
_NEG = -3.0e38

# v5e has 128 MiB VMEM; Mosaic's default 16 MiB scoped cap is too small for
# the banded weight scratch at full width (~12 MiB) plus slab temporaries.
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rup(n: int, m: int) -> int:
    return -(-n // m) * m


class _Geom:
    """Static geometry for (h, w) inputs."""

    def __init__(self, h: int, w: int):
        self.h, self.w = h, w
        self.hc, self.wc = h - 2, w - 2          # conv output
        self.hp = (self.hc - 1) // 2 + 1          # pool output
        self.wp = (self.wc - 1) // 2 + 1
        self.ne = (w + 4 + 1) // 2                # parity-split input cols
        self.no = (w + 4) // 2
        self.we = self.wp                         # even-parity conv cols
        self.wo = self.wc // 2                    # odd-parity conv cols
        self.neo = self.ne + self.no
        self.neop = _rup(self.neo, 8)             # per-i block rows in M
        self.rb = _rup(h + 4, 8)                  # padded input rows
        self.kk = _K * self.neop                  # contraction length
        self.nm3 = 2 * self.hp - 1                # row-window positions
        self.pad_bot = 2 * self.hp + 1 - 2 - self.hc  # 0 or 1


def _prep_inputs(x2: jnp.ndarray, g: _Geom, cdt) -> jnp.ndarray:
    """(B, H, W) → (B, RB, NEOP-lane-padded? no: NEO) even|odd parity
    concat of the zero-padded image (XLA side: strided slices are free)."""
    xpad = jnp.pad(x2.astype(cdt), ((0, 0), (_P, g.rb - g.h - _P),
                                    (_P, _P)))
    return jnp.concatenate([xpad[:, :, 0::2], xpad[:, :, 1::2]], axis=-1)


def _tile_vec(v: jnp.ndarray, reps: int) -> jnp.ndarray:
    """(C,) → (1, reps·C) channel-minor tiling (index = x'·C + c)."""
    return jnp.tile(v.reshape(1, -1), (1, reps))


def _build_M(w_ref, m_ref, g: _Geom, c: int, parity: int, cdt):
    """Banded weight matrix M (KK, we·C) for one output parity.

    M[i·NEOP + n, x'·C + c] sums the kernel taps w[i, j, c] whose source
    column (xe index n < ne, xo index n − ne) aligns with output column x'
    (reference tap algebra, see experiments/stem_pallas.py _conv_parity_rows):
      even x = 2x':   j=2b → xe[x'+b];   j=2b+1 → xo[x'+b]
      odd  x = 2x'+1: j=2b → xo[x'+b];   j=2b+1 → xe[x'+b+1]
    """
    wec = m_ref.shape[-1]  # we·C lanes for BOTH parities (odd tail masked)
    for i in range(_K):
        row_n = jax.lax.broadcasted_iota(jnp.int32, (g.neop, wec), 0)
        xp = jax.lax.broadcasted_iota(jnp.int32, (g.neop, wec), 1) // c
        acc = jnp.zeros((g.neop, wec), jnp.float32)
        for j in range(_K):
            b = j // 2
            wt = w_ref[i * _K + j].astype(jnp.float32)[None, :]
            if parity == 0:
                if j % 2 == 0:
                    mask = row_n == xp + b                  # xe source
                else:
                    mask = row_n == g.ne + xp + b           # xo source
            else:
                if j % 2 == 0:
                    mask = row_n == g.ne + xp + b           # xo source
                else:
                    mask = row_n == xp + b + 1              # xe source
            acc = acc + jnp.where(mask, wt, 0.0)
        m_ref[i * g.neop:(i + 1) * g.neop] = acc.astype(cdt)


def _patches(xeo_ref, g: _Geom, cdt):
    """P (hc, KK): row i-shifts via one-hot shift matmuls (no relayouts)."""
    big = xeo_ref[0]                                   # (RB, NEO)
    rr = jax.lax.broadcasted_iota(jnp.int32, (g.hc, g.rb), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (g.hc, g.rb), 1)
    parts = []
    pad = g.neop - g.neo
    for i in range(_K):
        si = (cc == rr + i).astype(cdt)
        sl = jax.lax.dot_general(si, big, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(cdt)
        if pad:
            sl = jnp.concatenate(
                [sl, jnp.zeros((g.hc, pad), cdt)], axis=1)
        parts.append(sl)
    return jnp.concatenate(parts, axis=1)              # (hc, KK)


def _conv_parities(xeo_ref, me_ref, mo_ref, bias_t_ref, g: _Geom, cdt):
    """(ze, zo): biased conv outputs (hc, we·C) / (hc, wo·C-padded)."""
    p = _patches(xeo_ref, g, cdt)
    ze = jax.lax.dot_general(p, me_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    zo = jax.lax.dot_general(p, mo_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bias = bias_t_ref[0].astype(jnp.float32)[None, :]
    return ze + bias, zo + bias


def _lane_mask(g: _Geom, c: int, width: int, wec: int):
    """(1, wec) f32 1.0 where lane's x' < width (valid output column)."""
    xp = jax.lax.broadcasted_iota(jnp.int32, (1, wec), 1) // c
    return (xp < width).astype(jnp.float32)


def _stats_kernel(xeo_ref, wt_ref, bias_t_ref, sum_ref, sq_ref,
                  me_ref, mo_ref, *, g: _Geom, c: int, cdt):
    img = pl.program_id(0)

    @pl.when(img == 0)
    def _():
        _build_M(wt_ref, me_ref, g, c, 0, cdt)
        _build_M(wt_ref, mo_ref, g, c, 1, cdt)

    ze, zo = _conv_parities(xeo_ref, me_ref, mo_ref, bias_t_ref, g, cdt)
    wec = ze.shape[-1]
    ve = _lane_mask(g, c, g.we, wec)
    vo = _lane_mask(g, c, g.wo, wec)
    ze = ze * ve
    zo = zo * vo
    sum_ref[0] = jnp.stack([jnp.sum(ze, axis=0), jnp.sum(zo, axis=0)])
    sq_ref[0] = jnp.stack([jnp.sum(ze * ze, axis=0),
                           jnp.sum(zo * zo, axis=0)])


def _normpool_kernel(xeo_ref, wt_ref, bias_t_ref, a_t_ref, o_t_ref, out_ref,
                     me_ref, mo_ref, *, g: _Geom, c: int, cdt, out_dtype):
    img = pl.program_id(0)

    @pl.when(img == 0)
    def _():
        _build_M(wt_ref, me_ref, g, c, 0, cdt)
        _build_M(wt_ref, mo_ref, g, c, 1, cdt)

    ze, zo = _conv_parities(xeo_ref, me_ref, mo_ref, bias_t_ref, g, cdt)
    wec = ze.shape[-1]
    a = a_t_ref[0].astype(jnp.float32)[None, :]
    o = o_t_ref[0].astype(jnp.float32)[None, :]
    he = jnp.maximum(ze * a + o, 0.0)
    ho = jnp.maximum(zo * a + o, 0.0)
    # invalid odd columns (x' ≥ wo) must not win the window max
    vo = _lane_mask(g, c, g.wo, wec)
    ho = jnp.where(vo > 0, ho, _NEG)
    # column windows: q = {odd[q−1], even[q], odd[q]} — odd[q−1] is a
    # C-lane right shift of the odd slab
    ho_m1 = jnp.concatenate(
        [jnp.full((g.hc, c), _NEG, jnp.float32), ho[:, :wec - c]], axis=1)
    wm = jnp.maximum(jnp.maximum(he, ho), ho_m1)       # (hc, wec)
    # row windows: wmp = [−inf; wm; −inf·pad_bot]; m3[q'] = max over 3
    nm3 = g.nm3
    wmp = jnp.concatenate(
        [jnp.full((1, wec), _NEG, jnp.float32), wm,
         jnp.full((1 + g.pad_bot, wec), _NEG, jnp.float32)], axis=0)
    m3 = jnp.maximum(jnp.maximum(wmp[0:nm3], wmp[1:1 + nm3]),
                     wmp[2:2 + nm3])
    # stride-2 row selection (pool row q = m3[2q]) via one-hot matmul
    pr = jax.lax.broadcasted_iota(jnp.int32, (g.hp, nm3), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (g.hp, nm3), 1)
    pe = (pc == 2 * pr).astype(jnp.float32)
    pooled = jax.lax.dot_general(pe, m3, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    out_ref[0] = pooled.astype(out_dtype)


def _spec_img(g: _Geom):
    return pl.BlockSpec((1, g.rb, g.neo), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _spec_vec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _scratch(g: _Geom, wec: int, cdt):
    return [pltpu.VMEM((g.kk, wec), cdt), pltpu.VMEM((g.kk, wec), cdt)]


def _batch_stats(xeo, wt, bias_t, g: _Geom, c: int, cdt):
    """Per-channel batch mean and E[z²] of the biased conv (f32)."""
    b = xeo.shape[0]
    wec = g.we * c
    sums, sqs = pl.pallas_call(
        functools.partial(_stats_kernel, g=g, c=c, cdt=cdt),
        grid=(b,),
        in_specs=[_spec_img(g), _spec_vec(), _spec_vec()],
        out_specs=(pl.BlockSpec((1, 2, wec), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2, wec), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 2, wec), jnp.float32),
                   jax.ShapeDtypeStruct((b, 2, wec), jnp.float32)),
        scratch_shapes=_scratch(g, wec, cdt),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xeo, wt, bias_t)
    n = b * g.hc * g.wc
    mean = jnp.sum(sums.reshape(b, 2, g.we, c), axis=(0, 1, 2)) / n
    mean2 = jnp.sum(sqs.reshape(b, 2, g.we, c), axis=(0, 1, 2)) / n
    return mean, mean2


def _norm_pool(xeo, wt, bias_t, a_t, o_t, g: _Geom, c: int, cdt, out_dtype):
    b = xeo.shape[0]
    wec = g.we * c
    out = pl.pallas_call(
        functools.partial(_normpool_kernel, g=g, c=c, cdt=cdt,
                          out_dtype=out_dtype),
        grid=(b,),
        in_specs=[_spec_img(g)] + [_spec_vec()] * 4,
        out_specs=pl.BlockSpec((1, g.hp, wec), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g.hp, wec), out_dtype),
        scratch_shapes=_scratch(g, wec, cdt),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xeo, wt, bias_t, a_t, o_t)
    # (B, hp, we·C) → (B, hp, wp, C) is a free row-major reshape; we == wp
    return out.reshape(b, g.hp, g.we, c)[:, :, :g.wp]


def _fwd_impl(x, kernel, bias, gamma, beta, train_stats: bool,
              ra_mean=None, ra_var=None):
    b, h, w, cin = x.shape
    assert cin == 1, "banded stem kernel supports Cin=1 (the IEKD stem)"
    c = kernel.shape[-1]
    g = _Geom(h, w)
    cdt = x.dtype
    x2 = x[..., 0]
    xeo = _prep_inputs(x2, g, cdt)
    wt = jnp.tile(kernel.reshape(_K * _K, c).astype(cdt), (1, g.we))
    bias_t = _tile_vec(bias.astype(jnp.float32), g.we)
    if train_stats:
        mu, mean2 = _batch_stats(xeo, wt, bias_t, g, c, cdt)
        var = mean2 - mu * mu
    else:
        mu, var = ra_mean.astype(jnp.float32), ra_var.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + _EPS)
    a = gamma.astype(jnp.float32) * inv
    o = beta.astype(jnp.float32) - mu * a
    out = _norm_pool(xeo, wt, bias_t, _tile_vec(a, g.we),
                     _tile_vec(o, g.we), g, c, cdt, x.dtype)
    return out, mu, var


@jax.custom_vjp
def fused_stem_train(x, kernel, bias, gamma, beta):
    """Training-mode fused stem (same contract as stem_pallas.py):
    x (B, H, W, 1) → (pooled (B, hp, wp, C) in x.dtype, batch_mean,
    batch_var). The caller maintains BN running averages."""
    return _fwd_impl(x, kernel, bias, gamma, beta, True)


def _train_fwd(x, kernel, bias, gamma, beta):
    out, mu, var = _fwd_impl(x, kernel, bias, gamma, beta, True)
    return (out, mu, var), (x, kernel, bias, gamma, beta)


def _train_bwd(res, cts):
    """XLA-differentiated recompute of the exact train-mode graph.

    The full train-BN backward (including the in-graph dependence of μ/σ²
    on the conv output) is obtained by differentiating the reference graph
    with the statistics RECOMPUTED inside — conv backward is XLA's
    strength (BASELINE.md r2: hand backwards lose); only the forward HBM
    behavior needed the hand kernel. The (mu, var) outputs feed only the
    stop-gradient running-average update, so their cotangents are dropped
    (identical contract to stem_pallas.py)."""
    dy, _, _ = cts
    x, kernel, bias, gamma, beta = res

    def f(x, kernel, bias, gamma, beta):
        z = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), ((_P, _P), (_P, _P)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).astype(jnp.float32) + bias.astype(jnp.float32)
        mu = jnp.mean(z, axis=(0, 1, 2))
        var = jnp.mean(z * z, axis=(0, 1, 2)) - mu * mu
        inv = jax.lax.rsqrt(var + _EPS)
        n = (z - mu) * inv * gamma.astype(jnp.float32) + beta.astype(
            jnp.float32)
        hmap = jnp.maximum(n, 0.0).astype(x.dtype)
        from glfusion_tpu.ops.pooling import max_pool_3x3_s2
        return max_pool_3x3_s2(hmap)

    _, vjp = jax.vjp(f, x, kernel, bias, gamma, beta)
    return vjp(dy.astype(x.dtype))


fused_stem_train.defvjp(_train_fwd, _train_bwd)


def fused_stem_eval(x, kernel, bias, gamma, beta, ra_mean, ra_var):
    """Eval-mode fused stem (running statistics; single pass)."""
    out, _, _ = _fwd_impl(x, kernel, bias, gamma, beta, False,
                          ra_mean=ra_mean, ra_var=ra_var)
    return out

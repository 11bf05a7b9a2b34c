#!/usr/bin/env python
"""Per-stage utilization profile of the flagship backbone/heads on TPU.

Times each backbone stage, the ASPP head, and the TPAVI fusion at the
cycle-forward shape (V=3 views x T=40 frames — the 76%-of-step path,
BASELINE.md "Step decomposition"), fwd and fwd+bwd, in bf16, in
TRAIN mode (batch-stat BN + dropout — the graph the step optimizes;
an earlier revision timed eval-mode BN, which under-counts). Reports
XLA-cost-analysis FLOPs and the implied fraction of v5e bf16 peak per
stage, so optimization effort goes where the cycles are.

Also answers a lowering question specific to this model: per-view stacked
parameters ride an ``nn.vmap``, so every conv compiles as a
``batch_group_count=V`` grouped conv. The ``conv3x3 lowering`` section
compares (a) that vmapped form, (b) a Python-unrolled per-view loop, and
(c) views folded into the batch with shared weights (the dense upper
bound) at the layer3/layer4 dilated-conv shapes.
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _table_row(label, t_s, flops):
    ms = t_s * 1e3
    if flops:
        tf = flops / t_s / 1e12
        pct = 100.0 * tf / V5E_BF16_PEAK_TFLOPS
        return {"label": label, "ms": round(ms, 3),
                "gflop": round(flops / 1e9, 1),
                "tflops": round(tf, 1), "pct_peak": round(pct, 1)}
    return {"label": label, "ms": round(ms, 3)}


def main() -> int:
    from glfusion_tpu.models.glfusion import _per_view
    from glfusion_tpu.models.resnet import ResNetStage
    from glfusion_tpu.models.aspp import DeepLabHead
    from glfusion_tpu.models.tpavi import TPAVI
    from glfusion_tpu.utils.profiling import flops_of, time_fn

    V, T = 3, 40
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    rows = []

    def bench_module(label, module, x, iters=8):
        """Times the TRAIN-mode graph (batch-stat BN, dropout, the
        three-matmul TPAVI path) — the 76%-of-step cycle forward this
        tool exists to attribute. The batch_stats updates are part of
        time_fn's consumed outputs, so stat maintenance is included."""
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(
            lambda k: module.init(
                {"params": k, "dropout": jax.random.fold_in(k, 1)},
                x, True))(rng)
        params = variables["params"]
        bstats = variables.get("batch_stats", {})

        def fwd(p, bs, a):
            return module.apply(
                {"params": p, "batch_stats": bs}, a, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})

        t = time_fn(fwd, params, bstats, x, iters=iters)
        fl = flops_of(fwd, params, bstats, x)
        rows.append(_table_row(f"{label} fwd", t, fl))

        def loss(p, bs, a):
            out, upd = fwd(p, bs, a)
            tot = jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32) ** 2)
            for leaf in jax.tree_util.tree_leaves(upd):
                tot += jnp.mean(leaf).astype(jnp.float32)
            return tot

        gf = jax.grad(loss, argnums=(0, 2))
        t2 = time_fn(gf, params, bstats, x, iters=iters)
        fl2 = flops_of(gf, params, bstats, x)
        rows.append(_table_row(f"{label} fwd+bwd", t2, fl2))

    # ---- backbone stages at the cycle shapes (V, T, ., ., C) ----
    # stage plan for the IEKD dilated ResNet-50: layer1 55^2, layer2
    # strides to 28^2, layer3 d=2, layer4 d=4 (models/resnet.py stage_plan)
    stage_specs = [
        ("layer1", dict(planes=64, blocks=3, stride=1), (55, 64)),
        ("layer2", dict(planes=128, blocks=4, stride=2), (55, 256)),
        ("layer3", dict(planes=256, blocks=6, stride=1,
                        first_dilation=1, dilation=2), (28, 512)),
        ("layer4", dict(planes=512, blocks=3, stride=1,
                        first_dilation=2, dilation=4), (28, 1024)),
    ]
    for name, kw, (hw, cin) in stage_specs:
        mod = _per_view(ResNetStage)(dtype="bfloat16", name=name, **kw)
        x = jnp.asarray(rs.rand(V, T, hw, hw, cin), dt)
        bench_module(name, mod, x)

    # stem: conv7x7 s1 p2 + BN + relu + maxpool on (V,T,112,112,1)
    from glfusion_tpu.models.resnet import IEKDStem
    stem = _per_view(IEKDStem)(dtype="bfloat16", name="stem")
    bench_module("stem", stem, jnp.asarray(rs.rand(V, T, 112, 112, 1), dt))

    # ASPP classifier head on f4
    head = _per_view(DeepLabHead)(num_outputs=5, channels=256,
                                  rates=(12, 24, 36), dropout=0.5,
                                  dtype="bfloat16", name="head")
    bench_module("aspp_head", head, jnp.asarray(
        rs.rand(V, T, 28, 28, 2048), dt))

    # TPAVI fusion module (B=T frames, tokens = V*28*28)
    tp = TPAVI(inter_channels=1024, dtype="bfloat16", name="tpavi")
    bench_module("tpavi", tp, jnp.asarray(rs.rand(T, V, 28, 28, 2048), dt))

    # ---- conv3x3 lowering comparison at dilated shapes ----
    conv_rows = []
    for tag, (cin, d) in {"l3_d2_c256": (256, 2),
                          "l4_d4_c512": (512, 4)}.items():
        x = jnp.asarray(rs.rand(V, T, 28, 28, cin), dt)
        w = jnp.asarray(rs.randn(V, 3, 3, cin, cin) * 0.02, dt)

        def conv1(a, k, d=d):
            return jax.lax.conv_general_dilated(
                a, k, window_strides=(1, 1), padding=((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        vmapped = jax.vmap(conv1, in_axes=(0, 0))
        unrolled = lambda a, k: jnp.stack(
            [conv1(a[i], k[i]) for i in range(V)])

        def folded(a, k):  # shared weights — dense-util upper bound only
            vb = a.reshape(V * T, 28, 28, a.shape[-1])
            return conv1(vb, k[0]).reshape(a.shape[:2] + (28, 28, -1))

        flops = 2 * V * T * 28 * 28 * cin * cin * 9
        for label, fn in [("vmap_grouped", vmapped),
                          ("unrolled", unrolled), ("folded_shared", folded)]:
            t = time_fn(fn, x, w, iters=20)
            conv_rows.append(_table_row(f"{tag} {label}", t, flops))

    print("STAGES")
    for r in rows:
        print("  " + json.dumps(r))
    print("CONV3X3")
    for r in conv_rows:
        print("  " + json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

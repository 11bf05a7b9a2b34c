"""FULL-SIZE (2048-ch) torch→JAX checkpoint parity rehearsal.

The project's north star is Dice parity with released reference
checkpoints; the tiny-width test proves the converter mechanics every CI
run, and THIS test proves them at the real topology: ResNet-50-IEKD
(widths 64..512 ×4 expansion → 2048-ch f4), ASPP rates 12/24/36 @ 256
channels, TPAVI inter 1024, 112² input, batch 2, both attentions.

Heavy (two full-size CPU forwards + a minutes-long jit): gated behind
``GLFUSION_FULL_SIZE=1``. Measured results are recorded in BASELINE.md.

Matches reference ``models/ours.py:1708-1843`` and the eval protocol of
``main.py:459-543``.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glfusion_tpu.config import ModelConfig  # noqa: E402
from glfusion_tpu.models import GlobalAndLocal  # noqa: E402
from glfusion_tpu.utils.torch_convert import convert_state_dict  # noqa: E402
from glfusion_tpu.utils.torch_twin import TGlobalAndLocal  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.environ.get("GLFUSION_FULL_SIZE"),
    reason="full-size rehearsal: set GLFUSION_FULL_SIZE=1 (slow)")

# the REAL topology — every field at its reference default
FULL_CFG = ModelConfig(aspp_dropout=0.0)  # dropout is inert in eval mode


def test_full_size_forward_parity():
    torch.manual_seed(0)
    tmodel = TGlobalAndLocal(FULL_CFG).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(0)
    hw = 112
    v = len(FULL_CFG.views)
    x_np = rs.rand(v, 2, hw, hw, 1).astype(np.float32)

    with torch.no_grad():
        tx = {view: torch.from_numpy(
            np.transpose(x_np[i], (0, 3, 1, 2))).contiguous()
            for i, view in enumerate(FULL_CFG.views)}
        tmask, tbb = tmodel(tx)
    tref = np.stack([np.transpose(tmask[view].numpy(), (0, 2, 3, 1))
                     for view in FULL_CFG.views])

    converted = convert_state_dict(tmodel.state_dict(), FULL_CFG)
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}

    jmodel = GlobalAndLocal(FULL_CFG)
    out = jax.jit(lambda vs, x: jmodel.apply(vs, x, False))(
        variables, jnp.asarray(x_np))
    jref = np.asarray(out["mask"])

    adiff = np.abs(jref - tref)
    denom = np.maximum(np.abs(tref), 1e-3)
    report = {
        "f32_max_abs_diff": float(adiff.max()),
        "f32_mean_abs_diff": float(adiff.mean()),
        "f32_max_rel_diff": float((adiff / denom).max()),
        "logit_scale": float(np.abs(tref).mean()),
    }
    # thresholded predictions (the Dice-determining quantity) must agree
    agree = float(np.mean((jref > 0) == (tref > 0)))
    report["f32_pred_agreement"] = agree

    # bf16 compute path: quantify the delta against the torch reference
    bf16_model = GlobalAndLocal(
        ModelConfig(**{**FULL_CFG.__dict__, "dtype": "bfloat16"}))
    out16 = jax.jit(lambda vs, x: bf16_model.apply(vs, x, False))(
        variables, jnp.asarray(x_np))
    j16 = np.asarray(out16["mask"], np.float32)
    report["bf16_max_abs_diff"] = float(np.abs(j16 - tref).max())
    report["bf16_mean_abs_diff"] = float(np.abs(j16 - tref).mean())
    report["bf16_pred_agreement"] = float(np.mean((j16 > 0) == (tref > 0)))

    print("FULL_SIZE_PARITY " + json.dumps(report), flush=True)
    np.testing.assert_allclose(jref, tref, atol=1e-3, rtol=1e-3)
    assert agree == 1.0
    # random-init logits cluster near zero (|logit| ~ 0.05), the worst case
    # for threshold agreement under bf16 rounding; measured 0.9983 there.
    # Trained logits are orders of magnitude larger.
    assert report["bf16_pred_agreement"] > 0.995

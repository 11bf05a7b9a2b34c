"""FULL-MODEL numerical parity: torch Global_and_Local → converter → ours.

The torch twin lives in ``glfusion_tpu/utils/torch_twin.py`` (the
reference's exact state-dict name space); this test runs it at miniature
widths (full topology) so every CI run proves the converter chain.
The full-size (2048-ch) rehearsal is tests/test_full_size_parity.py.
"""

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

VIEWS = ("1", "3", "4")
CFG = ModelConfig(
    views=VIEWS,
    stem_width=8,
    block_sizes=(1, 1, 1, 1),
    widths=(4, 8, 12, 16),
    expansion=4,
    aspp_rates=(2, 4, 6),
    aspp_channels=8,
    aspp_dropout=0.0,
    tpavi_inter_channels=8,
)


def test_full_model_forward_parity():
    torch.manual_seed(0)
    tmodel = TGlobalAndLocal(CFG).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(0)
    hw = 32
    x_np = rs.rand(len(VIEWS), 2, hw, hw, 1).astype(np.float32)

    with torch.no_grad():
        tx = {v: torch.from_numpy(
            np.transpose(x_np[i], (0, 3, 1, 2))).contiguous()
            for i, v in enumerate(VIEWS)}
        tmask, tbb = tmodel(tx)

    converted = convert_state_dict(tmodel.state_dict(), CFG)
    jmodel = GlobalAndLocal(CFG)
    out = jmodel.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        jnp.asarray(x_np), False)

    for i, v in enumerate(VIEWS):
        ref_mask = np.transpose(tmask[v].numpy(), (0, 2, 3, 1))
        ref_bb = np.transpose(tbb[v].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(out["mask"][i]), ref_mask, atol=2e-4, rtol=2e-4,
            err_msg=f"mask view {v}")
        np.testing.assert_allclose(
            np.asarray(out["mask_bb"][i]), ref_bb, atol=2e-4, rtol=2e-4,
            err_msg=f"mask_bb view {v}")

"""Eval-PROTOCOL parity: the reference's metric math, end to end, vs ours.

Forward parity (tests/test_full_model_torch_parity.py) proves the converter
chain produces identical logits; this test proves the EVALUATION protocol
on top of those logits matches the reference (``main.py:495-543,800-815``):
frames-as-batch clip forward → sigmoid > 0.5 threshold → confusion counts
accumulated over every frame of every clip → pixel-acc / Dice / precision /
specificity / recall with eps=1e-5 → per-structure Dice per class channel.

The torch side below re-implements that contract directly from the
reference's formulas on the torch twin's outputs; the JAX side runs the
library's make_eval_step count accumulation + overlap_metrics/per_part_dice
on the converted model. All metrics must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glfusion_tpu.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from glfusion_tpu.models import GlobalAndLocal  # noqa: E402
from glfusion_tpu.train.metrics import overlap_metrics, per_part_dice  # noqa: E402
from glfusion_tpu.train.step import make_eval_step  # noqa: E402
from glfusion_tpu.train.train_state import TrainState, make_optimizer  # noqa: E402
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
HW, T, NCLIPS = 32, 3, 2


def _reference_eval_torch(tmodel, clips, masks):
    """The reference eval contract (main.py:495-543, 800-815), in torch:
    per clip, frames-as-batch forward; accumulate thresholded predictions
    over ALL clips; one overlap computation at the end; per-part Dice per
    class channel. eps = 1e-5."""
    preds, gts = [], []
    with torch.no_grad():
        for c in range(NCLIPS):
            tx = {v: torch.from_numpy(
                np.transpose(clips[c, i], (0, 3, 1, 2))).contiguous()
                for i, v in enumerate(VIEWS)}
            tmask, _ = tmodel(tx)  # dict view → (T, 5, H, W) logits
            for i, v in enumerate(VIEWS):
                preds.append((torch.sigmoid(tmask[v]) > 0.5).float())
                gts.append(torch.from_numpy(
                    np.transpose(masks[c, i], (0, 3, 1, 2))).contiguous())
    pred = torch.cat(preds)
    gt = torch.cat(gts)
    eps = 1e-5
    output = pred.reshape(-1)
    target = gt.reshape(-1).float()
    tp = torch.sum(output * target)
    fp = torch.sum(output * (1 - target))
    fn = torch.sum((1 - output) * target)
    tn = torch.sum((1 - output) * (1 - target))
    overall = {
        "pixel_acc": (tp + tn) / (tp + tn + fp + fn + eps),
        "dice": (2 * tp) / (2 * tp + fp + fn + eps),
        "precision": tp / (tp + fp + eps),
        "specificity": tn / (tn + fp + eps),
        "recall": tp / (tp + fn + eps),
    }
    parts = []
    for ch in range(pred.shape[1]):  # per-structure (main.py:537-543)
        o = pred[:, ch].reshape(-1)
        t = gt[:, ch].reshape(-1).float()
        tp_c = torch.sum(o * t)
        fp_c = torch.sum(o * (1 - t))
        fn_c = torch.sum((1 - o) * t)
        parts.append(float((2 * tp_c) / (2 * tp_c + fp_c + fn_c + eps)))
    return {k: float(v) for k, v in overall.items()}, parts


def test_eval_protocol_matches_reference_math():
    torch.manual_seed(0)
    tmodel = TGlobalAndLocal(CFG).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(1)
    clips = rs.rand(NCLIPS, len(VIEWS), T, HW, HW, 1).astype(np.float32)
    masks = (rs.rand(NCLIPS, len(VIEWS), T, HW, HW, 5) > 0.7
             ).astype(np.float32)

    t_overall, t_parts = _reference_eval_torch(tmodel, clips, masks)

    # ---- ours: converted params through the library eval step ----
    converted = convert_state_dict(tmodel.state_dict(), CFG)
    model = GlobalAndLocal(CFG)
    cfg = Config(model=CFG, data=DataConfig(crop_hw=HW, clip_length=T),
                 train=TrainConfig(batch_size=1))
    state = TrainState.create(
        apply_fn=model.apply, params=converted["params"],
        batch_stats=converted["batch_stats"],
        tx=make_optimizer(cfg, 10))
    eval_step = make_eval_step(cfg, model)

    agg = None
    part_agg = None
    for c in range(NCLIPS):
        out = jax.device_get(eval_step(state, {
            "images": jnp.asarray(clips[c]),
            "masks": jnp.asarray(masks[c]),
        }))
        # counts are per-view; the reference accumulates over views too
        counts = {k: np.sum(v) for k, v in out["counts"].items()}
        pcounts = {k: np.sum(v, axis=0) for k, v in out["part_counts"].items()}
        if agg is None:
            agg, part_agg = counts, pcounts
        else:
            agg = {k: agg[k] + counts[k] for k in agg}
            part_agg = {k: part_agg[k] + pcounts[k] for k in part_agg}

    j_overall = {k: float(v) for k, v in overlap_metrics(
        {k: jnp.asarray(v) for k, v in agg.items()}).items()}
    eps = 1e-5
    j_parts = [
        float((2 * part_agg["tp"][ch])
              / (2 * part_agg["tp"][ch] + part_agg["fp"][ch]
                 + part_agg["fn"][ch] + eps))
        for ch in range(5)
    ]

    for k in t_overall:
        np.testing.assert_allclose(j_overall[k], t_overall[k], rtol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(j_parts, t_parts, rtol=1e-5)

    # sanity: the comparison is non-trivial (mixed predictions)
    assert 0.0 < j_overall["dice"] < 1.0


def test_per_part_dice_matches_reference_formula():
    """Library per_part_dice == the reference per-channel loop on raw
    logits (no model involved)."""
    rs = np.random.RandomState(2)
    logits = (rs.randn(7, 16, 16, 5) * 2).astype(np.float32)
    target = (rs.rand(7, 16, 16, 5) > 0.6).astype(np.float32)
    ours = np.asarray(per_part_dice(jnp.asarray(logits), jnp.asarray(target)))
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
    pred = (torch.sigmoid(tl) > 0.5).float()
    eps = 1e-5
    for ch in range(5):
        o = pred[:, ch].reshape(-1)
        t = tt[:, ch].reshape(-1)
        tp = torch.sum(o * t)
        fp = torch.sum(o * (1 - t))
        fn = torch.sum((1 - o) * t)
        ref = float((2 * tp) / (2 * tp + fp + fn + eps))
        np.testing.assert_allclose(ours[ch], ref, rtol=1e-5)

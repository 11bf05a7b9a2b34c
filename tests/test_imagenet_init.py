"""torchvision ImageNet backbone initialization (utils/imagenet_init).

The reference recipe starts from an ImageNet-pretrained resnet50 backbone
(``pretrained_backbone=True`` default, reference models/segmentation.py
:197-207) with only ``conv1`` replaced (models/_utils.py:192). These tests
synthesize a torchvision-named state dict at the tiny topology and pin the
mapping: layers/bn1 overlaid per view, stem conv and heads untouched.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.models import GlobalAndLocal
from glfusion_tpu.utils.imagenet_init import (convert_torchvision_resnet,
                                              merge_backbone)


def _synth_torchvision_sd(variables, cfg, rs):
    """Build a torchvision-resnet50-style state dict whose shapes match
    ``cfg``'s backbone (derived from the initialized variable tree)."""
    bp = variables["params"]["backbone"]
    sd = {}

    def add_bn(tkey, leaf):
        c = np.asarray(leaf["scale"]).shape[-1]
        sd[f"{tkey}.weight"] = (rs.rand(c) * 0.5 + 0.75).astype(np.float32)
        sd[f"{tkey}.bias"] = (rs.rand(c) - 0.5).astype(np.float32)
        sd[f"{tkey}.running_mean"] = (rs.rand(c) - 0.5).astype(np.float32)
        sd[f"{tkey}.running_var"] = (rs.rand(c) + 0.5).astype(np.float32)
        sd[f"{tkey}.num_batches_tracked"] = np.asarray(7)  # must be ignored

    def add_conv(tkey, leaf):
        # fan-in-scaled like real trained weights: uniform-positive values
        # explode multiplicatively through 16 blocks and overflow to NaN
        kh, kw, i, o = np.asarray(leaf["kernel"]).shape[1:]  # strip view axis
        w = rs.randn(o, i, kh, kw) / np.sqrt(kh * kw * i)
        sd[f"{tkey}.weight"] = w.astype(np.float32)

    sd["conv1.weight"] = rs.rand(8, 3, 7, 7).astype(np.float32)  # replaced
    sd["fc.weight"] = rs.rand(10, 8).astype(np.float32)          # no head
    sd["fc.bias"] = rs.rand(10).astype(np.float32)
    add_bn("bn1", bp["stem_bn"])
    for s, blocks in enumerate(cfg.model.block_sizes, start=1):
        for b in range(blocks):
            mod = bp[f"layer{s}_block{b}"]
            for j in (1, 2, 3):
                add_conv(f"layer{s}.{b}.conv{j}", mod[f"conv{j}"])
                add_bn(f"layer{s}.{b}.bn{j}", mod[f"bn{j}"])
            if "downsample_conv" in mod:
                add_conv(f"layer{s}.{b}.downsample.0",
                         mod["downsample_conv"])
                add_bn(f"layer{s}.{b}.downsample.1", mod["downsample_bn"])
    return sd


@pytest.fixture(scope="module")
def tiny_vars():
    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    x = jnp.zeros((v, 1, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    return cfg, jax.device_get(variables)


def test_convert_and_merge(tiny_vars):
    cfg, variables = tiny_vars
    v = cfg.model.num_views
    rs = np.random.RandomState(0)
    sd = _synth_torchvision_sd(variables, cfg, rs)

    conv = convert_torchvision_resnet(sd, cfg.model)
    mp = merge_backbone(variables["params"], conv["params"])
    ms = merge_backbone(variables["batch_stats"], conv["batch_stats"])

    # every residual-stage conv is the transposed torch tensor, identical
    # across the stacked view axis (deep-copied template, ours.py:1724-1734)
    w = sd["layer1.0.conv1.weight"]
    got = np.asarray(mp["backbone"]["layer1_block0"]["conv1"]["kernel"])
    assert got.shape[0] == v
    for vi in range(v):
        np.testing.assert_array_equal(got[vi],
                                      np.transpose(w, (2, 3, 1, 0)))
    # bn1 lands in stem_bn (params + running stats)
    np.testing.assert_array_equal(
        np.asarray(mp["backbone"]["stem_bn"]["scale"])[1], sd["bn1.weight"])
    np.testing.assert_array_equal(
        np.asarray(ms["backbone"]["stem_bn"]["var"])[0],
        sd["bn1.running_var"])
    # the replaced stem conv keeps its initialization (reference
    # _utils.py:192), and non-backbone trees are untouched
    np.testing.assert_array_equal(
        np.asarray(mp["backbone"]["stem_conv"]["kernel"]),
        np.asarray(variables["params"]["backbone"]["stem_conv"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(mp["classifier"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            variables["params"]["classifier"])[0]))
    # a forward pass with the merged weights runs finite
    model = GlobalAndLocal(cfg.model)
    hw = cfg.data.crop_hw
    out = model.apply({"params": mp, "batch_stats": ms},
                      jnp.ones((cfg.model.num_views, 1, hw, hw, 1)), False)
    assert np.isfinite(np.asarray(out["mask"])).all()


def test_shape_mismatch_and_unknown_param_rejected(tiny_vars):
    cfg, variables = tiny_vars
    rs = np.random.RandomState(1)
    sd = _synth_torchvision_sd(variables, cfg, rs)

    bad = dict(sd)
    bad["layer1.0.conv1.weight"] = rs.rand(3, 3, 1, 1).astype(np.float32)
    conv = convert_torchvision_resnet(bad, cfg.model)
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_backbone(variables["params"], conv["params"])

    conv2 = convert_torchvision_resnet(sd, cfg.model)
    conv2["params"]["backbone"]["layer9_block0"] = {
        "conv1": {"kernel": np.zeros((1, 1, 1, 1, 1), np.float32)}}
    with pytest.raises(ValueError, match="model lacks"):
        merge_backbone(variables["params"], conv2["params"])


def test_trainer_loads_imagenet_backbone(tmp_path):
    torch = pytest.importorskip("torch")
    from glfusion_tpu.train.trainer import Trainer

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, save_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "log")))
    tr = Trainer(cfg, verbose=False)
    variables = jax.device_get({"params": tr.state.params,
                                "batch_stats": tr.state.batch_stats})
    rs = np.random.RandomState(2)
    sd = _synth_torchvision_sd(variables, cfg, rs)
    path = tmp_path / "resnet50-imagenet.pth"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)

    tr.load_imagenet_backbone(str(path))
    got = np.asarray(jax.device_get(
        tr.state.params["backbone"]["layer1_block0"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        got[0], np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)))
    got_var = np.asarray(jax.device_get(
        tr.state.batch_stats["backbone"]["stem_bn"]["var"]))
    np.testing.assert_array_equal(got_var[0], sd["bn1.running_var"])

    # non-flagship archs are rejected (the mapping targets the flagship's
    # stacked-view backbone tree)
    tr.cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, arch="unet"))
    with pytest.raises(ValueError, match="glfusion arch"):
        tr.load_imagenet_backbone(str(path))

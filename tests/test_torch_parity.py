"""Numerical parity against PyTorch — the building blocks of Dice parity.

The reference's checkpoints can only reproduce their Dice if our ops match
torch's semantics exactly (SURVEY.md §7.3). torchvision/monai are absent,
but torch-cpu ships in the image, so each op is checked directly against
its torch counterpart on random inputs (weights transplanted through the
same transforms as utils/torch_convert.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_resize_nearest_matches_torch():
    from glfusion_tpu.ops.resize import resize_nearest

    x = np.random.RandomState(0).rand(2, 200, 144, 3).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (144, 144)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(xt, size=(144, 144),
                                          mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_resize_bilinear_matches_torch_align_false():
    from glfusion_tpu.ops.resize import resize_bilinear

    x = np.random.RandomState(1).rand(2, 28, 28, 5).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (112, 112)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        xt, size=(112, 112), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


def test_resize_bilinear_matches_torch_align_true():
    from glfusion_tpu.ops.resize import resize_bilinear_ac

    x = np.random.RandomState(2).rand(2, 13, 17, 4).astype(np.float32)
    ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), (21, 11)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        xt, size=(21, 11), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


def test_maxpool_3x3_s2_matches_torch():
    from glfusion_tpu.ops.pooling import max_pool_3x3_s2

    x = np.random.RandomState(3).randn(2, 110, 110, 4).astype(np.float32)
    ours = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_bce_with_logits_sum_matches_torch():
    from glfusion_tpu.train.losses import bce_with_logits_sum

    rs = np.random.RandomState(4)
    logits = rs.randn(2, 112, 112, 5).astype(np.float32) * 3
    target = (rs.rand(2, 112, 112, 5) > 0.5).astype(np.float32)
    ours = float(bce_with_logits_sum(jnp.asarray(logits),
                                     jnp.asarray(target)))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target),
        reduction="sum").item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_conv_bn_stack_matches_torch():
    """IEKD stem (7×7 s1 p2 biased conv + eval BN) vs torch, transplanted
    weights via the converter's transforms."""
    from glfusion_tpu.models.resnet import ResNetIEKD

    rs = np.random.RandomState(5)
    x = rs.rand(2, 30, 30, 1).astype(np.float32)

    net = ResNetIEKD(stem_width=8, block_sizes=(1,), widths=(4,),
                     dilate_stages=(False,), return_taps=True)
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    taps = net.apply(v, jnp.asarray(x), False)
    ours = np.asarray(taps["stem"])  # pre-maxpool stem activation

    conv = torch.nn.Conv2d(1, 8, 7, stride=1, padding=2, bias=True)
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(v["params"]["stem_conv"]["kernel"]), (3, 2, 0, 1))))
        conv.bias.copy_(torch.from_numpy(
            np.asarray(v["params"]["stem_conv"]["bias"])))
        bn.weight.copy_(torch.from_numpy(
            np.asarray(v["params"]["stem_bn"]["scale"])))
        bn.bias.copy_(torch.from_numpy(
            np.asarray(v["params"]["stem_bn"]["bias"])))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(v["batch_stats"]["stem_bn"]["mean"])))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(v["batch_stats"]["stem_bn"]["var"])))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.relu(bn(conv(xt))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_dilated_conv_matches_torch():
    """ASPP dilated branch (decomposed path) vs torch Conv2d(dilation=r)."""
    from glfusion_tpu.models.aspp import DilatedConv3x3

    rs = np.random.RandomState(6)
    x = rs.rand(2, 28, 28, 6).astype(np.float32)
    for rate in (12, 24, 36):
        m = DilatedConv3x3(features=4, rate=rate)
        v = m.init(jax.random.PRNGKey(rate), jnp.asarray(x))
        ours = np.asarray(m.apply(v, jnp.asarray(x)))
        conv = torch.nn.Conv2d(6, 4, 3, padding=rate, dilation=rate,
                               bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(v["params"]["kernel"]), (3, 2, 0, 1))))
            xt = torch.from_numpy(x).permute(0, 3, 1, 2)
            ref = conv(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4,
                                   err_msg=f"rate {rate}")


def test_layernorm_matches_torch():
    """TPAVI's channel LayerNorm (torch nn.LayerNorm(C)) semantics."""
    import flax.linen as fnn

    rs = np.random.RandomState(7)
    x = rs.randn(2, 10, 16).astype(np.float32)
    ln = fnn.LayerNorm(epsilon=1e-5)
    v = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(v, jnp.asarray(x)))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

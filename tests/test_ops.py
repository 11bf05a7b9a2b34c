"""Op-level parity tests: resize/crop/pool/mask semantics vs torch/reference rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from glfusion_tpu.ops import (
    center_crop,
    mask_to_allclass,
    max_pool_3x3_s2,
    random_crop,
    resize_bilinear,
    resize_nearest,
    view_label_table,
)


def test_resize_nearest_matches_torch():
    x = np.random.RandomState(0).rand(2, 37, 53, 3).astype(np.float32)
    out = resize_nearest(jnp.asarray(x), (144, 144))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(144, 144),
                        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_resize_nearest_downscale_matches_torch():
    x = np.random.RandomState(1).rand(1, 200, 160, 1).astype(np.float32)
    out = resize_nearest(jnp.asarray(x), (144, 144))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(144, 144),
                        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_resize_bilinear_matches_torch_align_corners_false():
    x = np.random.RandomState(2).rand(2, 28, 28, 5).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (112, 112))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(112, 112),
                        mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_max_pool_matches_torch():
    x = np.random.RandomState(3).randn(2, 110, 110, 7).astype(np.float32)
    out = max_pool_3x3_s2(jnp.asarray(x))
    ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert out.shape == ref.shape  # 110 -> 55
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_center_crop_matches_monai_rule():
    x = jnp.arange(144 * 144, dtype=jnp.float32).reshape(1, 144, 144, 1)
    out = center_crop(x, (112, 112))
    # MONAI/np center: start = 144//2 - 112//2 = 16
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x)[:, 16:128, 16:128, :])


def test_random_crop_in_bounds(rng):
    x = jnp.arange(20 * 18, dtype=jnp.float32).reshape(20, 18, 1)
    for i in range(5):
        out = random_crop(jax.random.PRNGKey(i), x, (7, 5))
        assert out.shape == (7, 5, 1)
        # every crop is a contiguous window of the source
        v = np.asarray(out)[:, :, 0]
        top_left = v[0, 0]
        row, col = divmod(int(top_left), 18)
        np.testing.assert_array_equal(
            v, np.asarray(x)[row:row + 7, col:col + 5, 0])


@pytest.mark.parametrize("view,mapping", [
    ("1", {1: 3, 2: 1}),
    ("2", {1: 4}),
    ("3", {1: 3, 2: 1}),
    ("4", {1: 3, 2: 2, 3: 0, 4: 1}),
])
def test_mask_to_allclass(view, mapping):
    """Matches the reference two-step (threshold → scatter) pipeline
    (datasets/loader.py:296-316, 358-414)."""
    raw = np.random.RandomState(5).randint(0, 5, size=(9, 9))
    out = np.asarray(mask_to_allclass(jnp.asarray(raw), view))
    assert out.shape == (9, 9, 5)
    expected = np.zeros((9, 9, 5), np.float32)
    for raw_val, ch in mapping.items():
        expected[..., ch] = (raw == raw_val)
    np.testing.assert_array_equal(out, expected)


def test_crop_and_resize_reject_bad_inputs():
    """Oversized crops (negative slice start → silent wrong-shape remnant)
    and 2-D inputs (the default -3/-2 axes would swap H and W) must error,
    not mangle."""
    from glfusion_tpu.ops.crops import center_crop, random_crop
    from glfusion_tpu.ops.resize import resize_nearest

    x = jnp.zeros((9, 9, 1))
    with pytest.raises(ValueError, match="exceeds"):
        center_crop(x, (12, 12))
    with pytest.raises(ValueError, match="exceeds"):
        random_crop(jax.random.PRNGKey(0), x, (12, 4))
    with pytest.raises(ValueError, match="ndim"):
        center_crop(jnp.zeros((9, 9)), (4, 4))
    with pytest.raises(ValueError, match="ndim"):
        resize_nearest(jnp.zeros((9, 9)), (4, 4))


def test_mask_to_allclass_out_of_range_is_background():
    """Unknown raw labels (>4, or negative) must map to background like the
    reference's exact-equality tests — NOT be clipped into label 4 (which
    would invent RV foreground on view '4')."""
    raw = np.array([[5, 7, -1], [200, 4, 0]], np.int32)
    out = np.asarray(mask_to_allclass(jnp.asarray(raw), "4"))
    expected = np.zeros((2, 3, 5), np.float32)
    expected[1, 1, 1] = 1.0  # only raw==4 → RV; everything else background
    np.testing.assert_array_equal(out, expected)


def test_mask_to_allclass_traced_view_index():
    raw = jnp.asarray(np.random.RandomState(6).randint(0, 5, size=(4, 4)))
    f = jax.jit(lambda r, v: mask_to_allclass(r, v))
    out_traced = f(raw, jnp.int32(3))
    out_static = mask_to_allclass(raw, "4")
    np.testing.assert_array_equal(np.asarray(out_traced), np.asarray(out_static))


def test_view_label_table_shape():
    t = view_label_table()
    assert t.shape == (4, 5)
    assert t[0, 1] == 3 and t[3, 3] == 0


def test_aspp_dead_tap_elimination_is_exact():
    """rate >= H,W → center-slice 1×1 conv must equal the full dilated conv."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glfusion_tpu.models.aspp import DilatedConv3x3

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6))
    m_fast = DilatedConv3x3(features=5, rate=9)   # 9 > 8 → fast path
    v = m_fast.init(jax.random.PRNGKey(1), x)
    y_fast = m_fast.apply(v, x)

    # reference: full dilated conv with the same kernel
    k = v["params"]["kernel"]
    y_full = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((9, 9), (9, 9)), rhs_dilation=(9, 9),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y_fast.shape == y_full.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_full),
                               atol=1e-5, rtol=1e-5)
    # and a rate that DOES reach in-bounds must NOT take the fast path
    m_slow = DilatedConv3x3(features=5, rate=4)
    v2 = m_slow.init(jax.random.PRNGKey(1), x)
    y_slow = m_slow.apply(v2, x)
    k2 = v2["params"]["kernel"]
    y_slow_ref = jax.lax.conv_general_dilated(
        x, k2, (1, 1), ((4, 4), (4, 4)), rhs_dilation=(4, 4),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y_slow), np.asarray(y_slow_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("rate,hw", [(9, 8), (6, 8), (3, 8), (5, 12), (2, 6)])
def test_dilated_decomposition_exact_all_rates(rate, hw):
    """9-tap decomposition must equal the full dilated conv at any rate."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glfusion_tpu.models.aspp import DilatedConv3x3

    x = jax.random.normal(jax.random.PRNGKey(rate), (2, hw, hw, 6))
    m = DilatedConv3x3(features=5, rate=rate)
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    k = v["params"]["kernel"]
    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((rate, rate), (rate, rate)), rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_fused_nonlocal_matches_naive_interpret():
    """Pallas kernel (interpret mode on CPU) vs the naive contraction,
    including a token count that is NOT a multiple of the tile."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention
    from glfusion_tpu.ops.tpavi_pallas import fused_dot_nonlocal

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    for n in (75, 256):
        theta = jax.random.normal(k1, (2, n, 32))
        phi = jax.random.normal(k2, (2, n, 32))
        g = jax.random.normal(k3, (2, n, 32))
        y = fused_dot_nonlocal(theta, phi, g, interpret=True)
        ref = dot_nonlocal_attention(theta, phi, g, impl="naive")
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_aspp_fused_centers_matches_full_convs():
    """The fused-center ASPP path must equal per-branch full dilated convs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glfusion_tpu.models.aspp import ASPP

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6))
    # rates all > h/2 → every branch decomposes → fused-center path
    m = ASPP(channels=4, rates=(5, 7, 9), dropout=0.0)
    v = m.init(jax.random.PRNGKey(1), x, False)
    y_fused = m.apply(v, x, False)

    # reference: rebuild each branch with full lax convs + the same BNs
    p, s = v["params"], v["batch_stats"]

    def bn_eval(t, name):
        mean, var = s[name]["mean"], s[name]["var"]
        return ((t - mean) / jnp.sqrt(var + 1e-5) * p[name]["scale"]
                + p[name]["bias"])

    outs = []
    y0 = jax.lax.conv_general_dilated(
        x, p["b0_conv"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    outs.append(jax.nn.relu(bn_eval(y0, "b0_bn")))
    for i, r in enumerate((5, 7, 9)):
        k = p[f"b{i + 1}_conv"]["kernel"]
        yi = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((r, r), (r, r)), rhs_dilation=(r, r),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(jax.nn.relu(bn_eval(yi, f"b{i + 1}_bn")))
    pool = jnp.mean(x, axis=(1, 2), keepdims=True)
    yp = jax.lax.conv_general_dilated(
        pool, p["pool_conv"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yp = jax.nn.relu(bn_eval(yp, "pool_bn"))
    outs.append(jnp.broadcast_to(yp, x.shape[:3] + (4,)))
    cat = jnp.concatenate(outs, -1)
    proj = jax.lax.conv_general_dilated(
        cat, p["project_conv"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    expected = jax.nn.relu(bn_eval(proj, "project_bn"))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_pallas_fused_nonlocal_gradients():
    """The custom_vjp backward (reassociated C'xC' contractions) must match
    autodiff through the naive einsum chain — this is what makes
    use_pallas_fusion trainable."""
    import jax

    from glfusion_tpu.ops.nonlocal_attn import dot_nonlocal_attention
    from glfusion_tpu.ops.tpavi_pallas import fused_dot_nonlocal

    rs = np.random.RandomState(3)
    b, n, c = 2, 48, 16
    theta, phi, g = (jnp.asarray(rs.randn(b, n, c), jnp.float32)
                     for _ in range(3))

    def loss_pallas(t, p, gg):
        y = fused_dot_nonlocal(t, p, gg, True)  # interpret mode on CPU
        return jnp.sum(jnp.sin(y))

    def loss_naive(t, p, gg):
        y = dot_nonlocal_attention(t, p, gg, impl="naive")
        return jnp.sum(jnp.sin(y))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(theta, phi, g)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(theta, phi, g)
    for a, b_ in zip(gp, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)

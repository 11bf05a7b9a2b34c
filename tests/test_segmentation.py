"""Single-view segmenter factory contracts (reference segmentation.py ctors)."""

import jax
import jax.numpy as jnp
import pytest

_TINY = dict(stem_width=4, block_sizes=(1, 1, 1, 1), widths=(2, 4, 6, 8),
             aspp_rates=(2, 4, 6), aspp_channels=8)


@pytest.mark.parametrize("variant,extra_keys", [
    ("plain", {"ctr_feat", "feat_mid"}),
    ("iekd", {"x_layerbs", "x_layer1", "x_layer4", "maskfeat"}),
    ("project", {"x_layerbs", "x_layer1", "x_layer4"}),
    ("maxmod", {"xtest_layer1code"}),
])
def test_deeplab_single_variants(variant, extra_keys):
    from glfusion_tpu.models.segmentation import DeepLabV3Single

    m = DeepLabV3Single(num_classes=5, variant=variant, **_TINY)
    x = jnp.zeros((2, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out["out"].shape == (2, 64, 64, 5)
    assert extra_keys <= set(out)


def test_multiframe_segmenter():
    from glfusion_tpu.models.segmentation import MultiFrameSegmenter

    m = MultiFrameSegmenter(num_classes=5, **_TINY)
    x = jnp.zeros((2, 64, 64, 1))
    sups = [x, x, x]
    v = m.init(jax.random.PRNGKey(0), x, sups, False)
    assert m.apply(v, x, sups, False)["out"].shape == (2, 64, 64, 5)


def test_project_head_is_normalized():
    import numpy as np

    from glfusion_tpu.models.segmentation import DeepLabV3Single

    m = DeepLabV3Single(num_classes=5, variant="project", **_TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    norms = np.linalg.norm(
        np.asarray(out["x_layer4"])[..., 0, 0], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

"""Shape contracts for the baseline model zoo (SURVEY.md §2.1 inventory).

Mirrors the reference's __main__ smoke blocks (SURVEY.md §4) at miniature
widths: UTNet, CEN/RefineNet, 3-D Res-UNet, 3-D ResNet regressors, R(2+1)D,
TimeSformer, AVS family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.smoke
def test_utnet_full_and_encoderonly():
    from glfusion_tpu.models import UTNet

    x = jnp.zeros((2, 64, 64, 1))
    for dec in (True, False):
        m = UTNet(num_classes=5, base=4, reduce_size=4, decoder_attn=dec)
        v = m.init(jax.random.PRNGKey(0), x, False)
        assert m.apply(v, x, False).shape == (2, 64, 64, 5)


def test_cen_exchange_semantics():
    from glfusion_tpu.models.cen import _exchange

    x = jnp.asarray(np.arange(2 * 1 * 1 * 1 * 4).reshape(2, 1, 1, 1, 4),
                    jnp.float32)
    scales = jnp.asarray([[1.0, 0.001, 1.0, 0.001],
                          [0.001, 1.0, 0.001, 1.0]])
    y = _exchange(x, scales, 2e-2)
    # stream 0 keeps channels 0,2 (|γ|≥t) and takes stream 1's 1,3
    assert float(y[0, 0, 0, 0, 0]) == float(x[0, 0, 0, 0, 0])
    assert float(y[0, 0, 0, 0, 1]) == float(x[1, 0, 0, 0, 1])
    # stream 1 keeps 1,3 and takes stream 0's 0,2
    assert float(y[1, 0, 0, 0, 0]) == float(x[0, 0, 0, 0, 0])
    assert float(y[1, 0, 0, 0, 1]) == float(x[1, 0, 0, 0, 1])


def test_cen_exchange_three_streams_ring():
    """The reference Exchange hard-codes 2 streams; the 3-view CLI config
    feeds 3, where exchange must still happen (ring: stream i takes its
    low-|γ| channels from stream (i+1) % S) — regression: it was silently
    skipped for any S != 2."""
    from glfusion_tpu.models.cen import _exchange

    x = jnp.asarray(np.arange(3 * 1 * 1 * 1 * 2).reshape(3, 1, 1, 1, 2),
                    jnp.float32)
    scales = jnp.asarray([[1.0, 0.001], [1.0, 0.001], [1.0, 0.001]])
    y = _exchange(x, scales, 2e-2)
    for i in range(3):
        assert float(y[i, 0, 0, 0, 0]) == float(x[i, 0, 0, 0, 0])  # kept
        assert (float(y[i, 0, 0, 0, 1])
                == float(x[(i + 1) % 3, 0, 0, 0, 1]))              # ring


def test_utnet_decoder_keying_matches_reference():
    """block_list='234' builds trans up blocks ONLY where the SKIP level is
    in the list: up at s=4 (skip '3') and s=3 (skip '2') — NOT s=2 (skip
    '1'); reference utnet.py:17-49. Also: no extra conv in front of the
    first pre-act block (its bn1 sees the raw input)."""
    from glfusion_tpu.models import UTNet

    m = UTNet(num_classes=5, base=4, reduce_size=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), False)
    p = v["params"]
    assert "up4_attn" in p and "up3_attn" in p
    assert "up2_attn" not in p and "up1_attn" not in p
    assert "inc_conv" not in p
    # inc_block's bn1 normalizes the RAW 1-ch input
    assert p["inc_block"]["bn1"]["scale"].shape == (1,)


def test_cen_refinenet_forward():
    from glfusion_tpu.models import CENRefineNet

    m = CENRefineNet(num_classes=5, block_sizes=(1, 1, 1, 1))
    x = jnp.zeros((2, 1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    logits, ens, alpha = m.apply(v, x, False)
    assert logits.shape == (2, 1, 16, 16, 5)
    assert ens.shape == (1, 16, 16, 5)
    assert alpha.shape == (2,)
    np.testing.assert_allclose(float(alpha.sum()), 1.0, atol=1e-6)


def test_res3dunet_deep_supervision():
    from glfusion_tpu.models import ResUNet3D

    m = ResUNet3D(out_channels=2, widths=(4, 8, 12, 16, 20))
    x = jnp.zeros((1, 8, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    outs = m.apply(v, x, False)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 8, 16, 16, 2)
        # channel softmax sums to 1
        np.testing.assert_allclose(np.asarray(o.sum(-1)), 1.0, atol=1e-5)


def test_resnet3d_pah_regression_head():
    from glfusion_tpu.models import Resnet50PAH

    m = Resnet50PAH(depth=10)
    x = jnp.zeros((2, 8, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (2, 1)


def test_resnet50pfs_two_modality():
    from glfusion_tpu.models import Resnet50PFS

    m = Resnet50PFS(n_outputs=3, main_depth=10, proj_depth=10)
    x = jnp.zeros((1, 2, 16, 16, 16))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out, seg = m.apply(v, x, False)
    assert out.shape == (1, 3)
    assert seg.shape[0] == 2  # modalities folded into batch


def test_r2plus1d_midplanes_shared_across_both_convs():
    """Reference (rnet2dp1.py:89-99, torchvision): midplanes is computed
    ONCE from (inplanes, planes) and reused by conv2 — e.g. layer2 b0
    (64→128) gives (64·128·27)//(64·9+3·128) = 230 for BOTH convs, not 288
    recomputed from (128, 128)."""
    import jax
    import jax.numpy as jnp

    from glfusion_tpu.models.r2plus1d import R2Plus1DBlock

    m = R2Plus1DBlock(planes=128, strides=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8, 64)), False)
    p = v["params"]
    assert p["conv1"]["spatial"]["kernel"].shape[-1] == 230
    assert p["conv2"]["spatial"]["kernel"].shape[-1] == 230


def test_r2plus1d_iekd_returns_feature():
    from glfusion_tpu.models import r2plus1d_18_iekd

    m = r2plus1d_18_iekd(num_classes=2)
    x = jnp.zeros((1, 8, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    logits, feat = m.apply(v, x, False)
    assert logits.shape == (1, 2)
    assert feat.shape == (1, 512)


def test_timesformer_multiview_scalar():
    from glfusion_tpu.models import TimeSformer

    m = TimeSformer(dim=32, num_classes=1, patch_size=8, depth=2, heads=2,
                    dim_head=16)
    x = jnp.zeros((2, 4, 4, 32, 32))
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert m.apply(v, x, False).shape == (2, 1)


_AVS_TINY = dict(widths=(2, 4, 6, 8), blocks=(1, 1, 1, 1), channel=8)


def test_pred_endecoder_cross_view():
    from glfusion_tpu.models import PredEndecoder

    m = PredEndecoder(num_classes=5, **_AVS_TINY)
    a = jnp.zeros((1, 64, 64, 1))
    b = jnp.zeros((1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), a, b, False)
    out = m.apply(v, a, b, False)
    assert out.shape[-1] == 5 and out.ndim == 4


@pytest.mark.parametrize("cls_name", ["AVSTransfusion", "AVSBaseline"])
def test_avs_multiview_decoders(cls_name):
    import glfusion_tpu.models as zoo

    kw = dict(_AVS_TINY)
    if cls_name == "AVSBaseline":
        kw.pop("channel")  # widths come from the backbone, not a uniform ch
    m = getattr(zoo, cls_name)(num_classes=5, **kw)
    x = jnp.zeros((3, 1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape[0] == 3 and out.shape[-1] == 5
    if cls_name == "AVSBaseline":
        # reference AVS_baseline :804-812: IDENTITY-width Classifier_Modules
        # (conv_i: ch_i→ch_i) + NARROWING FeatureFusionBlock chain
        # ch4→ch3→ch2→ch1→ch1 — not Transfusion's uniform `channel`
        ch = [w * 4 for w in _AVS_TINY["widths"]]
        p = v["params"]
        for i in range(4):
            k = p[f"conv{i + 1}"]["conv0"]["kernel"]
            assert k.shape[-2:] == (ch[i], ch[i]), (i, k.shape)
        assert p["path4"]["conv2"]["kernel"].shape[-1] == ch[2]
        assert p["path3"]["conv2"]["kernel"].shape[-1] == ch[1]
        assert p["path2"]["conv2"]["kernel"].shape[-1] == ch[0]
        assert p["path1"]["conv2"]["kernel"].shape[-1] == ch[0]


@pytest.mark.parametrize("kw", [
    dict(fusion="none"),
    dict(fusion="channel_transformer"),
    dict(fusion="mlp_concat"),
    dict(fusion="tpavi", shared_classifier=True),
    dict(fusion="tpavi", fusion_stages=(1, 2, 3, 4)),
    dict(fusion="decouple_tpavi", shared_backbone=True,
         shared_classifier=True),
])
def test_legacy_variant_family(kw):
    """model3..model21 coverage (reference models/ours.py; see the mapping
    table in glfusion_tpu/models/legacy_variants.py)."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.legacy_variants import LegacyMultiviewSeg

    cfg = tiny_config().model
    m = LegacyMultiviewSeg(cfg, **kw)
    x = jnp.zeros((3, 2, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out["mask"].shape == (3, 2, 32, 32, 5)


def test_legacy_rejects_unsupported_fusion_stages():
    """fusion_stages is only honored as multi-stage tpavi (model20);
    any other combination must error, not silently fuse f4 only."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.legacy_variants import LegacyMultiviewSeg

    cfg = tiny_config().model
    x = jnp.zeros((2, 1, 32, 32, 1))
    for kw in [dict(fusion="channel_transformer", fusion_stages=(1, 2, 3, 4)),
               dict(fusion="tpavi", fusion_stages=(3,))]:
        m = LegacyMultiviewSeg(cfg, **kw)
        with pytest.raises(ValueError, match="fusion_stages"):
            m.init(jax.random.PRNGKey(0), x, False)


def test_legacy_shared_backbone_has_single_param_set():
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.legacy_variants import LegacyMultiviewSeg

    cfg = tiny_config().model
    m = LegacyMultiviewSeg(cfg, fusion="decouple_tpavi", shared_backbone=True,
                           shared_classifier=True)
    x = jnp.zeros((3, 1, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    stem = v["params"]["backbone"]["stem_conv"]["kernel"]
    assert stem.ndim == 4  # no stacked view axis — weights shared
    # decouple projections ARE per-view
    cc = v["params"]["consistent_conv"]["conv"]["kernel"]
    assert cc.shape[0] == 3


def test_spatial_fusion_blocks():
    from glfusion_tpu.models.legacy_variants import (SpatialConcatFusion,
                                                     SpatialMLP)

    f = jnp.zeros((3, 2, 4, 4, 8))
    scf = SpatialConcatFusion()
    v = scf.init(jax.random.PRNGKey(0), f)
    assert scf.apply(v, f).shape == (2, 4, 4, 8)
    mm = SpatialMLP()
    v2 = mm.init(jax.random.PRNGKey(0), f[0])
    assert mm.apply(v2, f[0]).shape == (2, 4, 4, 8)


def test_model17_per_view_tpavi_fusion():
    """model17 (reference ResNet_AVSModel.py:603-790): per-view B2-ResNets +
    per-stage TPAVI fusion."""
    from glfusion_tpu.models import AVSTransfusion

    m = AVSTransfusion(num_classes=5, fusion="tpavi", per_view_params=True,
                       **_AVS_TINY)
    x = jnp.zeros((2, 1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape[0] == 2 and out.shape[-1] == 5
    # per-view backbones → separate param sets
    assert "resnet_0" in v["params"] and "resnet_1" in v["params"]


def test_model20_multistage_fusion_is_interleaved():
    """model20 (reference ours.py:1175-1186): the fused stage-k features
    must feed stage k+1 — every stage's fusion params receive gradient, and
    perturbing the stage-1 fusion changes the output mask."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.legacy_variants import LegacyMultiviewSeg

    cfg = tiny_config().model
    m = LegacyMultiviewSeg(cfg, fusion="tpavi", fusion_stages=(1, 2, 3, 4))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 1, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x, False)
    for s in (1, 2, 3, 4):
        assert f"non_local{s}" in v["params"], sorted(v["params"])

    def loss(params):
        out = m.apply({"params": params,
                       "batch_stats": v.get("batch_stats", {})},
                      x, False)
        return jnp.sum(out["mask"] ** 2)

    grads = jax.grad(loss)(v["params"])
    for s in (1, 2, 3):  # dead-compute bug: these had zero gradient
        g = jax.tree_util.tree_leaves(grads[f"non_local{s}"])
        assert max(float(jnp.abs(x).max()) for x in g) > 0, f"stage {s}"


@pytest.mark.parametrize("arch", ["unet", "multiview_unet", "utnet", "cen",
                                  "res3dunet", "unet:plain", "unet:r2att"])
def test_registry_seg_adapters_meet_trainer_contract(arch):
    """Every --model choice must present the Trainer contract:
    (V,B,H,W,1) → mask (V,B,H,W,5) + cycle features."""
    import dataclasses

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.registry import build_seg_model

    mcfg = dataclasses.replace(tiny_config().model, arch=arch)
    model, cps = build_seg_model(mcfg)
    assert not cps
    x = jnp.zeros((3, 1, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(v, x, False)
    assert out["mask"].shape == (3, 1, 32, 32, 5)
    assert out["f4_global"].shape[0] == 3  # per-view cycle features


def test_registry_reg_models_forward():
    from glfusion_tpu.models.registry import build_reg_model

    clips = jnp.zeros((2, 1, 32, 32, 8))  # (V, B, H, W, T)
    for name, kw in [
        ("resnet50pah", dict(depth=10)),
        ("r2plus1d", dict(layers=(1, 1, 1, 1), widths=(4, 8, 8, 8))),
        ("timesformer", dict(dim=16, depth=1, heads=2, dim_head=8,
                             patch_size=8)),
        # views act as the PFS regressor's modality axis
        # (reference mriresnet3d.py:271,306-308)
        ("resnet50pfs", dict(main_depth=10, proj_depth=10,
                             widths=(4, 8, 8, 8))),
    ]:
        model, adapter = build_reg_model(name, 2, **kw)
        x = adapter(clips)
        v = model.init(jax.random.PRNGKey(0), x, False)
        out = model.apply(v, x, False)
        pred = out[0] if isinstance(out, tuple) else out
        assert pred.shape == (1, 1), (name, pred.shape)


# ---------------------------------------------------------------------------
# Registry trainability: every family PARITY maps is reachable from --model
# (VERDICT r2 #3 — the reference hard-codes Global_and_Local; here the AVS
# family, reference ResNet_AVSModel.py:416-955, and the legacy model3..21
# family, models/ours.py:386-1351, train through the same jitted step)

_NEW_ARCHS = [
    "avs_baseline", "avs_transfusion", "avs_model17", "avs_pred_endecoder",
    "legacy:none", "legacy:channel_transformer", "legacy:tpavi",
    "legacy:model18", "legacy:model20", "legacy:decouple",
    "legacy:mlp_concat",
    # r5: the models/unet.py 4-variant family (reference models/unet.py:138/
    # 204/276/349) and ResUNet3D with deep supervision (res3dunet.py:6,210)
    "unet:plain", "unet:r2", "unet:att", "unet:r2att", "res3dunet",
]


@pytest.mark.parametrize("arch", _NEW_ARCHS)
def test_registry_arch_trains_one_step(arch):
    """Each zoo arch runs ONE full train step (fwd + grads + Adam + cycle
    loss via its feature tap) under the Trainer contract at tiny size."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.registry import SEG_ARCHS, build_seg_model
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    assert arch in SEG_ARCHS
    cfg = tiny_config()
    cfg = replace(cfg, model=replace(cfg.model, arch=arch))
    model, cps = build_seg_model(cfg.model)
    assert not cps
    v, b, hw = cfg.model.num_views, 2, cfg.data.crop_hw
    t = cfg.data.clip_length
    x = jnp.zeros((v, b, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 1))
    probe_path = jax.tree_util.tree_leaves_with_path(state.params)[0]
    before = np.asarray(probe_path[1]).copy()
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).rand(v, b, hw, hw, 1), jnp.float32),
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v, b, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, t, hw, hw, 1), jnp.float32),
    }
    step = make_train_step(cfg, model)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"])), (arch, metrics)
    assert float(metrics["seg_loss"]) > 0.0
    after = np.asarray(jax.tree_util.tree_leaves_with_path(
        new_state.params)[0][1])
    assert not np.array_equal(before, after), f"{arch}: params did not move"


def test_res3dunet_deep_supervision_reaches_the_loss():
    """The adapter's coarse heads (mask_aux) must sum into the train loss:
    map1..3's conv params feed ONLY their own head, so their movement under
    one real train step ⇔ the deep-supervision terms are wired (reference
    res3dunet.py:210 returns all four maps for exactly this use)."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models.registry import build_seg_model
    from glfusion_tpu.train.step import make_train_step
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    cfg = tiny_config()
    cfg = replace(cfg, model=replace(cfg.model, arch="res3dunet"))
    model, _ = build_seg_model(cfg.model)
    v, b, hw = cfg.model.num_views, 2, cfg.data.crop_hw
    x = jnp.zeros((v, b, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    out = model.apply(variables, x, False)
    assert len(out["mask_aux"]) == 3
    assert all(a.shape == out["mask"].shape for a in out["mask_aux"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, 1))
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).rand(v, b, hw, hw, 1), jnp.float32),
        "masks": jnp.asarray(
            np.random.RandomState(1).rand(v, b, hw, hw, 5) > 0.5,
            jnp.float32),
        "clips": jnp.asarray(
            np.random.RandomState(2).rand(v, cfg.data.clip_length, hw, hw, 1),
            jnp.float32),
    }
    step = make_train_step(cfg, model)
    # snapshot to host BEFORE the step: the jitted step donates `state`
    before = {h: np.asarray(state.params["net"][h]["kernel"]).copy()
              for h in ("map1", "map2", "map3")}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for head, old in before.items():
        after = np.asarray(new_state.params["net"][head]["kernel"])
        assert not np.array_equal(old, after), (
            f"{head} did not move: its deep-supervision loss term is dead")


def test_registry_arch_via_trainer_epochs(tmp_path):
    """End-to-end Trainer smoke on one AVS and one legacy arch: 2 epochs on
    the synthetic corpus from the real CLI config surface."""
    from dataclasses import replace

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.train.trainer import Trainer

    cfg0 = tiny_config()
    paths = generate_synthetic_dataset(str(tmp_path / "data"), cfg0.data,
                                       views=cfg0.model.views, seed=0)
    # one per family added per round: AVS + legacy (r2), the r5
    # frames-to-depth volume adapter with deep supervision (res3dunet)
    for arch in ("avs_transfusion", "legacy:tpavi", "res3dunet"):
        cfg = replace(
            cfg0,
            model=replace(cfg0.model, arch=arch),
            train=replace(cfg0.train, num_epochs=2,
                          save_dir=str(tmp_path / arch / "ckpt"),
                          log_dir=str(tmp_path / arch / "log"),
                          eval_every_epochs=100, save_every_epochs=100))
        trainer = Trainer(cfg, data_paths=paths, verbose=False)
        m0 = trainer._train_epoch(0)
        m1 = trainer._train_epoch(1)
        assert np.isfinite(m0["loss"]) and np.isfinite(m1["loss"]), arch
        assert m1["seg_loss"] < m0["seg_loss"], (arch, m0, m1)

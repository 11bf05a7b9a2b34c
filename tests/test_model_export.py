"""AOT serving export (utils/model_export): serialize → reload → exact.

The reference has no deployment story (serving = carrying the PyTorch
codebase + a .pth, main.py:454-457). The export artifact must reproduce
the live serving forward exactly, at ANY clip length (symbolic frame
axis), through pure jax with no model code.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.models import GlobalAndLocal
from glfusion_tpu.utils.model_export import (export_serving_forward,
                                             load_serving_forward,
                                             make_serving_forward,
                                             save_exported)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    x = jnp.zeros((v, 2, hw, hw, 1), jnp.float32)
    variables = jax.device_get(
        jax.jit(lambda r: model.init(r, x, False))(jax.random.PRNGKey(0)))
    return cfg, model, variables


def test_export_roundtrip_exact_any_frames(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",))
    meta = save_exported(exported, str(tmp_path / "art"), cfg)
    assert meta["symbolic_frames"] is True
    assert meta["num_views"] == cfg.model.num_views

    fwd, meta2 = load_serving_forward(str(tmp_path / "art"))
    assert meta2["format"] == "glfusion_tpu.jax_export.v1"
    direct = make_serving_forward(model, variables)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    rs = np.random.RandomState(0)
    # two different clip lengths through ONE artifact — the symbolic frame
    # axis means no per-shape re-export (the model folds T into batch)
    for t in (2, 5):
        x = rs.rand(v, t, hw, hw, 1).astype(np.float32)
        got = np.asarray(fwd(x))
        want = np.asarray(direct(jnp.asarray(x)))
        assert got.dtype == np.uint8
        assert got.shape == (v, t, hw, hw, cfg.model.num_classes)
        np.testing.assert_array_equal(got, want)


def test_export_meta_written(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",))
    save_exported(exported, str(tmp_path / "art"), cfg)
    meta = json.loads((tmp_path / "art" / "meta.json").read_text())
    assert meta["platforms"] == ["cpu"]
    assert meta["views"] == list(cfg.model.views)
    assert meta["crop_hw"] == cfg.data.crop_hw
    assert meta["input_hw"] == cfg.data.crop_hw  # pinned spatial contract
    assert (tmp_path / "art" / "serving_fn.jaxexp").stat().st_size == \
        meta["serialized_bytes"]


def test_pipeline_rejects_wrong_spatial_size(tiny_model, tmp_path):
    """Serving a clip at a size other than the export's pinned H=W must be
    a clear error, not a raw XLA avals mismatch."""
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",))
    save_exported(exported, str(tmp_path / "art"), cfg)
    fwd, meta = load_serving_forward(str(tmp_path / "art"))
    pipe = ClipPipeline(cfg, model, variables, forward=fwd,
                        expected_hw=meta["input_hw"])
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    bad = np.zeros((v, 3, hw + 4, hw + 4, 1), np.float32)
    with pytest.raises(ValueError, match="pinned"):
        pipe.predict_one(bad)


def test_export_serving_skips_frame_padding(tiny_model):
    """With an AOT forward the pipeline must feed the TRUE frame count
    (the symbolic frame axis exists precisely to skip padding compute)."""
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    seen = []

    def fake_forward(images):
        seen.append(images.shape)
        return jnp.zeros(images.shape[:4] + (cfg.model.num_classes,),
                         jnp.uint8)

    pipe = ClipPipeline(cfg, model, variables, forward=fake_forward)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    t_short = max(1, cfg.data.clip_length - 2)
    out = pipe.predict_one(np.zeros((v, t_short, hw, hw, 1), np.float32))
    assert seen == [(v, t_short, hw, hw, 1)]   # not padded to clip_length
    assert out.shape[1] == t_short
    # live-jit pipelines still pad (compile-once behavior)
    live = ClipPipeline(cfg, model, variables)
    assert live._pad_clips is True and pipe._pad_clips is False


def test_load_missing_artifact_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="export directory"):
        load_serving_forward(str(tmp_path / "nowhere"))


def test_cli_export_refuses_random_weights(tmp_path):
    """--mode export with no checkpoint and no --torch-ckpt must refuse:
    a random-init deployment artifact that looks valid is worse than an
    error."""
    from glfusion_tpu.cli import main

    with pytest.raises(SystemExit, match="no weights"):
        main(["--mode", "export", "--tiny", "--platform", "cpu",
              "--save-dir", str(tmp_path / "empty_ckpt"),
              "--export-dir", str(tmp_path / "art"),
              "--export-platforms", "cpu"])


def test_clip_pipeline_from_export_matches_live(tiny_model, tmp_path):
    """ClipPipeline(forward=<exported>) == ClipPipeline(live weights)."""
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",))
    save_exported(exported, str(tmp_path / "art"), cfg)
    fwd, _ = load_serving_forward(str(tmp_path / "art"))

    hw, v = cfg.data.crop_hw, cfg.model.num_views
    rs = np.random.RandomState(1)
    clips = [(f"c{i}", rs.rand(v, 3, hw, hw, 1).astype(np.float32))
             for i in range(3)]

    def decode(item):
        return item

    live = ClipPipeline(cfg, model, variables, depth=2, threads=1)
    aot = ClipPipeline(cfg, model, variables, depth=2, threads=1,
                       forward=fwd)
    got_live = {cid: m for cid, m in live.predict_iter(clips, decode)}
    got_aot = {cid: m for cid, m in aot.predict_iter(clips, decode)}
    assert got_live.keys() == got_aot.keys()
    for cid in got_live:
        np.testing.assert_array_equal(got_live[cid], got_aot[cid])


def test_pinned_frames_export_pads_short_clips(tiny_model, tmp_path):
    """A frames-PINNED export accepts exactly one clip length, so the
    pipeline must pad short clips back up to it (meta['symbolic_frames']
    False + meta['frames'] drive export_pipeline_kwargs) — and trim the
    prediction to the true frame count."""
    from glfusion_tpu.serve import ClipPipeline, export_pipeline_kwargs

    cfg, model, variables = tiny_model
    t_pin = cfg.data.clip_length
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",), frames=t_pin)
    meta = save_exported(exported, str(tmp_path / "pinned"), cfg)
    assert meta["symbolic_frames"] is False and meta["frames"] == t_pin

    kwargs = export_pipeline_kwargs(str(tmp_path / "pinned"), cfg)
    assert kwargs["pad_clips"] is True and kwargs["pad_to"] == t_pin
    pipe = ClipPipeline(cfg, model, variables, **kwargs)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    t_short = max(1, t_pin - 2)
    x = np.random.RandomState(0).rand(v, t_short, hw, hw, 1).astype(
        np.float32)
    out = pipe.predict_one(x)  # would raise a shape error without padding
    assert out.shape == (v, t_short, hw, hw, cfg.model.num_classes)
    # ...and matches the live forward on the true frames
    live = ClipPipeline(cfg, model, variables)
    np.testing.assert_array_equal(out, live.predict_one(x))


def test_export_pipeline_kwargs_validates(tiny_model, tmp_path):
    """Both serving entry points (batch + HTTP) share one validation:
    views / num_classes mismatches fail at startup with a clear error."""
    import dataclasses

    from glfusion_tpu.serve import export_pipeline_kwargs

    cfg, model, variables = tiny_model
    exported = export_serving_forward(cfg, model, variables,
                                      platforms=("cpu",))
    save_exported(exported, str(tmp_path / "art"), cfg)

    bad_views = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, views=("1", "2")))
    with pytest.raises(ValueError, match="views"):
        export_pipeline_kwargs(str(tmp_path / "art"), bad_views)
    bad_classes = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_classes=7))
    with pytest.raises(ValueError, match="classes"):
        export_pipeline_kwargs(str(tmp_path / "art"), bad_classes)


def test_cli_serve_refuses_random_weights(tmp_path):
    """--mode serve with no checkpoint, no --torch-ckpt and no
    --from-export must refuse (a healthy-looking endpoint on random-init
    weights silently returns garbage masks)."""
    from glfusion_tpu.cli import main

    with pytest.raises(SystemExit, match="no weights"):
        main(["--mode", "serve", "--tiny", "--platform", "cpu",
              "--save-dir", str(tmp_path / "empty_ckpt")])

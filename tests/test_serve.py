"""Pipelined serving path (glfusion_tpu/serve.py).

The pipeline overlaps decode / dispatch / fetch but must be functionally
identical to the serial eval forward: same masks, input order preserved,
short clips padded to the compiled length and trimmed on output.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_model():
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal

    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    v, t = cfg.model.num_views, cfg.data.clip_length
    hw = cfg.data.crop_hw
    x = jnp.zeros((v, t, hw, hw, 1), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, False))(
        jax.random.PRNGKey(0))
    return cfg, model, variables


def _clips(cfg, n, t=None):
    v = cfg.model.num_views
    hw = cfg.data.crop_hw
    t = t or cfg.data.clip_length
    rs = np.random.RandomState(7)
    return [(f"c{i}", rs.rand(v, t, hw, hw, 1).astype(np.float32))
            for i in range(n)]


def test_pipeline_matches_serial_forward(tiny_model):
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    clips = _clips(cfg, 4)
    pipe = ClipPipeline(cfg, model, variables, depth=2, threads=2)

    got = list(pipe.predict_iter(clips, decode=lambda item: item))
    assert [cid for cid, _ in got] == [cid for cid, _ in clips]

    for (cid, images), (gcid, pred) in zip(clips, got):
        ref = np.asarray(
            model.apply(variables, jnp.asarray(images), False)["mask"]
        ) > 0.0
        assert pred.dtype == np.uint8
        np.testing.assert_array_equal(pred.astype(bool), ref)


def test_pipeline_pads_and_trims_short_clips(tiny_model):
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    t_short = max(1, cfg.data.clip_length - 2)
    clips = _clips(cfg, 2, t=t_short)
    pipe = ClipPipeline(cfg, model, variables, depth=1, threads=1)

    for (cid, images), (gcid, pred) in zip(
            clips, pipe.predict_iter(clips, decode=lambda it: it)):
        assert pred.shape[1] == t_short  # trimmed back to true length
        # the padded frames must not change the real frames' predictions?
        # (BN is eval-mode — per-frame independent except the fusion
        # attention, which mixes VIEWS not frames at is_video=False; so
        # frame t's mask depends only on frame t across views)
        padded, _ = pipe._pad_clip(images)
        ref = np.asarray(
            model.apply(variables, jnp.asarray(padded), False)["mask"]
        )[:, :t_short] > 0.0
        np.testing.assert_array_equal(pred.astype(bool), ref)


def test_pipeline_serves_mesh_sharded_variables(tiny_model):
    """The served forward is a plain top-level jit, so variables committed
    with a NamedSharding over a (data, model) mesh must work and produce
    the same masks as replicated variables (a multi-device Trainer state
    handed to ClipPipeline is exactly this)."""
    from glfusion_tpu.parallel import make_mesh, shard_variables
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    mesh = make_mesh(data=4, model=2)
    sharded = shard_variables(variables, mesh)

    clips = _clips(cfg, 3)
    pipe_rep = ClipPipeline(cfg, model, variables, depth=2, threads=2)
    pipe_shd = ClipPipeline(cfg, model, sharded, depth=2, threads=2)

    got_rep = list(pipe_rep.predict_iter(clips, decode=lambda it: it))
    got_shd = list(pipe_shd.predict_iter(clips, decode=lambda it: it))
    for (cid_r, pred_r), (cid_s, pred_s) in zip(got_rep, got_shd):
        assert cid_r == cid_s
        np.testing.assert_array_equal(pred_r, pred_s)


def test_decode_paths_trims_short_clips(tiny_model, tmp_path):
    """A clip shorter than clip_length must come back with T_true frames,
    not predictions over its zero-padding (Trainer.infer writes
    T = min(clip_length, T_clip) — same contract)."""
    from glfusion_tpu.data.nifti import write_nifti
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    hw = cfg.data.crop_hw
    t_short = max(1, cfg.data.clip_length - 2)
    rs = np.random.RandomState(3)
    paths = {}
    for view in cfg.model.views:
        vol = rs.randint(0, 255, (hw, hw, t_short)).astype(np.uint8)
        p = tmp_path / f"v{view}.nii.gz"
        write_nifti(p, vol)
        paths[view] = str(p)

    pipe = ClipPipeline(cfg, model, variables, depth=1, threads=1)
    cid, imgs = pipe.decode_paths(("clip0", paths))
    assert imgs.shape[1] == t_short  # true frame count survives decode

    (gcid, pred), = list(pipe.predict_paths([("clip0", paths)]))
    assert gcid == "clip0"
    assert pred.shape[1] == t_short  # yielded masks trimmed to T_true


def test_decode_paths_single_frame_clip(tiny_model, tmp_path):
    """A single-frame (1, H, W, 1) test volume must decode to
    (V, 1, H, W, 1) — an unconditional squeeze() used to collapse the T
    axis too and scramble the layout."""
    from glfusion_tpu.data.nifti import write_nifti
    from glfusion_tpu.serve import ClipPipeline

    cfg, model, variables = tiny_model
    hw = cfg.data.crop_hw
    rs = np.random.RandomState(5)
    paths = {}
    for view in cfg.model.views:
        # Test_Seg_PAHDataset image layout (1, H, W, T) with T=1
        vol = rs.randint(0, 255, (1, hw, hw, 1)).astype(np.uint8)
        p = tmp_path / f"one_v{view}.nii.gz"
        write_nifti(p, vol)
        paths[view] = str(p)

    pipe = ClipPipeline(cfg, model, variables, depth=1, threads=1)
    cid, imgs = pipe.decode_paths(("one", paths))
    assert imgs.shape == (len(cfg.model.views), 1, hw, hw, 1)
    (_, pred), = list(pipe.predict_paths([("one", paths)]))
    assert pred.shape[:2] == (len(cfg.model.views), 1)


def test_config_from_args_is_idempotent():
    """config_from_args must not mutate the parsed namespace: building a
    config twice from the same args keeps --variant temporal."""
    from glfusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--tiny", "--variant", "temporal", "--platform", "cpu"])
    cfg1 = config_from_args(args)
    cfg2 = config_from_args(args)
    assert cfg1.train.temporal and cfg2.train.temporal
    assert cfg2.model.variant == "global_and_local"
    assert args.variant == "temporal"


def test_serve_test_clips_end_to_end(tmp_path):
    """--mode serve over the synthetic test corpus writes the same files
    as Trainer.infer and reports throughput."""
    from glfusion_tpu.cli import build_parser, config_from_args
    from glfusion_tpu.serve import serve_test_clips
    from glfusion_tpu.train.trainer import Trainer
    from glfusion_tpu.data.nifti import read_nifti

    args = build_parser().parse_args(
        ["--mode", "serve", "--tiny", "--platform", "cpu",
         "--save-dir", str(tmp_path / "ckpt"),
         "--log-dir", str(tmp_path / "log")])
    cfg = config_from_args(args)
    trainer = Trainer(cfg, data_paths=None)  # synthetic corpus

    stats = serve_test_clips(trainer, out_dir=str(tmp_path / "pred"),
                             depth=2, threads=2)
    assert stats["written"] == stats["clips"] * len(cfg.model.views)
    assert stats["clips_per_s"] is None or stats["clips_per_s"] > 0

    # outputs parse as NIfTI with the Test_Seg_PAHDataset label layout
    files = sorted((tmp_path / "pred").glob("pred_*_v*.nii.gz"))
    assert len(files) == stats["written"]
    vol = np.asarray(read_nifti(files[0]))
    assert vol.ndim == 4 and vol.shape[0] == 5


def test_serve_rejects_multi_process(monkeypatch):
    """serve is a single-controller path (local staging + np.asarray
    fetches can't see another process's shards); a multi-process run must
    get a clear error pointing at replica-per-host or --mode infer."""
    import pytest

    from glfusion_tpu.serve import serve_test_clips

    monkeypatch.setattr("jax.process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-controller"):
        serve_test_clips(trainer=None)

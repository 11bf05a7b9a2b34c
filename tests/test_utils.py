"""Scalar metrics, visualization LUT, cluster helpers, CLI config."""

import numpy as np
import pytest
import jax.numpy as jnp


def test_regression_scores_match_sklearn():
    try:
        from sklearn.metrics import (mean_absolute_error,
                                     mean_squared_error, r2_score)
    except Exception as e:  # a damaged install raises OSError, not ImportError
        pytest.skip(f"sklearn unavailable: {e}")

    from glfusion_tpu.utils.scores import c_index, mae, mse, r2, rmse

    yt = np.array([30.0, 45.0, 60.0, 25.0, 80.0])
    yp = np.array([33.0, 40.0, 66.0, 28.0, 70.0])
    assert abs(float(mse(yt, yp)) - mean_squared_error(yt, yp)) < 1e-5
    assert abs(float(mae(yt, yp)) - mean_absolute_error(yt, yp)) < 1e-5
    assert abs(float(rmse(yt, yp)) - np.sqrt(mean_squared_error(yt, yp))) < 1e-5
    assert abs(float(r2(yt, yp)) - r2_score(yt, yp)) < 1e-5
    assert float(c_index(yt, yp)) == 100.0
    assert float(c_index(yt, -yp)) == 0.0


def test_dice_score_binary_perfect_and_empty():
    from glfusion_tpu.utils.scores import dice_score_binary

    pred = jnp.stack([jnp.zeros((2, 4, 4)), jnp.ones((2, 4, 4))], axis=1)
    true = jnp.ones((2, 1, 4, 4), jnp.int32)
    assert abs(float(dice_score_binary(true, pred)) - 1.0) < 1e-6


def test_dice_score_binary_matches_monai_ignore_empty():
    """MONAI 1.1.0 DiceMetric (ignore_empty=True, the reference's pinned
    default): an EMPTY ground-truth class is NaN — excluded from the
    mean — even when the prediction fires. Scoring it 0 would deflate
    the metric relative to the reference."""
    from glfusion_tpu.utils.scores import dice_score_binary

    # gt all class-0; prediction fires class-1 on half the pixels
    true = jnp.zeros((1, 1, 4, 4), jnp.int32)
    logit1 = jnp.concatenate(
        [jnp.full((1, 2, 4), 5.0), jnp.full((1, 2, 4), -5.0)], axis=1)
    pred = jnp.stack([-logit1, logit1], axis=1)  # (1, 2, 4, 4)
    # class 1: gt empty → NaN (excluded); class 0: dice = 2·8/(8+16) = 2/3
    got = float(dice_score_binary(true, pred))
    assert abs(got - 2.0 / 3.0) < 1e-6


def test_r2_constant_target_is_finite():
    """sklearn r2_score semantics on a constant target: 0.0 when the
    prediction misses, 1.0 when exact — never inf/nan (the single-sample
    val-split case the CLI must serialize as strict JSON)."""
    from glfusion_tpu.utils.scores import r2

    yt = np.array([50.0, 50.0, 50.0])
    assert float(r2(yt, np.array([48.0, 52.0, 50.0]))) == 0.0
    assert float(r2(yt, yt.copy())) == 1.0


def test_class_map_background_wins_when_nothing_fires():
    from glfusion_tpu.utils.visualize import class_map

    logits = jnp.full((1, 4, 4, 5), -5.0)  # sigmoid < 0.5 everywhere
    assert int(class_map(logits).sum()) == 0


def test_class_map_argmax_matches_reference_rule():
    from glfusion_tpu.utils.visualize import COLOR_TABLE, class_map, colorize

    logits = np.full((2, 2, 5), -5.0)
    logits[0, 0, 2] = 5.0   # channel 2 fires → class 3
    logits[1, 1, 0] = 5.0   # channel 0 fires → class 1
    cm = np.asarray(class_map(jnp.asarray(logits)))
    assert cm[0, 0] == 3 and cm[1, 1] == 1 and cm[0, 1] == 0
    rgba = colorize(cm)
    assert rgba.shape == (2, 2, 4)
    assert (rgba[0, 0] == COLOR_TABLE[3]).all()


def test_save_clip_visualization_writes_pngs(tmp_path):
    from glfusion_tpu.utils.visualize import save_clip_visualization

    logits = np.random.RandomState(0).randn(3, 8, 8, 5).astype(np.float32)
    n = save_clip_visualization(tmp_path, "m", "0_0", "1", logits)
    assert n == 3
    files = sorted((tmp_path / "m" / "192_data" / "0_0" / "1").glob("*.png"))
    assert len(files) == 3
    # the from-scratch encoder emits real PNGs: decode one (independent
    # stdlib decoder below) and compare pixel-exact against the LUT gather
    from glfusion_tpu.utils.visualize import class_map, colorize

    expect = colorize(np.asarray(class_map(logits[0])))
    np.testing.assert_array_equal(_decode_png(files[0].read_bytes()), expect)


def _decode_png(data: bytes) -> np.ndarray:
    """Independent minimal PNG reader (8-bit RGBA, filter 0) for tests."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, dims = 8, b"", None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), "bad CRC"
        if tag == b"IHDR":
            w, h, bitdepth, coltype = struct.unpack(">IIBB", payload[:10])
            assert (bitdepth, coltype) == (8, 6), "expected 8-bit RGBA"
            dims = (h, w)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    h, w = dims
    raw = zlib.decompress(idat)
    stride = w * 4 + 1
    rows = []
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        assert row[0] == 0, "unexpected PNG filter"
        rows.append(np.frombuffer(row[1:], np.uint8).reshape(w, 4))
    return np.stack(rows)


def test_write_png_roundtrip_and_validation(tmp_path):
    from glfusion_tpu.utils.visualize import write_png

    rgba = np.random.RandomState(1).randint(0, 256, (5, 7, 4), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(p, rgba)
    np.testing.assert_array_equal(_decode_png(p.read_bytes()), rgba)
    with np.testing.assert_raises(ValueError):
        write_png(tmp_path / "bad.png", np.zeros((4, 4, 3), np.uint8))


def test_cluster_helpers_env_contract(monkeypatch):
    from glfusion_tpu.utils import cluster

    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "4")
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "2")
    monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_RANK", "1")
    monkeypatch.setenv("AZ_BATCH_MASTER_NODE", "10.0.0.5:6000")
    assert cluster.get_world_size() == 4
    assert cluster.get_global_rank() == 2
    assert cluster.get_local_rank() == 1
    assert cluster.get_master_ip() == "10.0.0.5"


def test_cluster_helpers_jax_fallback(monkeypatch):
    import jax

    from glfusion_tpu.utils import cluster

    for var in ("PMI_SIZE", "OMPI_COMM_WORLD_SIZE", "PMI_RANK",
                "OMPI_COMM_WORLD_RANK", "AZ_BATCH_MASTER_NODE",
                "AZ_BATCHAI_MPI_MASTER_NODE"):
        monkeypatch.delenv(var, raising=False)
    assert cluster.get_world_size() == jax.process_count()
    assert cluster.get_master_ip() == "127.0.0.1"


def test_cli_config_from_args_reference_defaults():
    from glfusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--mode", "train"])
    cfg = config_from_args(args)
    assert cfg.train.batch_size == 8
    assert cfg.train.num_epochs == 100
    assert cfg.opt.lr == 3e-4
    assert cfg.model.views == ("1", "3", "4")
    assert cfg.data.clip_length == 40
    assert cfg.train.use_cycle


def test_cli_variant_and_views_flags():
    from glfusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--mode", "val", "--variant", "global_only", "--views", "1,4",
         "--no-cycle", "--tiny"])
    cfg = config_from_args(args)
    assert cfg.model.variant == "global_only"
    assert cfg.model.views == ("1", "4")
    assert not cfg.train.use_cycle


def test_helpers_prepare_and_panel():
    from glfusion_tpu.utils.helpers import make_validation_img, prepare_img

    img = np.full((8, 8, 3), 128, np.uint8)
    out = prepare_img(img)
    assert out.shape == (8, 8, 3)
    assert abs(float(out[0, 0, 0]) - (128 / 255 - 0.485) / 0.229) < 1e-6

    panel = make_validation_img(np.random.rand(8, 8), 
                                np.zeros((8, 8), np.int64),
                                np.ones((8, 8), np.int64))
    assert panel.shape == (8, 24, 3) and panel.dtype == np.uint8


def test_maybe_download_refuses_network(tmp_path):
    from glfusion_tpu.utils.helpers import maybe_download

    with pytest.raises(FileNotFoundError):
        maybe_download("resnet50", "http://example.com/x.pth",
                       model_dir=str(tmp_path))


def test_tpavi_modes_forward():
    import jax
    import jax.numpy as jnp

    from glfusion_tpu.models import TPAVI

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4, 8))
    for mode in ("dot", "gaussian", "embedded", "concatenate"):
        m = TPAVI(inter_channels=4, mode=mode)
        v = m.init(jax.random.PRNGKey(1), x, False)
        y = m.apply(v, x, False)
        assert y.shape == x.shape, mode


def test_capture_activations_and_diff():
    import jax

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.utils.activations import (capture_activations,
                                                diff_activations)

    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 32, 32, 1))
    v = jax.jit(lambda r: model.init(r, x, False))(jax.random.PRNGKey(1))
    acts = capture_activations(model, v, x)
    # per-module activations captured, including nested backbone blocks
    assert any("backbone" in k for k in acts)
    assert any(k.startswith("__output__.mask") for k in acts)
    # self-diff is exactly zero; perturbed diff is flagged worst-first
    assert all(d == 0.0 for d in diff_activations(acts, acts).values())
    acts2 = dict(acts)
    key = next(iter(acts2))
    acts2[key] = acts2[key] + 1.0
    worst = next(iter(diff_activations(acts, acts2)))
    assert worst == key


def test_time_fn_scales_with_iters():
    """The scan body must carry a loop dependency into fn's inputs: if XLA
    could hoist the (loop-invariant) call, per-call time would collapse
    ~1/iters. Assert total time grows roughly linearly with iters."""
    import jax.numpy as jnp
    from glfusion_tpu.utils.profiling import time_fn

    x = jnp.ones((384, 384), jnp.float32)

    def fn(a):
        return a @ a @ a

    # perfect linearity gives 8×; elision would give ~1×. Generous bounds,
    # best-of-3 attempts: on a busy 1-core box a single 2-iter sample can
    # be inflated several-fold by a concurrent process.
    samples = []
    for _ in range(3):
        t2 = time_fn(fn, x, iters=2) * 2     # total seconds at 2 iters
        t16 = time_fn(fn, x, iters=16) * 16  # total seconds at 16 iters
        samples.append((t2, t16))
        if t16 > 3.0 * t2:
            return
    raise AssertionError(samples)


def test_time_fn_unused_first_leaf_not_hoisted():
    """Regression: the carry must feed EVERY input leaf. Perturbing only the
    first flattened leaf is unsound when fn never reads it (real case: a
    flax train-mode apply flattens batch_stats first and ignores them, so
    the whole body became loop-invariant and XLA timed 1 iteration as if it
    were N). fn below ignores its first argument entirely."""
    import jax.numpy as jnp
    from glfusion_tpu.utils.profiling import time_fn

    unused = jnp.ones((4,), jnp.float32)
    x = jnp.ones((384, 384), jnp.float32)

    def fn(dead, a):
        return a @ a @ a

    t2 = time_fn(fn, unused, x, iters=2) * 2
    t16 = time_fn(fn, unused, x, iters=16) * 16
    assert t16 > 3.0 * t2, (t2, t16)


def test_initialize_distributed_guards_on_env_only(monkeypatch):
    """Guard must not touch the XLA backend (jax.distributed.initialize has
    to run before any backend use) and must no-op for world size <= 1."""
    from glfusion_tpu.utils import cluster

    calls = []
    monkeypatch.setattr(
        "jax.distributed.initialize",
        lambda **kw: calls.append(kw))

    def process_count_after_init_only():
        # touching the backend is only legal once jax.distributed.initialize
        # has run (the post-init bring-up sync does exactly that); any call
        # on a no-op path is a bug
        assert calls, "backend touched before jax.distributed.initialize"
        return 1  # pretend single-process so the sync collective is skipped

    monkeypatch.setattr("jax.process_count", process_count_after_init_only)

    for var in ("PMI_SIZE", "OMPI_COMM_WORLD_SIZE", "PMI_RANK",
                "OMPI_COMM_WORLD_RANK"):
        monkeypatch.delenv(var, raising=False)
    cluster.initialize_distributed()
    assert calls == []  # no env vars → single process → no-op

    monkeypatch.setenv("PMI_SIZE", "1")
    cluster.initialize_distributed()
    assert calls == []

    monkeypatch.setenv("PMI_SIZE", "4")
    monkeypatch.setenv("PMI_RANK", "2")
    cluster.initialize_distributed(port=12345)
    assert len(calls) == 1
    assert calls[0]["num_processes"] == 4
    assert calls[0]["process_id"] == 2
    assert calls[0]["coordinator_address"].endswith(":12345")


def test_two_process_distributed_bringup(tmp_path):
    """Real 2-process jax.distributed bring-up through
    initialize_distributed (the multi-host wiring the reference computed
    but never used): both processes must see process_count()==2 and
    allgather each other's rank."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from glfusion_tpu.utils.cluster import initialize_distributed
initialize_distributed(port={port})
assert jax.process_count() == 2, jax.process_count()
import jax.numpy as jnp
from jax.experimental import multihost_utils
ranks = multihost_utils.process_allgather(
    jnp.float32(jax.process_index()))
assert sorted(float(x) for x in ranks) == [0.0, 1.0], ranks
print("DISTOK", jax.process_index(), flush=True)
"""
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   PMI_SIZE="2", PMI_RANK=str(rank),
                   JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # no virtual 8-device split here
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "DISTOK" in out


def test_log_histograms_flag_and_writer(tmp_path):
    """--log-histograms (reference main.py:252-255 optional per-param
    histogram pass): the flag reaches the config, and the trainer logs one
    histogram per parameter leaf through the summary writer."""
    import dataclasses

    import jax

    from glfusion_tpu.cli import build_parser, config_from_args
    from glfusion_tpu.train.trainer import Trainer

    args = build_parser().parse_args(
        ["--mode", "train", "--tiny", "--log-histograms",
         "--save-dir", str(tmp_path / "c"), "--log-dir", str(tmp_path / "l")])
    cfg = config_from_args(args)
    assert cfg.train.log_histograms

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_width=4,
                                       widths=(4, 4, 8, 8), aspp_channels=8))
    tr = Trainer(cfg, verbose=False)

    class Spy:
        def __init__(self):
            self.tags = []

        def add_histogram(self, tag, values, step):
            assert values.size > 0 and step == 3
            self.tags.append(tag)

    tr.summary = Spy()
    tr._log_param_histograms(3)
    n_leaves = len(jax.tree_util.tree_leaves(tr.state.params))
    assert len(tr.summary.tags) == n_leaves
    assert all(t.startswith("params") for t in tr.summary.tags)


def test_experiments_not_imported_by_package():
    """experiments/ is the closed-negative research ledger (see its
    README): nothing in the shipping package may import from it, and the
    package must not grow a stem_pallas wiring back (the flag was removed
    with the relocation)."""
    import subprocess
    import sys
    from pathlib import Path

    import re

    pkg = Path(__file__).resolve().parent.parent / "glfusion_tpu"
    pat = re.compile(r"^\s*(import experiments|from experiments)\b",
                     re.MULTILINE)
    hits = [
        p for p in pkg.rglob("*.py")
        if pat.search(p.read_text(encoding="utf-8"))
    ]
    assert not hits, f"package files importing experiments/: {hits}"
    # the ledger itself still imports (one-way dependency is allowed)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import experiments.stem_module, experiments.stem_banded"],
        capture_output=True, text=True, cwd=str(pkg.parent), timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_perf_regression_guard():
    """tools/check_perf_regression.py: the hold-the-line floors trip on a
    regressed record, pass on the stamped one, and skip CPU records."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import check_perf_regression as guard

    # r5: the guard keys on the headline metric name + explicit platform
    # field (zoo/reg rows and CPU records skip; tests/test_bench_guard.py
    # covers those branches)
    good = {"metric": "multiview_inference_throughput", "value": 1275.4,
            "unit": "frames/sec/chip",
            "train_step_s": 0.363, "train_step_light_s": 0.3107,
            "train_mfu_pct": 50.2, "platform": "tpu"}
    assert guard.check(dict(good), slack=0.04) == 0
    bad = dict(good, value=1100.0, train_mfu_pct=44.0)
    assert guard.check(bad, slack=0.04) == 1
    missing = {k: v for k, v in good.items() if k != "train_step_s"}
    assert guard.check(missing, slack=0.04) == 1
    cpu = {"metric": "multiview_inference_throughput", "value": 1.2,
           "unit": "frames/sec/chip", "train_step_s": 30.0,
           "platform": "cpu"}
    assert guard.check(cpu, slack=0.04) == 0

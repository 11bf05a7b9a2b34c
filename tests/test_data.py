"""New dataset loaders: regression clips, all-mask frames, full videos."""

import numpy as np
import jax
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.data.infos import PatientIndex, load_infos, load_split
from glfusion_tpu.data.pipeline import (
    AllMaskFrameLoader,
    FullVideoLoader,
    RegressionClipLoader,
    preprocess_regression_batch,
)
from glfusion_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    cfg = tiny_config()
    root = tmp_path_factory.mktemp("synth")
    paths = generate_synthetic_dataset(root, cfg.data, views=("1", "4"),
                                       seed=0)
    infos = load_infos(paths["infos"])
    index = PatientIndex.from_infos(infos, ("rmyy",))
    train = load_split(f"{paths['data_list_dir']}/train_list.npy")
    return cfg, index, train


def test_regression_loader_targets_and_shapes(synth):
    cfg, index, train = synth
    loader = RegressionClipLoader(index, train, ("1", "4"), cfg, True)
    assert len(loader) > 0
    batch = next(loader.batches(2))
    r, t = cfg.data.resize_hw, cfg.data.reg_clip_frames
    assert batch["clips_raw"].shape == (2, 2, r, r, t)
    assert batch["targets"].shape == (2,)
    # synthetic mPAP range
    assert (batch["targets"] >= 20).all() and (batch["targets"] <= 80).all()


def test_regression_preprocess_crop(synth):
    cfg, index, train = synth
    loader = RegressionClipLoader(index, train, ("1", "4"), cfg, False)
    batch = next(loader.batches(1))
    import jax.numpy as jnp
    out = preprocess_regression_batch(
        jax.random.PRNGKey(0), jnp.asarray(batch["clips_raw"]),
        crop_hw=cfg.data.crop_hw, is_train=False)
    c, t = cfg.data.crop_hw, cfg.data.reg_clip_frames
    assert out.shape == (2, 1, c, c, t)
    assert float(out.max()) <= 1.0


def test_all_mask_loader_enumerates_labeled_frames(synth):
    cfg, index, train = synth
    loader = AllMaskFrameLoader(index, train[:2], ("1",), cfg)
    items = list(loader.frames())
    assert len(items) == len(loader) > 0
    r = cfg.data.resize_hw
    for it in items[:3]:
        assert it["image_raw"].shape == (r, r)
        assert it["mask_raw"].shape == (r, r)
        assert it["mask_raw"].sum() > 0  # frame was labeled


def test_full_video_loader(synth):
    cfg, index, train = synth
    loader = FullVideoLoader(index, train[:2], ("1", "4"), cfg)
    vids = list(loader.videos())
    assert len(vids) == 2
    r = cfg.data.resize_hw
    for v in vids:
        for view, d in v["views"].items():
            assert d["images_raw"].shape[:2] == (r, r)
            assert d["images_raw"].shape == d["masks_raw"].shape


def test_regression_trainer_end_to_end(synth, tmp_path):
    """One epoch of mPAP regression on a tiny 3-D ResNet + eval metrics."""
    import dataclasses

    from glfusion_tpu.models import ResNet3D
    from glfusion_tpu.train.regression import RegressionTrainer
    import flax.linen as nn
    import jax.numpy as jnp

    cfg, index, train = synth
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, views=("1", "4")),
        data=dataclasses.replace(cfg.data, reg_clip_frames=8),
        train=dataclasses.replace(cfg.train, batch_size=2,
                                  save_dir=str(tmp_path / "reg_ckpt")))

    class TinyReg(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feat = ResNet3D(depth=10, widths=(2, 4, 6, 8),
                            name="bb")(x, train)
            return nn.Dense(1, name="head")(feat)

    # reuse the synthetic paths via the index's stored file paths
    import glfusion_tpu.data.synthetic as synth_mod
    root = next(iter(index.records.values()))["images"]["1"]
    from pathlib import Path
    base = Path(root).parent.parent
    data_paths = {
        "infos": str(base / "infos" / "save_infos_reg_v2.npy"),
        "data_list_dir": str(base / "data_list"),
    }
    tr = RegressionTrainer(cfg, TinyReg(), data_paths)
    m = tr.train_epoch(0)
    assert m["steps"] > 0 and np.isfinite(m["loss"])
    ev = tr.evaluate()
    assert set(ev) == {"mse", "mae", "rmse", "r2"}
    assert np.isfinite(ev["rmse"])

    # checkpoint roundtrip: reg-val must score SAVED weights, not fresh init
    tr.save(0, wait=True)
    tr2 = RegressionTrainer(cfg, TinyReg(), data_paths)
    assert tr2.load_latest() and tr2.epoch == 1
    w0 = np.asarray(tr.state.params["head"]["kernel"])
    np.testing.assert_array_equal(
        w0, np.asarray(tr2.state.params["head"]["kernel"]))


def test_native_nifti_reader_matches_python(tmp_path):
    """C++ decoder vs pure-Python reference on every supported dtype."""
    from glfusion_tpu.data.nifti import read_nifti_py, write_nifti
    from glfusion_tpu.native import native_available

    if not native_available():
        pytest.skip("native library not built and no compiler")
    from glfusion_tpu.native import read_nifti_batch_native, read_nifti_native

    rs = np.random.RandomState(0)
    paths, arrs = [], []
    # unscaled volumes take the RAW byte path: exact for EVERY dtype,
    # including f64 and 32-bit ints beyond f32's 24-bit mantissa
    for i, (dt, arr) in enumerate([
        (np.uint8, (rs.rand(17, 13, 9) * 100)),
        (np.int16, (rs.rand(17, 13, 9) * 100)),
        (np.float32, rs.rand(17, 13, 9)),
        (np.uint16, (rs.rand(17, 13, 9) * 100)),
        (np.float64, rs.rand(5, 6, 7)),
        (np.int32, np.array([2 ** 24 + 1, 2 ** 25 + 3, -7]).reshape(3, 1, 1)),
    ]):
        arr = arr.astype(dt)
        p = tmp_path / f"v{i}.nii.gz"
        write_nifti(p, arr)
        paths.append(p)
        arrs.append(arr)
    for p, arr in zip(paths, arrs):
        got = read_nifti_native(p)
        assert got.shape == arr.shape and got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)
        np.testing.assert_array_equal(got, read_nifti_py(p))
    # batch read preserves the on-disk dtype (not blanket f32)
    outs = read_nifti_batch_native(paths)
    for arr, o in zip(arrs, outs):
        assert o.dtype == arr.dtype
        np.testing.assert_array_equal(o, arr)


def _write_scaled_nifti(path, arr_int16: np.ndarray, slope: float,
                        inter: float) -> None:
    """Write an int16 NIfTI with non-trivial scl_slope/scl_inter."""
    import gzip
    import struct

    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dim = [arr_int16.ndim] + list(arr_int16.shape) + [1] * (7 - arr_int16.ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, 4)  # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, slope)
    struct.pack_into("<f", hdr, 116, inter)
    hdr[344:348] = b"n+1\x00"
    with gzip.open(path, "wb") as f:
        f.write(bytes(hdr) + arr_int16.tobytes(order="F"))


def test_native_reader_scaled_volumes_stay_float(tmp_path):
    """scl_slope/scl_inter volumes must come back as floats, not be cast
    back to the on-disk integer dtype (which would truncate the scaling)."""
    from glfusion_tpu.data.nifti import read_nifti_py
    from glfusion_tpu.native import native_available

    if not native_available():
        pytest.skip("native library not built and no compiler")
    from glfusion_tpu.native import read_nifti_batch_native, read_nifti_native

    raw = np.arange(-6, 6, dtype=np.int16).reshape(4, 3)
    p = tmp_path / "scaled.nii.gz"
    _write_scaled_nifti(p, raw, slope=2.5, inter=0.25)
    expect = raw.astype(np.float32) * 2.5 + 0.25
    got = read_nifti_native(p)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, expect)
    np.testing.assert_allclose(read_nifti_py(p), expect)
    (bgot,) = read_nifti_batch_native([p])
    assert bgot.dtype == np.float32
    np.testing.assert_allclose(bgot, expect)


def test_nifti_scaling_spec_edges(tmp_path):
    """NIfTI-1 spec: scl_slope == 0 means NO scaling (scl_inter ignored),
    and non-finite slope/inter are treated as unset — in BOTH readers.
    Regression: the old predicate multiplied the volume by 0 (Python) or
    substituted slope=1 and still added inter (C++) for slope==0 files."""
    from glfusion_tpu.data.nifti import read_nifti_py
    from glfusion_tpu.native import native_available

    raw = np.arange(-6, 6, dtype=np.int16).reshape(4, 3)
    cases = [("slope0.nii.gz", 0.0, 37.0),       # slope 0 + nonzero inter
             ("nan.nii.gz", float("nan"), 5.0),  # NaN slope
             ("naninter.nii.gz", 2.0, float("nan"))]  # NaN inter
    for name, slope, inter in cases:
        p = tmp_path / name
        _write_scaled_nifti(p, raw, slope=slope, inter=inter)
        got = read_nifti_py(p)
        assert got.dtype == np.int16, name
        np.testing.assert_array_equal(got, raw)
        if native_available():
            from glfusion_tpu.native import read_nifti_native
            ngot = read_nifti_native(p)
            assert ngot.dtype == np.int16, name
            np.testing.assert_array_equal(ngot, raw)
    # genuinely-scaled volumes come back float32 from BOTH readers (the
    # result dtype must not depend on which backend decoded the file)
    p = tmp_path / "scaled.nii.gz"
    _write_scaled_nifti(p, raw, slope=2.5, inter=0.25)
    pgot = read_nifti_py(p)
    assert pgot.dtype == np.float32
    np.testing.assert_allclose(pgot, raw.astype(np.float32) * 2.5 + 0.25)


def test_prefetch_preserves_order_and_raises():
    from glfusion_tpu.data.prefetch import prefetch

    assert list(prefetch(range(10), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


@pytest.mark.smoke
def test_missing_view_pads_zeros(synth):
    """Reference pads missing views with zeros (loader.py:268-282)."""
    import copy

    from glfusion_tpu.data.pipeline import SegFrameLoader

    cfg, index, train = synth
    index2 = copy.deepcopy(index)
    pid = train[0]
    index2.records[pid]["images"]["4"] = None  # view 4 missing for pid
    loader = SegFrameLoader(index2, [pid], ("1", "4"), cfg, is_train=False)
    batch = next(loader.batches(1))
    assert batch["images_raw"][0].sum() > 0      # view 1 present
    assert batch["images_raw"][1].sum() == 0     # view 4 → zeros
    assert batch["masks_raw"][1].sum() == 0


def test_eval_loader_scores_every_patient(synth):
    """Eval emits the final short batch so no patient is skipped
    (train keeps drop-last for static jit shapes)."""
    from glfusion_tpu.data.pipeline import SegFrameLoader

    cfg, index, train = synth
    ids = list(index.records)  # tiny synth corpus: 4 patients
    loader = SegFrameLoader(index, ids, ("1",), cfg, is_train=False)
    n = len(loader)
    batch_size = 3  # does not divide n
    sizes = [b["images_raw"].shape[1]
             for b in loader.batches(batch_size)]
    assert sum(sizes) == n          # every patient scored exactly once
    assert sizes[-1] == n % batch_size or n % batch_size == 0

    tr = SegFrameLoader(index, ids, ("1",), cfg, is_train=True)
    tr_sizes = [b["images_raw"].shape[1] for b in tr.batches(batch_size)]
    assert all(s == batch_size for s in tr_sizes)  # train: drop-last


def test_seg_loader_cache_is_byte_bounded(synth):
    """The LRU is sized by BYTES: corpus-sized workloads (534 entries on
    the real data) must fit instead of thrashing on an item cap, and a
    tiny budget must evict oldest-first."""
    from glfusion_tpu.data.pipeline import SegFrameLoader

    cfg, index, train = synth
    ids = list(index.records)
    loader = SegFrameLoader(index, ids, ("1",), cfg, is_train=False)
    list(loader.batches(2))
    assert len(loader._cache) == len(ids)          # all fit in 4 GiB
    assert loader._cache_used == sum(
        loader._entry_bytes(e) for e in loader._cache.values())

    one_entry = next(iter(loader._cache.values()))
    budget = loader._entry_bytes(one_entry) * 2 + 1
    small = SegFrameLoader(index, ids, ("1",), cfg, is_train=False,
                           cache_bytes=budget)
    list(small.batches(2))
    assert len(small._cache) <= 2                  # evicted down to budget
    assert small._cache_used <= budget


def test_warm_async_prefills_cache_and_batches_match(synth):
    """Background ingest warming (VERDICT r2 #7): warm_async decodes the
    epoch's corpus into the LRU on a daemon thread; batches afterwards are
    identical to a cold loader's, and the warm covers every key."""
    from glfusion_tpu.data.pipeline import SegFrameLoader

    cfg, index, train = synth
    ids = list(index.records)
    warm = SegFrameLoader(index, ids, ("1", "4"), cfg, is_train=True, seed=3)
    t = warm.warm_async(epoch=0)
    if t is not None:
        t.join(timeout=120)
        assert not t.is_alive()
    with warm._cache_lock:
        cached = set(warm._cache)
    assert cached == set(warm.epoch_keys(0))

    cold = SegFrameLoader(index, ids, ("1", "4"), cfg, is_train=True, seed=3)
    for wb, cb in zip(warm.batches(2, epoch=0), cold.batches(2, epoch=0)):
        np.testing.assert_array_equal(wb["images_raw"], cb["images_raw"])
        np.testing.assert_array_equal(wb["masks_raw"], cb["masks_raw"])

    # stop flag halts an in-flight warm
    warm2 = SegFrameLoader(index, ids, ("1", "4"), cfg, is_train=True)
    warm2.stop_warming()
    t2 = warm2.warm_async(epoch=0, chunk=1)
    warm2.stop_warming()
    if t2 is not None:
        t2.join(timeout=120)
        assert not t2.is_alive()


def test_test_clip_loader_zero_fills_missing_views(synth, tmp_path):
    """A test record lacking one requested view must yield a zero-filled
    view (reference pads missing views with zeros, loader.py:268-282)
    instead of crashing on read_nifti(None); a record with NO requested
    view is skipped."""
    from glfusion_tpu.data.infos import load_infos
    from glfusion_tpu.data.pipeline import TestClipLoader
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = tiny_config()
    paths = generate_synthetic_dataset(str(tmp_path / "d"), cfg.data,
                                       views=("1", "4"), seed=1)
    infos = load_infos(paths["test_infos"])
    ids = sorted(infos)
    # drop view "4" from the first clip, every view from the second
    infos[ids[0]]["views_images"]["4"] = None
    infos[ids[1]]["views_images"] = {"1": None, "4": None}

    loader = TestClipLoader(infos, ids, ("1", "4"), cfg.data.clip_length)
    clips = list(loader.clips())
    got = {c["clip_id"] for c in clips}
    assert ids[0] in got and ids[1] not in got
    first = next(c for c in clips if c["clip_id"] == ids[0])
    assert first["images"].shape[0] == 2
    assert (first["images"][1] == 0).all()      # missing view zero-filled
    assert (first["images"][0] != 0).any()      # present view intact

"""data/index_builder: CSV manifest → the reference infos/*.npy contract.

The reference ships pickled index dicts with no tooling to produce them
(SURVEY.md §2.1); the builder is the onboarding path for a user's own
corpus. Round-trip: synthetic dataset → manifest CSV → rebuilt index must
drive the same loaders.
"""

import csv
from pathlib import Path

import numpy as np
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.data.index_builder import build_index, read_manifest
from glfusion_tpu.data.infos import PatientIndex, load_infos, load_split
from glfusion_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    cfg = tiny_config()
    root = tmp_path_factory.mktemp("synth")
    paths = generate_synthetic_dataset(root, cfg.data, views=cfg.model.views,
                                       seed=0)
    return cfg, paths


def _write_manifest(path: Path, rows):
    cols = ["patient_id", "view", "image", "label", "kind", "split",
            "mPAP", "Vmax", "Ps", "dataset_name", "fold"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for r in rows:
            w.writerow(r)


def _manifest_rows_from_infos(infos, kind, with_scalars=False):
    rows = []
    for pid, rec in infos.items():
        for view, ip in rec["views_images"].items():
            row = {"patient_id": pid, "view": view, "image": ip,
                   "label": rec["views_labels"].get(view) or "",
                   "kind": kind}
            if with_scalars:
                row.update(mPAP=rec["mPAP"], Vmax=rec["Vmax"], Ps=rec["Ps"],
                           dataset_name=rec["dataset_name"],
                           fold=rec["fold"])
            rows.append(row)
    return rows


def test_roundtrip_matches_synthetic_contract(synth, tmp_path):
    cfg, paths = synth
    infos = load_infos(paths["infos"])
    unlab = load_infos(paths["unlab_infos"])
    test_infos = load_infos(paths["test_infos"])

    rows = (_manifest_rows_from_infos(infos, "labeled", with_scalars=True)
            + _manifest_rows_from_infos(unlab, "aligned")
            + _manifest_rows_from_infos(test_infos, "test"))
    manifest = tmp_path / "manifest.csv"
    _write_manifest(manifest, rows)

    out = build_index(manifest, tmp_path / "root", seed=0,
                      val_frac=0.2, test_frac=0.2, check_shapes=True)
    got = load_infos(out["infos"])
    assert set(got) == set(infos)
    for pid in infos:
        assert got[pid]["views_images"] == infos[pid]["views_images"]
        assert got[pid]["views_labels"] == infos[pid]["views_labels"]
        assert got[pid]["mPAP"] == pytest.approx(infos[pid]["mPAP"])
        assert got[pid]["dataset_name"] == infos[pid]["dataset_name"]
    got_unlab = load_infos(out["unlab_infos"])
    assert set(got_unlab) == set(unlab)
    got_test = load_infos(out["test_infos"])
    assert set(got_test) == set(test_infos)

    splits = {s: load_split(Path(out["data_list_dir"]) / f"{s}_list.npy")
              for s in ("train", "val", "test")}
    all_ids = splits["train"] + splits["val"] + splits["test"]
    assert sorted(all_ids) == sorted(infos)          # a partition
    assert len(set(all_ids)) == len(all_ids)
    assert len(splits["val"]) == round(len(infos) * 0.2)

    # the rebuilt index drives the real loader
    from glfusion_tpu.data.pipeline import SegFrameLoader
    index = PatientIndex.from_infos(got, cfg.data.use_data)
    loader = SegFrameLoader(index, splits["train"], cfg.model.views, cfg,
                            is_train=True, seed=0)
    batch = next(loader.batches(2))
    assert batch["images_raw"].shape[0] == len(cfg.model.views)


def test_explicit_split_column(synth, tmp_path):
    _, paths = synth
    infos = load_infos(paths["infos"])
    ids = sorted(infos)
    want = {pid: ("val" if i == 0 else "test" if i == 1 else "train")
            for i, pid in enumerate(ids)}
    rows = _manifest_rows_from_infos(infos, "labeled")
    for r in rows:
        r["split"] = want[r["patient_id"]]
    manifest = tmp_path / "m.csv"
    _write_manifest(manifest, rows)
    out = build_index(manifest, tmp_path / "root")
    assert load_split(Path(out["data_list_dir"]) / "val_list.npy") == [ids[0]]
    assert load_split(Path(out["data_list_dir"]) / "test_list.npy") == [ids[1]]


def test_manifest_validation_errors(synth, tmp_path):
    _, paths = synth
    infos = load_infos(paths["infos"])
    rows = _manifest_rows_from_infos(infos, "labeled")

    bad = [dict(rows[0], view="9")]
    _write_manifest(tmp_path / "bad_view.csv", bad)
    with pytest.raises(ValueError, match="view '9'"):
        read_manifest(tmp_path / "bad_view.csv")

    _write_manifest(tmp_path / "bad_kind.csv", [dict(rows[0], kind="wat")])
    with pytest.raises(ValueError, match="kind 'wat'"):
        read_manifest(tmp_path / "bad_kind.csv")

    _write_manifest(tmp_path / "missing.csv",
                    [dict(rows[0], image="/nowhere/x.nii.gz")])
    with pytest.raises(FileNotFoundError, match="nowhere"):
        build_index(tmp_path / "missing.csv", tmp_path / "r")

    _write_manifest(tmp_path / "dup.csv", [rows[0], dict(rows[0])])
    with pytest.raises(ValueError, match="duplicate"):
        build_index(tmp_path / "dup.csv", tmp_path / "r")

    # some-but-not-all explicit splits
    partial = [dict(r) for r in rows]
    partial[0]["split"] = "train"
    _write_manifest(tmp_path / "partial.csv", partial)
    with pytest.raises(ValueError, match="every labeled patient"):
        build_index(tmp_path / "partial.csv", tmp_path / "r")


def test_check_shapes_rejects_wrong_test_clip(synth, tmp_path):
    _, paths = synth
    infos = load_infos(paths["infos"])
    # a labeled (H, W, T) volume mislabeled as a test clip must fail the
    # (1, H, W, T) contract check
    rows = _manifest_rows_from_infos(infos, "test")[:1]
    _write_manifest(tmp_path / "m.csv", rows)
    with pytest.raises(ValueError, match=r"\(1, H, W, T\)"):
        build_index(tmp_path / "m.csv", tmp_path / "r", check_shapes=True)


def test_trainer_derives_clip_split_for_user_ids(synth, tmp_path, monkeypatch):
    """test_infos without reference 0_* ids still gets the 2/8-style clip
    eval (trainer derives a deterministic split)."""
    from glfusion_tpu.train.trainer import Trainer

    cfg, paths = synth
    test_infos = load_infos(paths["test_infos"])
    renamed = {f"clinic_{i:02d}": rec
               for i, rec in enumerate(test_infos.values())}
    np.save(tmp_path / "test_infos.npy", renamed)
    data_paths = dict(paths, test_infos=str(tmp_path / "test_infos.npy"))

    trainer = Trainer(cfg, data_paths=data_paths, verbose=False)
    seen = {}
    monkeypatch.setattr(
        trainer, "evaluate_clips",
        lambda ids, name: seen.setdefault(name, list(ids)) or {"dice": 0.0})
    monkeypatch.setattr(
        trainer, "evaluate_val_frames", lambda: {"loss": 0.0})
    trainer.validation_and_test()
    ids = sorted(renamed)
    assert seen["Inner-val"] == ids[:2]      # 10 clips → 2 val
    assert seen["Inner-test"] == ids[2:]
    assert set(seen["Inner-val"]) | set(seen["Inner-test"]) == set(ids)

    # MIXED ids: reference-named clips keep the reference split AND the
    # user clips still get evaluated (not silently dropped)
    mixed = dict(renamed)
    mixed["0_0"] = next(iter(renamed.values()))   # one reference val clip
    trainer.test_infos = mixed
    seen.clear()
    trainer.validation_and_test()
    extra = sorted(renamed)                        # the 10 user clips
    assert seen["Inner-val"] == ["0_0"] + extra[:2]
    assert seen["Inner-test"] == extra[2:]
    assert (set(seen["Inner-val"]) | set(seen["Inner-test"])) == set(mixed)

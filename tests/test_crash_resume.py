"""Failure recovery under a hard crash: SIGKILL mid-training, then resume.

The reference's only recovery story is manual (``is_load`` → ``load()``,
reference ``main.py:74,153,823-855``) and its checkpoints are whatever
``torch.save`` left behind — a crash mid-save leaves a truncated ``.pth``
that the resume then crashes on. Our checkpoint backends write atomically
(tmp dir + rename / orbax commit), so a process killed with SIGKILL at ANY
moment — including mid-save — must leave a directory from which
``--resume`` continues cleanly.

This drives the REAL CLI in a subprocess (not an in-process Trainer): the
kill exercises the whole chain — async checkpoint threads dying mid-write,
the tmp-dir scan on restart, epoch continuation, and the final durable
flush.
"""

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _subprocess_env():
    """Env for the CLI subprocess: single-device CPU. The conftest exports
    ``--xla_force_host_platform_device_count=8`` for in-process sharding
    tests; inheriting it would run the subprocess 8-way data-parallel on
    this 1-core box (~10× slower — past the test deadline)."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    flags = env.get("XLA_FLAGS", "").split()
    flags = [f for f in flags
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _durable_epochs(save_dir: Path):
    """Epochs visible to restore_latest: completed flax ``epoch_XXXXX``
    dirs or orbax integer step dirs (in-flight ``.tmp_*`` dirs excluded,
    exactly like the backends' own scans)."""
    if not save_dir.exists():
        return []
    eps = []
    for p in save_dir.iterdir():
        if not p.is_dir():
            continue
        if p.name.startswith("epoch_") and (p / "state.msgpack").exists():
            eps.append(int(p.name[len("epoch_"):]))
        elif p.name.isdigit():
            eps.append(int(p.name))
    return sorted(eps)


def test_sigkill_mid_training_then_resume(tmp_path):
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = tiny_config()
    data_root = tmp_path / "data"
    generate_synthetic_dataset(data_root, cfg.data, views=cfg.model.views,
                               seed=0)

    save_dir = tmp_path / "ckpt"

    def cmd(save_to):
        return [
            sys.executable, "-m", "glfusion_tpu.cli",
            "--mode", "train", "--tiny", "--platform", "cpu",
            "--data-root", str(data_root),
            "--save-every", "1", "--eval-every", "100", "--no-cycle",
            "--save-dir", str(save_to), "--log-dir", str(tmp_path / "log"),
        ]

    base = cmd(save_dir)
    env = _subprocess_env()
    # flax backend: each checkpoint is ONE msgpack file, so the bitwise
    # kill+resume == uninterrupted comparison below is a byte comparison
    env["GLFUSION_CKPT_BACKEND"] = "flax"

    # ---- run 1: ask for many epochs, SIGKILL once a checkpoint is durable
    proc = subprocess.Popen(base + ["--epochs", "50"], cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 900
        while time.time() < deadline:
            if _durable_epochs(save_dir):
                break
            if proc.poll() is not None:
                pytest.fail("training exited before its first checkpoint:\n"
                            + proc.stdout.read().decode())
            time.sleep(0.5)
        else:
            pytest.fail("no durable checkpoint within the deadline")
        # let the run get INTO the next epoch so the kill lands mid-flight
        time.sleep(1.0)
    finally:
        proc.kill()  # SIGKILL: no atexit, no checkpoint flush, no cleanup
        proc.stdout.close()
        proc.wait()

    survived = _durable_epochs(save_dir)
    assert survived, "kill-time durable set vanished"

    # ---- run 2: --resume must restore the newest survivor and finish
    target_epochs = max(survived) + 3
    out = subprocess.run(
        base + ["--epochs", str(target_epochs), "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"restored checkpoint at epoch {max(survived) + 1}" \
        in out.stdout, out.stdout

    final = _durable_epochs(save_dir)
    # every pre-crash checkpoint survives, and the resumed run completed
    # (and checkpointed) each remaining epoch up to the new target
    assert set(survived) <= set(final)
    assert final[-1] == target_epochs - 1, (survived, final)

    # ---- run 3: resume-trajectory FIDELITY, not just availability. Step
    # RNG keys are a pure function of (seed, epoch, step) (fold_in, see
    # Trainer.__init__) and the loaders are epoch-keyed, so the killed+
    # resumed trajectory must be indistinguishable from an uninterrupted
    # run: the final checkpoints (params + batch_stats + opt_state, one
    # msgpack each under the flax backend) agree BYTE FOR BYTE.
    solo_dir = tmp_path / "ckpt_uninterrupted"
    out3 = subprocess.run(
        cmd(solo_dir) + ["--epochs", str(target_epochs)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out3.returncode == 0, out3.stdout + out3.stderr
    last = f"epoch_{target_epochs - 1:05d}"
    resumed_bytes = (save_dir / last / "state.msgpack").read_bytes()
    solo_bytes = (solo_dir / last / "state.msgpack").read_bytes()
    assert resumed_bytes == solo_bytes, (
        "kill+resume diverged from the uninterrupted trajectory "
        f"(epoch {target_epochs - 1} checkpoints differ)")


def test_sigkill_then_resume_orbax_backend(tmp_path):
    """Crash durability on the DEFAULT (orbax) backend: SIGKILL mid-train
    must leave a directory --resume continues from. Availability-only
    assertions — the bitwise-fidelity comparison lives in the flax run
    above (one msgpack per epoch makes it a byte compare); this run keeps
    the orbax commit protocol itself under kill coverage."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = tiny_config()
    data_root = tmp_path / "data"
    generate_synthetic_dataset(data_root, cfg.data, views=cfg.model.views,
                               seed=0)
    save_dir = tmp_path / "ckpt"
    base = [
        sys.executable, "-m", "glfusion_tpu.cli",
        "--mode", "train", "--tiny", "--platform", "cpu",
        "--data-root", str(data_root),
        "--save-every", "1", "--eval-every", "100", "--no-cycle",
        "--save-dir", str(save_dir), "--log-dir", str(tmp_path / "log"),
    ]
    env = _subprocess_env()
    env["GLFUSION_CKPT_BACKEND"] = "orbax"

    proc = subprocess.Popen(base + ["--epochs", "50"], cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 900
        while time.time() < deadline:
            if _durable_epochs(save_dir):
                break
            if proc.poll() is not None:
                pytest.fail("training exited before its first checkpoint:\n"
                            + proc.stdout.read().decode())
            time.sleep(0.5)
        else:
            pytest.fail("no durable checkpoint within the deadline")
        time.sleep(1.0)  # land the kill mid-flight in the next epoch
    finally:
        proc.kill()
        proc.stdout.close()
        proc.wait()

    survived = _durable_epochs(save_dir)
    assert survived, "kill-time durable set vanished"

    target_epochs = max(survived) + 2
    out = subprocess.run(
        base + ["--epochs", str(target_epochs), "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"restored checkpoint at epoch {max(survived) + 1}" \
        in out.stdout, out.stdout
    final = _durable_epochs(save_dir)
    assert set(survived) <= set(final)
    assert final[-1] == target_epochs - 1, (survived, final)


def test_sigterm_graceful_epoch_boundary_stop(tmp_path):
    """Preemption handling: SIGTERM finishes the in-flight epoch,
    checkpoints it OFF the save cadence, and exits 0; --resume continues
    from exactly that epoch (Trainer.request_stop via the CLI's handler)."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = tiny_config()
    data_root = tmp_path / "data"
    generate_synthetic_dataset(data_root, cfg.data, views=cfg.model.views,
                               seed=0)

    save_dir = tmp_path / "ckpt"
    log_dir = tmp_path / "log"
    base = [
        sys.executable, "-m", "glfusion_tpu.cli",
        "--mode", "train", "--tiny", "--platform", "cpu",
        "--data-root", str(data_root),
        # save-every 100: the ONLY checkpoint can come from the graceful stop
        "--save-every", "100", "--eval-every", "100", "--no-cycle",
        "--save-dir", str(save_dir), "--log-dir", str(log_dir),
    ]
    env = _subprocess_env()
    metrics = log_dir / "metrics.jsonl"

    proc = subprocess.Popen(base + ["--epochs", "50"], cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 900
    while time.time() < deadline:  # wait until at least one epoch completed
        if metrics.exists() and metrics.read_text().strip():
            break
        if proc.poll() is not None:
            pytest.fail("training exited early:\n" + proc.stdout.read())
        time.sleep(0.5)
    else:
        proc.kill()
        proc.wait()
        pytest.fail("no completed epoch within the deadline")

    proc.terminate()  # SIGTERM — the preemption signal
    try:
        out, _ = proc.communicate(timeout=600)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        pytest.fail("SIGTERM did not stop the run within the grace window")
    assert proc.returncode == 0, out
    assert "stop requested: checkpointed epoch" in out, out

    survived = _durable_epochs(save_dir)
    assert len(survived) == 1, survived  # exactly the off-cadence save

    # resume picks up at the stopped epoch + 1 and completes cleanly
    target_epochs = survived[0] + 2
    out2 = subprocess.run(
        base + ["--epochs", str(target_epochs), "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert f"restored checkpoint at epoch {survived[0] + 1}" in out2.stdout


def test_inprocess_resume_with_cycle_matches_uninterrupted(tmp_path):
    """Resume-trajectory fidelity WITH the cycle loss on (the CLI bitwise
    test above runs --no-cycle): an interrupted-at-epoch-2 run resumed in
    a FRESH Trainer must reach epoch 4 with params and batch_stats
    bitwise identical to an uninterrupted 4-epoch run — pinning the
    fold_in key derivation across BOTH forwards (augmentation/dropout and
    the per-view cycle sampling) plus the checkpoint round-trip."""
    import dataclasses

    import jax
    import numpy as np

    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.train.trainer import Trainer

    cfg = tiny_config()
    paths = generate_synthetic_dataset(tmp_path / "data", cfg.data,
                                       views=cfg.model.views, seed=0)

    def make_cfg(tag):
        return dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, use_cycle=True, mesh_data=1,
            save_every_epochs=1, eval_every_epochs=100,
            save_dir=str(tmp_path / tag / "ckpt"),
            log_dir=str(tmp_path / tag / "log")))

    def fetch(tr):
        return (jax.device_get(tr.state.params),
                jax.device_get(tr.state.batch_stats))

    solo = Trainer(make_cfg("solo"), data_paths=paths, verbose=False)
    solo.train(4)
    params_a, stats_a = fetch(solo)

    first = Trainer(make_cfg("split"), data_paths=paths, verbose=False)
    first.train(2)
    resumed = Trainer(make_cfg("split"), data_paths=paths, verbose=False)
    assert resumed.load_latest() and resumed.epoch == 2
    resumed.train(4)
    params_b, stats_b = fetch(resumed)

    for (tree_a, tree_b, what) in ((params_a, params_b, "params"),
                                   (stats_a, stats_b, "batch_stats")):
        flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(tree_b))
        assert len(flat_a) == len(flat_b) > 0
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=f"{what} {path}")

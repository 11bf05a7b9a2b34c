"""CheckpointManager backends: flax-msgpack fallback + orbax (when healthy).

The facade replaces the reference's ``torch.save``/``latest.ckpt`` flow
(``main.py:857-872``); these tests pin the contract both backends share:
async saves become durable after ``wait()``, epochs restore exactly,
retention bounds disk, and a format mismatch fails loudly.
"""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

import glfusion_tpu.utils.checkpoint as ckpt_mod
from glfusion_tpu.utils.checkpoint import CheckpointManager
from glfusion_tpu.train.train_state import TrainState


def _state(val: float) -> TrainState:
    params = {"w": jnp.full((4, 4), val), "b": jnp.zeros(4)}
    return TrainState.create(
        apply_fn=lambda *a: None, params=params, tx=optax.adam(1e-3),
        batch_stats={"mean": jnp.full(4, 2.0 * val)})


@pytest.fixture
def flax_backend(monkeypatch):
    monkeypatch.setenv("GLFUSION_CKPT_BACKEND", "flax")
    monkeypatch.setattr(ckpt_mod, "_ORBAX_OK", None)
    yield
    monkeypatch.setattr(ckpt_mod, "_ORBAX_OK", None)


@pytest.mark.smoke
def test_flax_roundtrip_and_latest(tmp_path, flax_backend):
    cm = CheckpointManager(str(tmp_path / "ck"))
    assert cm.backend == "flax"
    cm.save(_state(1.0), 0)
    cm.save(_state(7.0), 5)
    cm.wait()
    assert cm.all_steps() == [0, 5]

    restored, next_epoch = cm.restore_latest(_state(0.0))
    assert next_epoch == 6
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    np.testing.assert_allclose(np.asarray(restored.batch_stats["mean"]), 14.0)
    # optimizer state restores as the same pytree structure
    assert jnp.asarray(restored.opt_state[0].count).shape == ()

    r0 = cm.restore_step(_state(0.0), 0)
    np.testing.assert_allclose(np.asarray(r0.params["w"]), 1.0)
    assert cm.restore_step(_state(0.0), 99) is None


def test_flax_empty_dir_restores_none(tmp_path, flax_backend):
    cm = CheckpointManager(str(tmp_path / "empty"))
    assert cm.restore_latest(_state(0.0)) is None
    assert cm.all_steps() == []


def test_flax_async_fifo_many_saves(tmp_path, flax_backend):
    """Rapid overlapping async saves all land; the newest epoch wins
    restore_latest (FIFO writer — no lost or interleaved checkpoints)."""
    cm = CheckpointManager(str(tmp_path / "fifo"))
    for e in range(6):
        cm.save(_state(float(e)), e)
    cm.wait()
    assert cm.all_steps() == list(range(6))
    restored, nxt = cm.restore_latest(_state(0.0))
    assert nxt == 6
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 5.0)


def test_flax_max_to_keep(tmp_path, flax_backend):
    cm = CheckpointManager(str(tmp_path / "keep"), max_to_keep=2)
    for e in range(5):
        cm.save(_state(float(e)), e, wait=True)
    assert cm.all_steps() == [3, 4]


def test_flax_resave_same_epoch_overwrites(tmp_path, flax_backend):
    cm = CheckpointManager(str(tmp_path / "re"))
    cm.save(_state(1.0), 3, wait=True)
    cm.save(_state(9.0), 3, wait=True)
    assert cm.all_steps() == [3]
    r = cm.restore_step(_state(0.0), 3)
    np.testing.assert_allclose(np.asarray(r.params["w"]), 9.0)


def test_flax_rejects_orbax_format_dir(tmp_path, flax_backend):
    d = tmp_path / "orbax_like"
    (d / "42").mkdir(parents=True)
    cm = CheckpointManager(str(d))
    with pytest.raises(RuntimeError, match="orbax-format"):
        cm.all_steps()


def test_existing_flax_dir_stays_flax(tmp_path, flax_backend, monkeypatch):
    """A directory written by the flax backend is reopened as flax even if
    a later process has a healthy orbax — format follows the data (unless
    the user forces a backend, tested below)."""
    cm = CheckpointManager(str(tmp_path / "sticky"))
    cm.save(_state(4.0), 1, wait=True)
    # now pretend orbax is importable, with NO explicit override
    monkeypatch.delenv("GLFUSION_CKPT_BACKEND", raising=False)
    monkeypatch.setattr(ckpt_mod, "_ORBAX_OK", True)
    cm2 = CheckpointManager(str(tmp_path / "sticky"))
    assert cm2.backend == "flax"
    r, nxt = cm2.restore_latest(_state(0.0))
    assert nxt == 2
    np.testing.assert_allclose(np.asarray(r.params["w"]), 4.0)


def test_env_override_beats_flax_marker(tmp_path, flax_backend, monkeypatch):
    """GLFUSION_CKPT_BACKEND=orbax must win over a stale flax marker —
    it is the documented remedy when a transient probe failure wrote the
    marker into an orbax checkpoint directory."""
    cm0 = CheckpointManager(str(tmp_path / "d"))  # flax forced by fixture
    cm0.save(_state(1.0), 0, wait=True)  # first SAVE writes the marker
    assert (tmp_path / "d" / "GLFUSION_FLAX_CKPT").exists()
    monkeypatch.setenv("GLFUSION_CKPT_BACKEND", "orbax")
    monkeypatch.setattr(ckpt_mod, "_ORBAX_OK", None)
    try:
        import orbax.checkpoint  # noqa: F401
    except Exception:
        pytest.skip("orbax unavailable on this install")
    cm = CheckpointManager(str(tmp_path / "d"))
    assert cm.backend == "orbax"


def test_flax_backend_refuses_multiprocess(tmp_path, flax_backend,
                                           monkeypatch):
    """The flax fallback snapshots with jax.device_get (per-process) —
    multi-host runs must get a clear error, not a crash at the first
    save of process-spanning shards."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(RuntimeError, match="single-process"):
        CheckpointManager(str(tmp_path / "mp"))


def test_flax_restore_recommits_shardings(tmp_path, flax_backend):
    """Restore must place leaves back on the template's NamedShardings
    (msgpack yields host numpy) so a mesh-sharded state resumes sharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glfusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    state = _state(3.0)
    sharding = NamedSharding(mesh, P("model"))
    sharded = state.replace(
        params={"w": jax.device_put(state.params["w"], sharding),
                "b": state.params["b"]})
    cm = CheckpointManager(str(tmp_path / "sh"))
    cm.save(sharded, 0, wait=True)
    restored = cm.restore_step(sharded, 0)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.0)
    assert restored.params["w"].sharding == sharding
    assert restored.params["w"].sharding.spec == P("model")


@pytest.mark.smoke
def test_orbax_roundtrip_when_available(tmp_path):
    if not ckpt_mod._orbax_available():
        pytest.skip("orbax unavailable on this install")
    cm = CheckpointManager(str(tmp_path / "ob"))
    assert cm.backend == "orbax"
    cm.save(_state(3.0), 2, wait=True)
    r, nxt = cm.restore_latest(_state(0.0))
    assert nxt == 3
    np.testing.assert_allclose(np.asarray(r.params["w"]), 3.0)


def test_flax_wait_reraises_write_failure(tmp_path, flax_backend):
    """A writer-thread failure (e.g. ENOSPC) must surface from wait() —
    matching orbax's wait_until_finished — instead of letting a run
    'complete' with zero durable checkpoints."""
    cm = CheckpointManager(str(tmp_path / "ck"))
    orig_write = cm._impl._write

    def boom(host, epoch):
        raise OSError("disk full")

    cm._impl._write = boom
    cm.save(_state(1.0), 0)
    with pytest.raises(RuntimeError, match="disk full"):
        cm.wait()
    # the failure is one-shot: once surfaced, healthy saves work again
    cm._impl._write = orig_write
    cm.save(_state(2.0), 1)
    cm.wait()
    assert cm.all_steps() == [1]


def test_flax_marker_written_on_first_save_not_construction(
        tmp_path, flax_backend):
    """Constructing the flax backend (e.g. after a TRANSIENT orbax probe
    failure) must not flip an existing directory to flax format; only an
    actual flax save writes the marker."""
    d = tmp_path / "ck"
    cm = CheckpointManager(str(d))
    assert not (d / "GLFUSION_FLAX_CKPT").exists()
    cm.save(_state(1.0), 0)
    cm.wait()
    assert (d / "GLFUSION_FLAX_CKPT").exists()


def test_orbax_probe_stamp_skips_subprocess(tmp_path, monkeypatch):
    """A prior successful probe is stamped under the package cache dir so
    later processes skip the multi-second subprocess import."""
    monkeypatch.delenv("GLFUSION_CKPT_BACKEND", raising=False)
    monkeypatch.setenv("GLFUSION_JIT_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(ckpt_mod, "_ORBAX_OK", None)
    stamp = ckpt_mod._probe_stamp_path()
    assert stamp is not None  # orbax is installed in the test env
    stamp.parent.mkdir(parents=True, exist_ok=True)
    stamp.touch()

    def no_subprocess(*a, **k):
        raise AssertionError("stamped probe must skip the subprocess")

    monkeypatch.setattr(ckpt_mod.subprocess, "run", no_subprocess)
    assert ckpt_mod._orbax_available() is True

"""Checkpointing: params + batch stats + optimizer state + epoch.

Replaces the reference's ``torch.save({'network': state_dict})`` +
``latest.ckpt`` text pointer (``main.py:857-872``) with atomic, async-capable
checkpoints that also persist optimizer state (the reference dropped it
— its resume was silently wrong; we keep it).

Two interchangeable backends behind one ``CheckpointManager`` facade:

* **orbax** — the default when importable. Chosen for its sharded-array
  support and ecosystem compatibility.
* **flax** — a self-contained fallback using ``flax.serialization``
  msgpack + atomic directory renames. No dependency beyond flax/jax.
  Same interface, same async-save semantics (device→host snapshot happens
  synchronously inside ``save()`` so donated-buffer reuse by later train
  steps cannot corrupt the data; serialization + disk write happen on a
  background thread, serialized FIFO).

Backend selection is SIGBUS-safe: ``import orbax`` is probed in a
*subprocess* first, because a partially damaged install (e.g. unreadable
pages in a bundled ``.so``) kills the importing process with an uncatchable
signal rather than raising ImportError. Override with
``GLFUSION_CKPT_BACKEND={orbax,flax,auto}``.

The two formats are distinguishable on disk: flax checkpoints are
``epoch_<n>/state.msgpack`` directories with a ``GLFUSION_FLAX_CKPT``
marker file; orbax steps are bare-integer directories. ``restore`` of a
directory written by the other backend raises with a clear message.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Tuple

_ORBAX_OK: Optional[bool] = None


def _probe_stamp_path() -> Optional[Path]:
    """Stamp file recording a successful probe, keyed on the install.

    ``find_spec`` locates the package without executing it (so a damaged
    .so cannot hurt us here); the origin path + mtime key invalidates the
    stamp when orbax is reinstalled. Only SUCCESS is persisted — a failed
    probe may be transient (subprocess timeout on a loaded host) and must
    not poison later processes.
    """
    import importlib.util
    try:
        spec = importlib.util.find_spec("orbax.checkpoint")
    except Exception:
        return None
    if spec is None or not spec.origin:
        return None
    key = f"{spec.origin}:{os.path.getmtime(spec.origin)}"
    cache_dir = Path(os.environ.get(
        "GLFUSION_JIT_CACHE_DIR",
        os.path.expanduser("~/.cache/glfusion_jax")))
    import hashlib
    h = hashlib.sha256(key.encode()).hexdigest()[:16]
    return cache_dir / f"orbax_probe_ok_{h}"


def _orbax_available() -> bool:
    """Probe ``import orbax.checkpoint`` in a subprocess (cached).

    A direct in-process import of a damaged install can die with SIGBUS
    (mmap'd .so pages backed by unreadable disk sectors) — uncatchable.
    The subprocess absorbs the crash and reports via exit code. A
    successful probe is stamped under the package cache dir so later
    processes skip the multi-second subprocess import entirely.
    """
    global _ORBAX_OK
    if _ORBAX_OK is None:
        forced = os.environ.get("GLFUSION_CKPT_BACKEND", "auto").lower()
        if forced == "orbax":
            _ORBAX_OK = True
        elif forced == "flax":
            _ORBAX_OK = False
        else:
            stamp = _probe_stamp_path()
            if stamp is None:
                _ORBAX_OK = False  # find_spec says orbax is not installed
            elif stamp.exists():
                _ORBAX_OK = True
            else:
                try:
                    proc = subprocess.run(
                        [sys.executable, "-c",
                         "import orbax.checkpoint"],
                        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                        timeout=120,
                        env={**os.environ, "JAX_PLATFORMS": "cpu"},
                    )
                    _ORBAX_OK = proc.returncode == 0
                except Exception:
                    _ORBAX_OK = False
                if _ORBAX_OK:
                    try:
                        stamp.parent.mkdir(parents=True, exist_ok=True)
                        stamp.touch()
                    except OSError:
                        pass
    return _ORBAX_OK


_STATE_KEYS = ("params", "batch_stats", "opt_state", "step")
_FLAX_MARKER = "GLFUSION_FLAX_CKPT"


def _payload(state) -> dict:
    return {k: getattr(state, k) for k in _STATE_KEYS}


class _OrbaxBackend:
    def __init__(self, directory: Path, max_to_keep: Optional[int]):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, payload: dict, epoch: int) -> None:
        self._mgr.save(epoch, args=self._ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def all_steps(self) -> list:
        self._mgr.wait_until_finished()
        return sorted(int(s) for s in self._mgr.all_steps())

    def restore(self, template: dict, step: int) -> Optional[dict]:
        """Restore step's payload against ``template``'s structure.

        Return-type contract: leaves whose template carries a mesh
        NamedSharding come back as committed global ``jax.Array``s;
        every OTHER leaf (opt-state scalars, or whole trees when the
        caller's template holds plain single-device arrays) comes back
        as UNCOMMITTED host numpy. Callers must not rely on committed
        device arrays for those leaves — placement resolves at the next
        jit exactly like a freshly-created state's (see the comment
        below for why this is load-bearing on multi-process meshes).
        """
        self._mgr.wait_until_finished()
        if step not in set(self._mgr.all_steps()):
            return None
        restored = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template))

        # Orbax restores every leaf as a COMMITTED device array. Leaves
        # whose template carries a mesh NamedSharding (params/batch_stats
        # placed by shard_variables, Adam mu/nu that followed them) come
        # back correctly global — but replicated host-created scalars
        # (e.g. optax count, created eagerly and uncommitted) come back
        # pinned to one process-local device. A jit mixing those with
        # mesh-global arrays fails on multi-process meshes ("incompatible
        # devices"). Return such leaves as host numpy — uncommitted, so
        # the next step's placement resolves them exactly like the fresh
        # state's (tests/test_multiprocess.py checkpoint round-trip).
        import jax
        from jax.sharding import NamedSharding

        def _uncommit(t, r):
            template_named = (isinstance(t, jax.Array)
                              and isinstance(t.sharding, NamedSharding))
            if (isinstance(r, jax.Array) and not template_named
                    and len(r.sharding.device_set) == 1):
                return jax.device_get(r)
            return r

        return jax.tree_util.tree_map(_uncommit, template, restored)


class _FlaxBackend:
    """Msgpack checkpoints with atomic renames and a FIFO writer thread.

    Layout: ``<dir>/epoch_<n>/state.msgpack`` (+ a marker file). A save
    first materializes device arrays on host (inside ``save()``, before
    returning — donation safety), then hands the host pytree to a single
    background thread that serializes and writes to ``.tmp_epoch_<n>``
    and atomically renames. Readers only ever see complete checkpoints.
    """

    def __init__(self, directory: Path, max_to_keep: Optional[int]):
        import jax
        if jax.process_count() > 1:
            # save() snapshots with jax.device_get, which cannot fetch
            # shards on another process's devices; restore() returns host
            # numpy. Only orbax handles process-spanning arrays.
            raise RuntimeError(
                "the flax checkpoint fallback is single-process only; "
                "multi-host runs need the orbax backend "
                "(GLFUSION_CKPT_BACKEND=orbax on a healthy install)")
        self.directory = directory
        self.directory.mkdir(parents=True, exist_ok=True)
        self._max_to_keep = max_to_keep
        self._lock = threading.Lock()
        self._pending: list = []
        self._error: Optional[BaseException] = None

    def _write(self, host_payload: dict, epoch: int) -> None:
        from flax import serialization
        # The format marker is written with the FIRST actual flax save —
        # not at construction — so a backend instance created by a
        # transient orbax probe failure cannot flip an existing orbax
        # directory to flax before any flax data exists.
        (self.directory / _FLAX_MARKER).touch()
        data = serialization.to_bytes(host_payload)
        tmp = self.directory / f".tmp_epoch_{epoch:05d}"
        final = self.directory / f"epoch_{epoch:05d}"
        tmp.mkdir(exist_ok=True)
        (tmp / "state.msgpack").write_bytes(data)
        if final.exists():
            import shutil
            shutil.rmtree(final)
        tmp.rename(final)
        if self._max_to_keep is not None:
            steps = self._scan_steps()
            for old in steps[:-self._max_to_keep]:
                import shutil
                shutil.rmtree(self.directory / f"epoch_{old:05d}",
                              ignore_errors=True)

    def save(self, payload: dict, epoch: int) -> None:
        import jax
        host = jax.device_get(payload)  # snapshot BEFORE buffers are reused
        t = threading.Thread(target=self._serialized_write,
                             args=(host, epoch), daemon=True)
        with self._lock:
            self._pending.append(t)
        t.start()

    def _serialized_write(self, host, epoch):
        # FIFO: wait for every thread queued before me.
        with self._lock:
            idx = self._pending.index(threading.current_thread())
            earlier = self._pending[:idx]
        for t in earlier:
            t.join()
        try:
            self._write(host, epoch)
        except BaseException as e:  # surfaced by the next wait()
            with self._lock:
                if self._error is None:
                    self._error = e
        finally:
            with self._lock:
                self._pending.remove(threading.current_thread())

    def wait(self) -> None:
        """Block until all queued saves are durable; re-raise the first
        writer-thread failure (matching orbax's wait_until_finished —
        a full disk must not let a run 'complete' with no checkpoints)."""
        while True:
            with self._lock:
                pending = list(self._pending)
            if not pending:
                break
            for t in pending:
                t.join()
        with self._lock:
            err, self._error = self._error, None
        if err is not None:
            raise RuntimeError(
                f"async checkpoint save failed: {err!r}") from err

    def _scan_steps(self) -> list:
        steps = []
        for p in self.directory.iterdir():
            if p.is_dir() and p.name.startswith("epoch_"):
                try:
                    steps.append(int(p.name[len("epoch_"):]))
                except ValueError:
                    pass
            elif p.is_dir() and p.name.isdigit():
                raise RuntimeError(
                    f"{self.directory} contains orbax-format checkpoints "
                    f"({p.name}/) but the orbax backend is unavailable; "
                    "set GLFUSION_CKPT_BACKEND=orbax on a healthy install "
                    "or start a fresh checkpoint directory.")
        return sorted(steps)

    def all_steps(self) -> list:
        self.wait()
        return self._scan_steps()

    def restore(self, template: dict, step: int) -> Optional[dict]:
        self.wait()
        path = self.directory / f"epoch_{step:05d}" / "state.msgpack"
        if not path.exists():
            return None
        import jax
        from flax import serialization
        restored = serialization.from_bytes(template, path.read_bytes())

        # from_bytes yields host numpy; re-commit each leaf to its
        # template's sharding so a mesh-sharded state resumes sharded
        # (the orbax path restores into the sharded template natively)
        def _place(t, r):
            if isinstance(t, jax.Array):
                return jax.device_put(r, t.sharding)
            return r

        return jax.tree_util.tree_map(_place, template, restored)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        """``max_to_keep=None`` (default) keeps every saved epoch — the
        reference writes net_{epoch:05}.pth per epoch and its sweep
        (main.py:316-323) selects the best epoch >= 50 over all of them,
        so bounded retention would silently shrink the sweep candidates.
        Pass an int (cfg.train.ckpt_keep / --ckpt-keep) to bound disk."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        # Explicit GLFUSION_CKPT_BACKEND beats the on-disk marker (the
        # marker is written by any flax-backend construction, including
        # one forced by a transient orbax probe failure — the documented
        # remedy "set GLFUSION_CKPT_BACKEND=orbax" must actually work).
        # With no override, an existing flax-format dir stays flax even
        # if orbax is healthy.
        forced = os.environ.get("GLFUSION_CKPT_BACKEND", "auto").lower()
        if forced == "orbax":
            use_flax = False
        elif forced == "flax":
            use_flax = True
        else:
            use_flax = ((self.directory / _FLAX_MARKER).exists()
                        or not _orbax_available())
        if use_flax:
            self.backend = "flax"
            self._impl = _FlaxBackend(self.directory, max_to_keep)
        else:
            self.backend = "orbax"
            self._impl = _OrbaxBackend(self.directory, max_to_keep)

    def save(self, state, epoch: int, wait: bool = False) -> None:
        """Checkpoint the full train state at ``epoch``.

        Async by default: device arrays are snapshotted to host inside
        ``save()`` (so later donated-buffer reuse by train steps cannot
        corrupt the data) and serialized/written in the background —
        training continues while the previous checkpoint hits disk.
        Overlapping saves are serialized. ``wait=True`` (or ``wait()``)
        blocks until everything is durable; every read path below waits
        first.
        """
        self._impl.save(_payload(state), epoch)
        if wait:
            self._impl.wait()

    def wait(self) -> None:
        """Block until all in-flight async saves are durable on disk."""
        self._impl.wait()

    def all_steps(self) -> list:
        """Sorted saved epochs (the sweep-eval substrate, main.py:316-323)."""
        return self._impl.all_steps()

    def restore_step(self, state, step: int):
        """Restore one specific epoch's state (or None).

        Leaf placement follows the backend's contract: mesh-sharded
        leaves (template = NamedSharding jax.Array) return committed and
        global; all other leaves may return as uncommitted host numpy
        and are placed by the next jitted step — do not assume device
        residency on the returned state (``_OrbaxBackend.restore``)."""
        restored = self._impl.restore(_payload(state), step)
        if restored is None:
            return None
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_latest(self, state) -> Optional[Tuple[object, int]]:
        steps = self._impl.all_steps()
        if not steps:
            return None
        step = steps[-1]
        new_state = self.restore_step(state, step)
        return new_state, int(step) + 1

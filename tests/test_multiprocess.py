"""Multi-process (multi-host) training.

Extends the virtual-device sharding proofs (test_parallel.py) across REAL
process boundaries: two jax.distributed CPU processes, one device each,
run one Trainer epoch on the same synthetic corpus, once as a data=2
data-parallel mesh and once as a model=2 tensor-parallel mesh (parameter
shards living on different PROCESSES). Both must agree with each other AND
with a single-process run — the multi-host equivalent of the reference's
never-functional multi-process scaffolding (reference main.py:951-963).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# A micro-topology child: compile time must stay small so the two ranks
# reach their collectives within the transport's rendezvous window on a
# contended 1-core host (initialize_distributed also syncs right after
# bring-up for the same reason).
_CHILD = """
import dataclasses, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from glfusion_tpu.utils.cluster import initialize_distributed
initialize_distributed(port=int(sys.argv[3]))
mesh_model = int(sys.argv[4])
from glfusion_tpu.parallel import sharding
# the micro widths below must still exercise real tensor-parallel sharding
sharding._MIN_SHARD_DIM = 4
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=1, use_cycle=False, mesh_model=mesh_model,
        save_dir=sys.argv[2] + "/ckpt", log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=100))
tr = Trainer(cfg, data_paths=paths, verbose=False)
assert tr.mesh.shape["model"] == mesh_model
assert tr.mesh.shape["data"] * mesh_model == jax.device_count()
m = tr._train_epoch(0)
# the serving path: logits fetch must work when shards span processes
# (Trainer._fetch -> process_allgather) and only the lead rank writes
written = tr.infer(out_dir=sys.argv[2] + "/preds")
print("RESULT", json.dumps({"loss": m["loss"], "dice": m["dice"],
                            "steps": m["steps"], "written": written,
                            "nproc": jax.process_count()}), flush=True)
"""


# Checkpoint round-trip child: train 1 epoch on a (data=1, model=2) mesh
# whose parameter shards SPAN the two processes, save via orbax (the only
# backend that handles process-spanning leaves; the flax fallback refuses),
# restore into a FRESH Trainer, verify bitwise equality of the restored
# params across the process boundary, and continue one more epoch.
_CHILD_CKPT = """
import dataclasses, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from glfusion_tpu.utils.cluster import initialize_distributed
initialize_distributed(port=int(sys.argv[3]))
mesh_model = int(sys.argv[4])
ckpt_dir = sys.argv[5]  # SHARED across ranks (orbax collective save)
from glfusion_tpu.parallel import sharding
sharding._MIN_SHARD_DIM = 4
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=1, use_cycle=False, mesh_model=mesh_model,
        save_dir=ckpt_dir, log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=1))
tr = Trainer(cfg, data_paths=paths, verbose=False)
assert tr.ckpt.backend == "orbax", tr.ckpt.backend
m1 = tr.train()  # epoch 0 + collective orbax save + wait

tr2 = Trainer(cfg, data_paths=paths, verbose=False)
assert tr2.load_latest() and tr2.epoch == 1, tr2.epoch

# restored process-spanning shards must equal the saved state exactly
import numpy as np
flat_a = jax.tree_util.tree_leaves_with_path(tr.state.params)
flat_b = dict(jax.tree_util.tree_leaves_with_path(tr2.state.params))
assert len(flat_a) == len(flat_b) > 0
for path, leaf in flat_a:
    np.testing.assert_array_equal(
        np.asarray(tr._fetch(leaf)), np.asarray(tr2._fetch(flat_b[path])),
        err_msg=str(path))
assert int(tr2.state.step) == int(tr.state.step) > 0

m2 = tr2._train_epoch(1)
print("RESULT", json.dumps({"loss0": m1["loss"], "loss1": m2["loss"],
                            "steps": m2["steps"],
                            "nproc": jax.process_count()}), flush=True)
"""

# Cross-process-count restore child: restore the checkpoint the 2-process
# pair saved into a SINGLE process (mesh model=1) and continue an epoch —
# elastic restart with a different topology.
_CHILD_RESTORE_1PROC = """
import dataclasses, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
ckpt_dir = sys.argv[5]
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=2, use_cycle=False, mesh_model=1,
        save_dir=ckpt_dir, log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=1))
tr = Trainer(cfg, data_paths=paths, verbose=False)
assert tr.load_latest() and tr.epoch == 1, tr.epoch
m = tr._train_epoch(1)
print("RESULT", json.dumps({"loss1": m["loss"], "steps": m["steps"],
                            "nproc": jax.process_count()}), flush=True)
"""


# Grow-elastic children (1 → 2 processes): a SINGLE process saves epoch 0;
# a 2-process pair restores that checkpoint into a mesh whose shards span
# the processes and continues epoch 1 — the first path a real pod
# scale-up hits. The solo-continuation child gives the reference
# trajectory the grown pair must reproduce.
_CHILD_SAVE_1PROC = """
import dataclasses, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
ckpt_dir = sys.argv[5]
from glfusion_tpu.parallel import sharding
sharding._MIN_SHARD_DIM = 4
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=1, use_cycle=False, mesh_model=1,
        save_dir=ckpt_dir, log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=1))
tr = Trainer(cfg, data_paths=paths, verbose=False)
m = tr.train()  # epoch 0 + save + wait
print("RESULT", json.dumps({"loss0": m["loss"], "steps": m["steps"],
                            "nproc": jax.process_count()}), flush=True)
"""

_CHILD_GROW_2PROC = """
import dataclasses, json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from glfusion_tpu.utils.cluster import initialize_distributed
initialize_distributed(port=int(sys.argv[3]))
mesh_model = int(sys.argv[4])
ckpt_dir = sys.argv[5]
from glfusion_tpu.parallel import sharding
sharding._MIN_SHARD_DIM = 4
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=2, use_cycle=False, mesh_model=mesh_model,
        save_dir=ckpt_dir, log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=100))
tr = Trainer(cfg, data_paths=paths, verbose=False)
assert tr.mesh.shape["data"] * mesh_model == jax.device_count()
assert tr.load_latest() and tr.epoch == 1, tr.epoch
m = tr._train_epoch(1)
print("RESULT", json.dumps({"loss1": m["loss"], "steps": m["steps"],
                            "nproc": jax.process_count()}), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(paths_file, workdir, port, extra_env, mesh_model=1, child=_CHILD,
         extra_argv=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra_env)
    env.pop("XLA_FLAGS", None)  # children get real 1-device CPU backends
    return subprocess.Popen(
        [sys.executable, "-c", child, paths_file, workdir, str(port),
         str(mesh_model), *map(str, extra_argv)],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _result(proc, timeout=900):
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
        raise AssertionError(
            f"child rank timed out after {timeout}s; "
            f"out={out[-2000:]} err={err[-2000:]}")
    err = "\n".join(l for l in err.splitlines()
                    if "cpu_aot_loader" not in l)
    assert proc.returncode == 0, (proc.returncode, out, err[-4000:])
    line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def _run_pair(paths_file, tmp_path, tag, mesh_model):
    port = _free_port()
    procs = [
        _run(paths_file, str(tmp_path / f"{tag}{r}"), port,
             {"PMI_SIZE": "2", "PMI_RANK": str(r)}, mesh_model=mesh_model)
        for r in range(2)
    ]
    try:
        return [_result(p) for p in procs]
    finally:
        # a rank that failed/timed out must not orphan its partner (which
        # would block forever inside a collective holding the port)
        for p in procs:
            if p.poll() is None:
                p.kill()


@pytest.fixture(scope="module")
def corpus_and_baseline(tmp_path_factory):
    """Synthetic corpus + the single-process reference epoch (run once,
    shared by the data-parallel and tensor-parallel process-pair tests)."""
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    tmp_path = tmp_path_factory.mktemp("mp")
    cfg = tiny_config()
    paths = generate_synthetic_dataset(str(tmp_path / "data"), cfg.data,
                                       views=cfg.model.views, seed=3)
    paths_file = str(tmp_path / "paths.json")
    json.dump(paths, open(paths_file, "w"))

    base = _run(paths_file, str(tmp_path / "base"), _free_port(), {})
    base_res = _result(base)
    assert base_res["nproc"] == 1
    return tmp_path, paths_file, base_res


def _check_pair(results, base_res):
    # infer across process-spanning shards: lead writes the same file set
    # as the single-process run, the other rank writes nothing
    assert base_res["written"] > 0
    assert sorted(r["written"] for r in results) == [0, base_res["written"]]
    for res in results:
        assert res["nproc"] == 2
        assert res["steps"] == base_res["steps"]
        # identical data + global-batch BN under GSPMD ⇒ the distributed
        # epoch reproduces the single-process numbers (f32 reduction-order
        # tolerance only; measured rel. diff ~2e-6 loss, ~6e-4 dice)
        np.testing.assert_allclose(res["loss"], base_res["loss"], rtol=1e-4)
        np.testing.assert_allclose(res["dice"], base_res["dice"], rtol=5e-3)
    # the two ranks are bitwise-identical to each other (same SPMD program)
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["dice"] == results[1]["dice"]


def test_two_process_data_parallel_epoch_matches_single_process(
        corpus_and_baseline):
    tmp_path, paths_file, base_res = corpus_and_baseline
    results = _run_pair(paths_file, tmp_path, "dp_rank", mesh_model=1)
    _check_pair(results, base_res)
    # only the lead process writes logs
    assert (tmp_path / "dp_rank0" / "log").exists()
    assert not (tmp_path / "dp_rank1" / "log").exists()


def test_two_process_tensor_parallel_epoch_matches_single_process(
        corpus_and_baseline):
    """data=1, model=2: every ≥4-channel weight is SPLIT across the two
    processes (the child lowers _MIN_SHARD_DIM to the micro widths), so the
    forward/backward collectives cross a real process boundary."""
    tmp_path, paths_file, base_res = corpus_and_baseline
    results = _run_pair(paths_file, tmp_path, "tp_rank", mesh_model=2)
    _check_pair(results, base_res)


def test_two_process_checkpoint_roundtrip_and_elastic_restore(
        corpus_and_baseline):
    """The one distributed path previously untested: a (model=2) run whose
    parameter shards SPAN the two processes SAVES via orbax on epoch
    cadence, a fresh Trainer pair RESTORES it (restored leaves verified
    bitwise across the process boundary inside the child) and continues —
    then a SINGLE process restores the same 2-process checkpoint (elastic
    process-count change) and its continued epoch matches the 2-process
    pair's within f32 reduction-order tolerance."""
    tmp_path, paths_file, base_res = corpus_and_baseline
    ckpt_dir = str(tmp_path / "shared_ckpt")
    port = _free_port()
    env_extra = {"GLFUSION_CKPT_BACKEND": "orbax"}
    procs = [
        _run(paths_file, str(tmp_path / f"ck_rank{r}"), port,
             {"PMI_SIZE": "2", "PMI_RANK": str(r), **env_extra},
             mesh_model=2, child=_CHILD_CKPT, extra_argv=(ckpt_dir,))
        for r in range(2)
    ]
    try:
        results = [_result(p) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for res in results:
        assert res["nproc"] == 2
        assert res["steps"] == base_res["steps"]
    assert results[0]["loss1"] == results[1]["loss1"]

    # 2-process save → 1-process restore + continue
    solo = _run(paths_file, str(tmp_path / "ck_solo"), _free_port(),
                env_extra, child=_CHILD_RESTORE_1PROC,
                extra_argv=(ckpt_dir,))
    solo_res = _result(solo)
    assert solo_res["nproc"] == 1
    assert solo_res["steps"] == results[0]["steps"]
    np.testing.assert_allclose(solo_res["loss1"], results[0]["loss1"],
                               rtol=1e-4)


@pytest.mark.parametrize("mesh_model", [1, 2],
                         ids=["grow_to_data2", "grow_to_model2"])
def test_grow_elastic_restore_one_to_two_processes(
        corpus_and_baseline, mesh_model):
    """Grow-elastic restart (1 → 2 processes) — the reverse of the shrink
    path above and the first path a real pod scale-up hits: a SINGLE
    process trains epoch 0 and saves; a 2-process pair restores that
    checkpoint into a data=2 (replicated leaves re-placed across ranks)
    or model=2 (leaves RESHARDED across ranks) mesh and continues epoch 1,
    reproducing the single-process continuation trajectory within f32
    reduction-order tolerance."""
    tmp_path, paths_file, _ = corpus_and_baseline
    tag = f"grow{mesh_model}"
    ckpt_dir = str(tmp_path / f"{tag}_ckpt")
    env_extra = {"GLFUSION_CKPT_BACKEND": "orbax"}

    saver = _run(paths_file, str(tmp_path / f"{tag}_save"), _free_port(),
                 env_extra, child=_CHILD_SAVE_1PROC, extra_argv=(ckpt_dir,))
    save_res = _result(saver)
    assert save_res["nproc"] == 1 and save_res["steps"] > 0

    # the reference trajectory: the same checkpoint continued in 1 process
    solo = _run(paths_file, str(tmp_path / f"{tag}_solo"), _free_port(),
                env_extra, child=_CHILD_RESTORE_1PROC,
                extra_argv=(ckpt_dir,))
    solo_res = _result(solo)
    assert solo_res["nproc"] == 1

    port = _free_port()
    procs = [
        _run(paths_file, str(tmp_path / f"{tag}_rank{r}"), port,
             {"PMI_SIZE": "2", "PMI_RANK": str(r), **env_extra},
             mesh_model=mesh_model, child=_CHILD_GROW_2PROC,
             extra_argv=(ckpt_dir,))
        for r in range(2)
    ]
    try:
        results = [_result(p) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for res in results:
        assert res["nproc"] == 2
        assert res["steps"] == solo_res["steps"]
    assert results[0]["loss1"] == results[1]["loss1"]  # same SPMD program
    np.testing.assert_allclose(results[0]["loss1"], solo_res["loss1"],
                               rtol=1e-4)

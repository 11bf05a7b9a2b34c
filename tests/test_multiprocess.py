"""Multi-process (multi-host) data-parallel training.

Extends the virtual-device sharding proofs (test_parallel.py) across REAL
process boundaries: two jax.distributed CPU processes, one device each,
form a data=2 mesh and run one Trainer epoch on the same synthetic corpus.
Both must agree with each other AND with a single-process run — the
multi-host equivalent of the reference's never-functional multi-process
scaffolding (reference main.py:951-963).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

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
from glfusion_tpu.config import tiny_config
from glfusion_tpu.train.trainer import Trainer

paths = json.load(open(sys.argv[1]))
cfg = tiny_config()
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, stem_width=4, widths=(4, 4, 8, 8),
                              aspp_channels=8),
    train=dataclasses.replace(
        cfg.train, num_epochs=1, use_cycle=False,
        save_dir=sys.argv[2] + "/ckpt", log_dir=sys.argv[2] + "/log",
        eval_every_epochs=100, save_every_epochs=100))
tr = Trainer(cfg, data_paths=paths, verbose=False)
assert tr.mesh.shape["data"] == jax.device_count()
m = tr._train_epoch(0)
print("RESULT", json.dumps({"loss": m["loss"], "dice": m["dice"],
                            "steps": m["steps"],
                            "nproc": jax.process_count()}), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(paths_file, workdir, port, extra_env):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra_env)
    env.pop("XLA_FLAGS", None)  # children get real 1-device CPU backends
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD, paths_file, workdir, str(port)],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _result(proc, timeout=900):
    out, err = proc.communicate(timeout=timeout)
    err = "\n".join(l for l in err.splitlines()
                    if "cpu_aot_loader" not in l)
    assert proc.returncode == 0, (proc.returncode, out, err[-4000:])
    line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def test_two_process_train_epoch_matches_single_process(tmp_path):
    from glfusion_tpu.config import tiny_config
    from glfusion_tpu.data.synthetic import generate_synthetic_dataset

    cfg = tiny_config()
    paths = generate_synthetic_dataset(str(tmp_path / "data"), cfg.data,
                                       views=cfg.model.views, seed=3)
    paths_file = str(tmp_path / "paths.json")
    json.dump(paths, open(paths_file, "w"))

    # single-process baseline
    base = _run(paths_file, str(tmp_path / "base"), _free_port(), {})
    base_res = _result(base)
    assert base_res["nproc"] == 1

    # two cooperating processes over a data=2 mesh
    port = _free_port()
    procs = [
        _run(paths_file, str(tmp_path / f"rank{r}"), port,
             {"PMI_SIZE": "2", "PMI_RANK": str(r)})
        for r in range(2)
    ]
    results = [_result(p) for p in procs]
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
    # only the lead process writes logs
    assert (tmp_path / "rank0" / "log").exists()
    assert not (tmp_path / "rank1" / "log").exists()

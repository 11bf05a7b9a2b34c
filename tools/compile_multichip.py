"""AOT-compile the FULL-SIZE sharded train step against an 8-chip v5e mesh.

Proves the multi-chip story at production scale without needing 8 physical
chips: JAX AOT compilation against a device-less TPU topology description
(``jax.experimental.topologies.get_topology_desc('v5e:2x4')``) lowers and
compiles the real 2048-channel Global_and_Local train step — batch 8 +
40-frame cycle clips per view, bf16 compute, per-block remat, fused
device preprocessing (exactly the configuration Trainer runs and
BASELINE.md records single-chip) — for (data, model) meshes (8,1), (4,2),
(2,4), then reports per-chip HBM from ``compiled.memory_analysis()`` and
asserts cross-chip collectives are present in the optimized HLO.

The reference trained multi-device (DataParallel over 4 GPUs, reference
``main.py:155``); this is the TPU-native equivalent evidence: GSPMD
partitioning of one jit graph over an ICI mesh.

Usage:  python tools/compile_multichip.py [--meshes 8x1,4x2,2x4] [--json out]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# Host-side AOT: compile for the TPU topology from a CPU-backend process
# (must run BEFORE any other jax use; see CLAUDE.md on the site-level
# jax import ignoring JAX_PLATFORMS). When imported into an
# already-initialized process (__graft_entry__.compile_multichip), the
# existing backend is kept — AOT against a topology works from any host
# backend.
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _abstract(leaf, sharding):
    return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sharding)


def full_size_config():
    """The recorded benchmark configuration: bf16 + per-block remat."""
    import dataclasses

    from glfusion_tpu.config import Config

    cfg = Config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                       remat=True))


def tiny_wide_config():
    """Tiny topology with TP-shardable (≥256) tail widths — fast compiles
    for the ungated regression test; the full-size run is the evidence."""
    import dataclasses

    from glfusion_tpu.config import tiny_config

    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, widths=(8, 16, 32, 64),
                                  dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, batch_size=8))


def abstract_state_and_batch(cfg, mesh: Mesh):
    """Shape-only TrainState + raw production batch with mesh shardings.

    State leaves get the package sharding rule (parallel/sharding.py
    variable_pspec: channel-shard over 'model' when the last dim is ≥256
    and divisible, else replicate — Adam moments mirror their params).
    Batch leaves shard their batch/frame axis (axis 1) over 'data'.
    """
    from glfusion_tpu.models import GlobalAndLocal
    from glfusion_tpu.parallel.sharding import variable_pspec
    from glfusion_tpu.train.train_state import TrainState, make_optimizer

    model = GlobalAndLocal(cfg.model)
    v = cfg.model.num_views
    hw = cfg.data.crop_hw
    r = cfg.data.resize_hw
    b = cfg.train.batch_size
    t = cfg.data.clip_length

    def build_state():
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((v, 1, hw, hw, 1), jnp.float32),
                               False)
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(cfg, steps_per_epoch=89),
        )

    state_shapes = jax.eval_shape(build_state)
    model_size = mesh.shape["model"]
    state_abs = jax.tree_util.tree_map(
        lambda l: _abstract(
            l, NamedSharding(mesh, variable_pspec(l, model_size))),
        state_shapes)

    def batch_spec(ndim, axis=1):
        spec = [None] * ndim
        spec[axis] = "data"
        return NamedSharding(mesh, P(*spec))

    data_size = mesh.shape["data"]
    assert b % data_size == 0 and t % data_size == 0, (b, t, data_size)
    batch_abs = {
        "images_raw": jax.ShapeDtypeStruct((v, b, r, r), jnp.float32,
                                           sharding=batch_spec(4)),
        "masks_raw": jax.ShapeDtypeStruct((v, b, r, r), jnp.int32,
                                          sharding=batch_spec(4)),
        "clips": jax.ShapeDtypeStruct((v, t, hw, hw, 1), jnp.float32,
                                      sharding=batch_spec(5)),
    }
    rng_abs = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    return model, state_abs, batch_abs, rng_abs


def compile_mesh(cfg, topo_devices, data: int, model_axis: int) -> dict:
    """Lower + compile the production train step for one mesh shape."""
    from glfusion_tpu.train.step import make_train_step

    mesh = Mesh(np.asarray(topo_devices).reshape(data, model_axis),
                axis_names=("data", "model"))
    model, state_abs, batch_abs, rng_abs = abstract_state_and_batch(cfg, mesh)
    # compiler_options=None: the committed evidence is a no-options
    # compile regardless of entry path (standalone forces a CPU platform,
    # where defaults are None anyway; via __graft_entry__ in a
    # TPU-initialized process the default would silently switch to the
    # shipped TPU options and change fusions/HBM peaks)
    step = make_train_step(cfg, model, fuse_preprocess=True,
                           compiler_options=None)

    t0 = time.time()
    lowered = step.lower(state_abs, batch_abs, rng_abs)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    hlo = compiled.as_text()
    # substring counts are upper bounds (op names also appear in fusion
    # labels/metadata); used only as presence evidence + rough magnitude
    colls = {c: hlo.count(c) for c in COLLECTIVES}
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    report = {
        "mesh": f"data={data} model={model_axis}",
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "per_chip_hbm": {
            "arguments_gib": round(ma.argument_size_in_bytes / gib, 3),
            "outputs_gib": round(ma.output_size_in_bytes / gib, 3),
            "temps_gib": round(ma.temp_size_in_bytes / gib, 3),
            "aliased_gib": round(ma.alias_size_in_bytes / gib, 3),
            # peak live ≈ args + temps + outputs − donated(aliased)
            "peak_gib": round((ma.argument_size_in_bytes
                               + ma.temp_size_in_bytes
                               + ma.output_size_in_bytes
                               - ma.alias_size_in_bytes) / gib, 3),
        },
        "generated_code_mib": round(
            ma.generated_code_size_in_bytes / 1024 ** 2, 1),
        "collectives": {k: v for k, v in colls.items() if v},
    }
    assert any(colls.values()) or data * model_axis == 1, (
        f"no cross-chip collectives found in HLO for mesh {data}x{model_axis}")
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="8x1,4x2,2x4")
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--json", default=None, help="write the report here")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny widths (machinery check; minutes not hours)")
    args = ap.parse_args(argv)

    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devices = list(topo.devices)
    print(f"[compile_multichip] topology {args.topology}: "
          f"{len(devices)} devices")

    cfg = tiny_wide_config() if args.tiny else full_size_config()
    reports = []
    for m in args.meshes.split(","):
        d, p = (int(x) for x in m.split("x"))
        assert d * p == len(devices), (m, len(devices))
        print(f"[compile_multichip] compiling mesh data={d} model={p} ...",
              flush=True)
        rep = compile_mesh(cfg, devices, d, p)
        reports.append(rep)
        print(json.dumps(rep), flush=True)
        # write incrementally: one full-size compile is ~45 min on this
        # host, so a timeout mid-sweep must not lose finished meshes
        if args.json:
            out = {"topology": args.topology,
                   "config": "full-size GlobalAndLocal, batch 8 + 40-frame "
                             "clips, bf16, remat, fused preprocess",
                   "meshes": reports}
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps({"compile_multichip": "ok",
                      "meshes": [r["mesh"] for r in reports]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

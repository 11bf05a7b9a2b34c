"""Headline benchmark: multi-view inference throughput of the flagship model.

Measures frames/sec/chip for the full-size Global_and_Local model (3 views,
ResNet-50-IEKD backbones, MGFM+MLFM TPAVI fusion, DeepLab heads) at the
reference's 112×112 input contract — the hot path of reference
``main.py:459-543`` eval (frames-as-batch clip inference).

Timing method: ITERS forward passes run INSIDE one jitted ``lax.scan`` with a
data dependency chaining iterations, and a single scalar is fetched to host.
One dispatch + one transfer — robust against lazy dispatch through remote
device tunnels (naive block_until_ready loops were observed to under-report
by >10× on the axon TPU transport).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}), so the baseline is the BASELINE.json north-star target —
a CPU frames/sec figure measured once with this same harness (BASELINE.md);
the ≥10× target means vs_baseline ≥ 10 when run on a TPU chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# CPU frames/sec measured on the build machine (single-core CPU, f32,
# batch 1×3 views: 4.96 s/step → 0.60 frames/s; BASELINE.md "CPU baseline").
CPU_BASELINE_FPS = 0.60

# throughput-optimal batch (measured: 8→1155, 16→1194, 32→1218 frames/s);
# the reference's train batch is 8 (main.py:914)
BATCH_FRAMES = 32
ITERS = 10


def run(batch: int, iters: int, dtype: str = "bfloat16") -> float:
    from glfusion_tpu.config import Config, ModelConfig
    from glfusion_tpu.models import GlobalAndLocal

    mcfg = Config().model
    mcfg = ModelConfig(**{**mcfg.__dict__, "dtype": dtype})
    model = GlobalAndLocal(mcfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.RandomState(0).rand(mcfg.num_views, batch, 112, 112, 1),
        jnp.float32)
    # jit the init: eager flax init dispatches op-by-op, which is
    # pathologically slow over remote TPU transports (~8x here)
    variables = jax.jit(lambda r: model.init(r, x, False))(rng)

    @jax.jit
    def chained(variables, x):
        def body(carry, _):
            out = model.apply(variables, x + carry, False)["mask"]
            # data-dependency between iterations; numerically ~0
            return jnp.mean(out).astype(x.dtype) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    float(chained(variables, x))  # compile + warm
    t0 = time.perf_counter()
    float(chained(variables, x))  # one dispatch, one scalar fetch
    dt = time.perf_counter() - t0
    frames = mcfg.num_views * batch * iters
    return frames / dt


def main() -> None:
    platform = jax.devices()[0].platform
    if platform == "cpu":
        fps = run(batch=2, iters=2)
    else:
        fps = run(batch=BATCH_FRAMES, iters=ITERS)
    print(json.dumps({
        "metric": "multiview_inference_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()

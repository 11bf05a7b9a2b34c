"""Tracing / timing / numerical-debug harness (SURVEY.md §5).

The reference's only instrumentation is ``cudnn.benchmark=True`` and
``torch.autograd.set_detect_anomaly(True)`` (reference ``main.py:37,41``).
The TPU-native equivalents:

  * ``trace(logdir)`` — ``jax.profiler`` context; view with TensorBoard or
    xprof. Captures XLA op breakdown + HBM traffic.
  * ``time_fn(fn, *args)`` — honest wall-clock for a jitted fn: runs
    ``iters`` calls INSIDE one jitted ``lax.scan`` with a scalar data
    dependency and fetches one scalar. Robust against lazy dispatch through
    remote device transports, where naive ``block_until_ready`` loops were
    measured to under-report by >10×.
  * ``debug_nans(enable)`` — flips ``jax_debug_nans`` (the anomaly-detect
    analogue: re-runs the offending primitive un-jitted and raises).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: ``with trace('/tmp/prof'): run_step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def time_fn(fn: Callable[..., Any], *args, iters: int = 10,
            warmup: bool = True) -> float:
    """Seconds per call of ``fn(*args)`` measured on-device.

    fn must return a pytree of arrays. The loop carry is threaded INTO
    EVERY floating input leaf of every iteration (``leaf + carry``), so the
    call has a true loop-carried dependency no matter which inputs the fn
    actually reads: XLA can neither hoist it out of the scan (it is not
    loop-invariant) nor overlap/elide iterations. Perturbing only the first
    leaf was measured to be unsound — e.g. a flax train-mode apply flattens
    ``batch_stats`` leaves first and never reads them (BN uses batch
    statistics), leaving the carry dead and the whole body hoisted (a
    144-frame forward "measured" 20 ms vs its real 118 ms). The per-leaf
    adds cost one extra elementwise pass over the inputs — usually well
    under 1 ms — and the carry value is ~1e-30·mean(out), numerically
    invisible. The carry also folds into every output leaf, so no part of
    the body's output tree is dead.
    """

    @jax.jit
    def chained(*a):
        leaves, treedef = jax.tree_util.tree_flatten(a)
        if not leaves:
            raise ValueError("time_fn needs at least one array argument")

        def body(carry, _):
            per = [
                jnp.asarray(l) + carry.astype(l.dtype)
                if jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact)
                else l
                for l in leaves
            ]
            if not any(jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact)
                       for l in leaves):
                # all-integer inputs: even an int cast of the carry creates
                # the loop dependency (else the body is hoistable)
                l0 = jnp.asarray(per[0])
                per[0] = l0 + carry.astype(l0.dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, per))
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc += jnp.mean(jnp.asarray(leaf).astype(jnp.float32))
            return acc * 1e-30, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    if warmup:
        float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / iters


def consume_state(tot: jnp.ndarray, state) -> jnp.ndarray:
    """Fold EVERY train-state output into a benchmark scalar.

    A chained-scan timing harness must consume params AND batch_stats at
    the scan output: the cycle forward's head computations are live only
    through their BN running-stat updates, so a dead batch_stats output
    lets XLA dead-code-eliminate ~5 TFLOP/step of real training work (the
    'full' and cycle_light graphs then time identically — the r2
    benchmark-DCE bug). Used by bench.py and the tools/ harnesses so the
    rule lives in one place.
    """
    for leaf in jax.tree_util.tree_leaves(state.params):
        tot = tot + jnp.max(jnp.abs(leaf)).astype(jnp.float32)
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        tot = tot + jnp.mean(leaf).astype(jnp.float32)
    return tot


def flops_of(fn: Callable[..., Any], *args) -> float | None:
    """XLA cost-analysis FLOP count of one ``fn(*args)`` call (or None)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops")) if ca else None
    except Exception:
        return None

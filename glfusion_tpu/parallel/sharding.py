"""Sharding rules: data-parallel batches + tensor-parallel channel sharding.

Strategy (scaling-book style): pick the mesh, annotate leaf shardings, let
GSPMD insert the collectives.

  * Batches shard their batch axis over ``data``. Model inputs are stacked
    views (V, B, H, W, C) → B is axis 1.
  * Large parameter tensors shard their output-channel (last) axis over
    ``model`` when it is big enough and divisible; everything else is
    replicated. This tensor-parallelizes the 2048-channel backbone tail,
    the DeepLab heads, and the TPAVI projections, where the FLOPs live.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Minimum channel count worth sharding over the model axis.
_MIN_SHARD_DIM = 256


def device_put_global(leaf, sharding: NamedSharding):
    """``device_put`` that also works when the mesh spans processes.

    Single-process: plain ``jax.device_put``. Multi-process (multi-host
    SPMD): every process holds the FULL host value — same-seed determinism
    makes init/batch values identical across processes — and contributes
    the shards its addressable devices own via ``make_array_from_callback``.
    This is the multi-host idiom of the reference's (never-functional)
    multi-process scaffolding (main.py:951-963); each host re-decodes the
    full batch, which costs duplicated host CPU but no ICI/DCN traffic.
    """
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    arr = np.asarray(leaf)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def variable_pspec(leaf: jax.Array, model_axis_size: int) -> P:
    """PartitionSpec for one parameter / batch-stat leaf."""
    if (model_axis_size > 1
            and leaf.ndim >= 1
            and leaf.shape[-1] >= _MIN_SHARD_DIM
            and leaf.shape[-1] % model_axis_size == 0):
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its rule sharding (params, stats, etc.)."""
    model_size = mesh.shape["model"]

    def put(leaf):
        spec = variable_pspec(leaf, model_size)
        return device_put_global(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, variables)


def batch_sharding(mesh: Mesh, batch_axis: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 1) -> Any:
    """Shard every array in a batch pytree along ``batch_axis`` over 'data'.

    Stacked-view tensors are (V, B, ...): the batch axis is 1. Arrays with
    a batch dim not divisible by the data axis are replicated.
    """
    data_size = mesh.shape["data"]

    def put(leaf):
        if leaf.ndim > batch_axis and leaf.shape[batch_axis] % data_size == 0:
            return device_put_global(
                leaf, batch_sharding(mesh, batch_axis, leaf.ndim))
        return device_put_global(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)

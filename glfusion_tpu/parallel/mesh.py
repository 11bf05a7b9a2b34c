"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=-1`` consumes all devices not used by ``model``. A single device
    yields a trivial 1×1 mesh, so all code paths are mesh-agnostic.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model < 1:
        model = 1
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh (data={data}, model={model}) needs {data * model} "
            f"devices but only {n} are available")
    if data * model != n:
        # under-subscription is only safe single-process: in a multi-process
        # run the excluded devices' processes would still enter the same
        # jit and hang its collectives
        if jax.process_count() > 1:
            raise ValueError(
                f"mesh (data={data}, model={model}) uses {data * model} of "
                f"{n} global devices; multi-process runs must use ALL "
                f"devices (every process enters the same program)")
        devices = devices[: data * model]
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))

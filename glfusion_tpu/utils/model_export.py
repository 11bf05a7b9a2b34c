"""Ahead-of-time model export: the serving forward as a StableHLO artifact.

The reference has no deployment story — serving means carrying the whole
PyTorch codebase plus a ``net_XXXXX.pth`` and rebuilding ``Global_and_Local``
in Python (reference ``main.py:454-457``). TPU-native deployment does
better: ``jax.export`` serializes the jitted serving forward — weights
baked in as constants, a **symbolic frame axis** so any clip length runs
without retracing, and multi-platform lowering (``cpu`` + ``tpu``) in one
artifact — to a self-contained directory that
:func:`load_serving_forward` can run **without any model code, flax, or
the checkpoint**.

Artifact layout (a directory):

  * ``serving_fn.jaxexp`` — the serialized ``jax.export.Exported``;
  * ``meta.json`` — shape/IO contract + provenance (views, crop size,
    class count, platforms, jax version).

The exported contract matches the online serving pipeline
(:class:`glfusion_tpu.serve.ClipPipeline`): input ``(V, T, H, W, 1)``
float32 in [0, 1] (already preprocessed frames), output
``(V, T, H, W, num_classes)`` uint8 thresholded masks (sigmoid > 0.5 ==
logits > 0 — the reference eval's rule, ``main.py:518-519``).

Only the FRAME axis is symbolic. The spatial dims are pinned to
``hw × hw`` (default ``cfg.data.crop_hw`` — the reference's test clips
are pre-extracted at 112², ``Test_Seg_PAHDataset``): spatial shape
polymorphism was probed and does not lower — the backbone's
stride/dilation arithmetic produces size-dependent branches that
``jax.export`` reports as inconclusive symbolic comparisons even under
``h >= 32``-style constraints. Serve clips at the exported size (the
meta records it as ``input_hw``; the serving path validates it with a
clear error), or re-export with ``hw=`` for a different size.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import Config

_BLOB = "serving_fn.jaxexp"
_META = "meta.json"


def make_serving_forward(model, variables) -> Callable:
    """The serving forward with weights closed over (baked as constants
    at export time): (V, T, H, W, 1) f32 → (V, T, H, W, C) uint8."""
    def forward(images):
        out = model.apply(variables, images, False)
        return (out["mask"] > 0.0).astype(jnp.uint8)
    return forward


def export_serving_forward(
        cfg: Config, model, variables,
        platforms: Sequence[str] = ("cpu", "tpu"),
        frames: Optional[int] = None,
        hw: Optional[int] = None):
    """Export the serving forward as a ``jax.export.Exported``.

    ``frames=None`` exports a symbolic frame axis (any T at runtime);
    an int pins it (smaller search space for very old runtimes).
    ``hw`` pins the spatial size (default ``cfg.data.crop_hw``; see the
    module docstring for why it cannot be symbolic). Weights are fetched
    to host first so they serialize as module constants regardless of
    their current device/sharding.
    """
    from jax import export as jax_export

    variables = jax.device_get(variables)
    fwd = make_serving_forward(model, variables)
    v = cfg.model.num_views
    hw = cfg.data.crop_hw if hw is None else int(hw)
    if frames is None:
        (t,) = jax_export.symbolic_shape("t")
    else:
        t = int(frames)
    spec = jax.ShapeDtypeStruct((v, t, hw, hw, 1), jnp.float32)
    return jax_export.export(jax.jit(fwd), platforms=tuple(platforms))(spec)


def save_exported(exported, path: str, cfg: Config) -> Dict[str, Any]:
    """Serialize ``exported`` + a meta.json contract into directory
    ``path``; returns the meta dict."""
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    blob = exported.serialize()
    (out / _BLOB).write_bytes(blob)
    in_shape = exported.in_avals[0].shape
    meta = {
        "format": "glfusion_tpu.jax_export.v1",
        "input": {"shape": ["V", "T", "H", "W", 1], "dtype": "float32",
                  "range": "[0, 1] preprocessed frames"},
        "output": {"shape": ["V", "T", "H", "W", "C"], "dtype": "uint8",
                   "meaning": "per-structure masks, sigmoid > 0.5"},
        "num_views": cfg.model.num_views,
        "views": list(cfg.model.views),
        "input_hw": int(in_shape[2]),  # pinned spatial size (H == W)
        "crop_hw": cfg.data.crop_hw,
        "num_classes": cfg.model.num_classes,
        "platforms": list(exported.platforms),
        "symbolic_frames": not isinstance(in_shape[1], (int, np.integer)),
        # the pinned frame count when not symbolic (serving pads to it)
        "frames": (int(in_shape[1])
                   if isinstance(in_shape[1], (int, np.integer)) else None),
        "jax_version": jax.__version__,
        "serialized_bytes": len(blob),
    }
    (out / _META).write_text(json.dumps(meta, indent=2))
    return meta


def load_serving_forward(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an export directory → ``(forward, meta)``.

    ``forward(images)`` accepts a (V, T, H, W, 1) float32 array (numpy or
    jax) and returns (V, T, H, W, C) uint8 masks. Needs only jax — no
    model code, flax, or checkpoint files.
    """
    from jax import export as jax_export

    root = Path(path)
    blob_file = root / _BLOB
    if not blob_file.exists():
        raise FileNotFoundError(
            f"{path} is not a glfusion_tpu export directory "
            f"(missing {_BLOB})")
    exported = jax_export.deserialize(blob_file.read_bytes())
    meta: Dict[str, Any] = {}
    meta_file = root / _META
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())

    # jit once: Exported.call builds a fresh traced callable per
    # invocation; under jit the artifact is traced/cached per input shape
    # (one entry per distinct T with the symbolic frame axis)
    call = jax.jit(exported.call)

    def forward(images):
        return call(jnp.asarray(images, jnp.float32))

    return forward, meta

"""Layer-by-layer activation capture for checkpoint-parity debugging.

SURVEY.md §7.3 calls for an activation-diff harness against the PyTorch
reference. This captures every flax module's output under its dotted path
so a user with the reference environment can diff stage by stage:

    variables = load_torch_checkpoint("net_00088.pth", cfg.model)
    acts = capture_activations(GlobalAndLocal(cfg.model), variables, x)
    np.savez("jax_acts.npz", **acts)  # compare against torch hooks

The reference-side recipe (torch): register forward hooks on the modules
named in utils/torch_convert.py's mapping and save outputs under the same
dotted names.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def capture_activations(model, variables, x, train: bool = False,
                        **apply_kwargs) -> Dict[str, np.ndarray]:
    """Run ``model.apply`` with intermediates capture; returns a flat
    {dotted/module/path: output array} dict (first output per module)."""
    out, state = model.apply(
        variables, x, train, capture_intermediates=True,
        mutable=["intermediates"], **apply_kwargs)
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, tuple):
            # flax stores intermediates as a tuple of call outputs
            first = tree[0] if tree else None
            if isinstance(first, jnp.ndarray):
                flat[prefix] = np.asarray(first)
            elif isinstance(first, dict):
                for k, v in first.items():
                    if isinstance(v, jnp.ndarray):
                        flat[f"{prefix}.{k}"] = np.asarray(v)
        elif isinstance(tree, jnp.ndarray):
            flat[prefix] = np.asarray(tree)

    walk(state["intermediates"], "")
    if isinstance(out, dict):
        for k, v in out.items():
            if isinstance(v, jnp.ndarray):
                flat[f"__output__.{k}"] = np.asarray(v)
    return flat


def diff_activations(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
                     atol: float = 1e-4) -> Dict[str, float]:
    """Max-abs differences for keys present in both dumps; sorted worst-first."""
    diffs = {}
    for k in sorted(set(a) & set(b)):
        if a[k].shape != b[k].shape:
            diffs[k] = float("inf")
        else:
            diffs[k] = float(np.max(np.abs(a[k].astype(np.float64)
                                           - b[k].astype(np.float64))))
    return dict(sorted(diffs.items(), key=lambda kv: -kv[1]))

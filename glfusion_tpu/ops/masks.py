"""Label remapping into the unified 5-structure channel space.

The reference builds per-view binary channels by thresholding the raw
integer label map and then scatters them into the global (RA, RV, LA, LV, PA)
space (``datasets/loader.py:296-316`` + ``mask_to_allclass`` at ``:358-414``).
Here the two steps collapse into one static gather table applied on device —
raw label value → global channel index (or -1 for background):

  view '1' (PLAX):  1→LV(3), 2→RV(1)
  view '2' (PA-LAX): 1→PA(4)
  view '3' (PSAX):  1→LV(3), 2→RV(1)
  view '4' (A4C):   1→LV(3), 2→LA(2), 3→RA(0), 4→RV(1)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glfusion_tpu.config import ALL_VIEWS, NUM_CLASSES

_MAX_RAW_LABEL = 4

# channel index per (view, raw label value); -1 = background.
_TABLE = {
    "1": {1: 3, 2: 1},
    "2": {1: 4},
    "3": {1: 3, 2: 1},
    "4": {1: 3, 2: 2, 3: 0, 4: 1},
}


def view_label_table() -> np.ndarray:
    """(num_views, max_raw_label+1) int table of global channel ids (-1=bg)."""
    table = -np.ones((len(ALL_VIEWS), _MAX_RAW_LABEL + 1), dtype=np.int32)
    for vi, view in enumerate(ALL_VIEWS):
        for raw, ch in _TABLE[view].items():
            table[vi, raw] = ch
    return table


_TABLE_ARR = view_label_table()


def mask_to_allclass(raw_mask: jnp.ndarray, view: str | jnp.ndarray) -> jnp.ndarray:
    """Map an integer label map (..., H, W) to (..., H, W, NUM_CLASSES) float one-hot.

    ``view`` is a view name ('1'..'4') or a traced int index into ALL_VIEWS,
    so the op stays jit-friendly when views are a batched axis.
    """
    if isinstance(view, str):
        view_idx = ALL_VIEWS.index(view)
    else:
        view_idx = view
    table = jnp.asarray(_TABLE_ARR)
    raw = raw_mask.astype(jnp.int32)
    # out-of-range raw values map to BACKGROUND, like the reference's
    # exact-equality tests (loader.py:358-414 torch.where(mask==value));
    # clipping them into the table would invent foreground for unknown
    # labels. Negative values likewise.
    in_range = (raw >= 0) & (raw <= _MAX_RAW_LABEL)
    chan = table[view_idx][jnp.clip(raw, 0, _MAX_RAW_LABEL)]
    chan = jnp.where(in_range, chan, -1)  # (..., H, W) channel id or -1
    return (chan[..., None] == jnp.arange(NUM_CLASSES)).astype(jnp.float32)

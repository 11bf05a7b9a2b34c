"""TensorBoard summaries (reference ``main.py:147,874-883`` add_summary).

The reference logs scalars/images/histograms via tensorboardX. Here a thin
writer wraps ``torch.utils.tensorboard`` when importable (torch-cpu ships in
the image) and degrades to a JSONL-only no-op otherwise — the JSONL metrics
log (trainer.py) is always written regardless.
"""

from __future__ import annotations

import numpy as np


class SummaryWriter:
    """add_scalar / add_image / add_histogram with a no-op fallback."""

    def __init__(self, log_dir: str):
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter
        except Exception:
            return  # no torch: silent JSONL-only mode (documented fallback)
        try:
            self._tb = TBWriter(log_dir=log_dir)
        except Exception as e:  # torch present but writer failed: SAY so
            import sys
            print(f"[glfusion] TensorBoard writer disabled "
                  f"({type(e).__name__}: {e}); metrics.jsonl still written",
                  file=sys.stderr)

    @property
    def active(self) -> bool:
        return self._tb is not None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_image(self, tag: str, img_hwc: "np.ndarray", step: int) -> None:
        """img_hwc: (H, W, C) float [0,1] or uint8 (reference logs HWC)."""
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(img_hwc), step,
                               dataformats="HWC")

    def add_histogram(self, tag: str, values, step: int) -> None:
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

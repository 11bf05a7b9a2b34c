"""Image / logging helpers (reference ``utils/helpers.py``).

``maybe_download`` keeps the reference's local-cache contract but without
network egress: it resolves only files already present in the cache
directory (the reference fetched torchvision model-zoo weights). To start
training from the reference's ImageNet-pretrained backbone, point
``--imagenet-backbone`` at a local torchvision resnet50 ``.pth``
(``utils/imagenet_init``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

IMG_SCALE = 1.0 / 255
IMG_MEAN = np.array([0.485, 0.456, 0.406]).reshape((1, 1, 3))
IMG_STD = np.array([0.229, 0.224, 0.225]).reshape((1, 1, 3))

logger = None


def print_log(message) -> None:
    """Print + optional file logger (reference helpers.py:15-19)."""
    print(message, flush=True)
    if logger:
        logger.write(str(message) + "\n")


def maybe_download(model_name: str, model_url: str,
                   model_dir: Optional[str] = None):
    """Resolve a cached checkpoint; NO network fetch (reference :21-36
    downloaded from the torchvision model zoo — this build is egress-free).

    Returns the loaded state dict if ``<model_dir>/<model_name>.pth.tar``
    exists, else raises FileNotFoundError naming the expected path.
    """
    if model_dir is None:
        torch_home = os.path.expanduser(os.getenv("TORCH_HOME", "~/.torch"))
        model_dir = os.getenv("TORCH_MODEL_ZOO",
                              os.path.join(torch_home, "models"))
    cached = Path(model_dir) / f"{model_name}.pth.tar"
    if not cached.exists():
        raise FileNotFoundError(
            f"pretrained weights not cached at {cached} (url was "
            f"{model_url}); this build does not download — place the file "
            "there manually if pretrained init is required")
    import torch

    return torch.load(str(cached), map_location="cpu")


def prepare_img(img: np.ndarray) -> np.ndarray:
    """ImageNet normalization of an (H, W, 3) uint8 image (reference :38)."""
    return (img * IMG_SCALE - IMG_MEAN) / IMG_STD


def make_validation_img(img: np.ndarray, lab: np.ndarray,
                        pre: np.ndarray) -> np.ndarray:
    """Side-by-side [image | label | prediction] uint8 panel.

    Reference :42-62 composed image/depth/label/pred with a cmap file; the
    echo variant drops the depth stream and colors classes via the
    visualization LUT.
    """
    from glfusion_tpu.utils.visualize import COLOR_TABLE

    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    img8 = np.clip(img * 255 if img.max() <= 1.0 else img,
                   0, 255).astype(np.uint8)
    lab_rgb = COLOR_TABLE[np.asarray(lab, np.int64)][..., :3]
    pre_rgb = COLOR_TABLE[np.asarray(pre, np.int64)][..., :3]
    return np.concatenate([img8, lab_rgb, pre_rgb], axis=1)

"""Trainable-architecture name tuples (import-light).

Lives OUTSIDE the models package (whose __init__ imports the whole flax
zoo) so the CLI can build its ``--model`` choices without paying that
import chain; ``models/registry.py`` re-exports these.
"""

AVS_FLAVORS = ("baseline", "transfusion", "model17", "pred_endecoder")
LEGACY_KINDS = ("none", "channel_transformer", "tpavi", "model18", "model20",
                "decouple", "mlp_concat")
SEG_ARCHS = (("glfusion", "unet", "multiview_unet", "utnet", "cen")
             + tuple(f"avs_{f}" for f in AVS_FLAVORS)
             + tuple(f"legacy:{k}" for k in LEGACY_KINDS))

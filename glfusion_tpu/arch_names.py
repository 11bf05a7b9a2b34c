"""Trainable-architecture name tuples (import-light).

Lives OUTSIDE the models package (whose __init__ imports the whole flax
zoo) so the CLI can build its ``--model`` choices without paying that
import chain; ``models/registry.py`` re-exports these.
"""

AVS_FLAVORS = ("baseline", "transfusion", "model17", "pred_endecoder")
LEGACY_KINDS = ("none", "channel_transformer", "tpavi", "model18", "model20",
                "decouple", "mlp_concat")
# models/unet.py family (reference models/unet.py:138/204/276/349); plain
# `unet` stays the ours.py baseline_unet, `unet:plain` is U_Net proper
UNET_KINDS = ("plain", "r2", "att", "r2att")
SEG_ARCHS = (("glfusion", "unet", "multiview_unet", "utnet", "cen",
              "res3dunet")
             + tuple(f"unet:{k}" for k in UNET_KINDS)
             + tuple(f"avs_{f}" for f in AVS_FLAVORS)
             + tuple(f"legacy:{k}" for k in LEGACY_KINDS))

"""Configuration dataclasses.

Every literal in the reference's inline config dict (reference
``main.py:909-949``) and its hard-coded hyperparameters (Adam lr/wd at
``main.py:162-169``, cosine T_max at ``main.py:168``, input/crop sizes at
``datasets/loader.py:474-475``, center-aware weight at ``models/ours.py:1709``)
becomes a named default here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


# Global 5-structure channel space: (RA, RV, LA, LV, PA).
# Reference: datasets/loader.py:358-414 (mask_to_allclass) and the view
# comments at datasets/loader.py:363-384.
STRUCTURES = ("RA", "RV", "LA", "LV", "PA")
NUM_CLASSES = len(STRUCTURES)

# Views: '1' = parasternal LV long-axis (PLAX), '2' = PA long-axis,
# '3' = LV short-axis (PSAX), '4' = apical four-chamber (A4C).
ALL_VIEWS = ("1", "2", "3", "4")

# Per-view native label channel count (reference models/ours.py:1711).
VIEW_OUT_CHANNELS = {"1": 2, "2": 1, "3": 2, "4": 4}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the Global_and_Local model (reference models/ours.py:1708-1843).

    Defaults reproduce the reference exactly; the width/depth knobs exist so
    tests can instantiate tiny variants with the same topology.
    """

    views: Sequence[str] = ("1", "3", "4")
    num_classes: int = NUM_CLASSES
    # ResNet-50 backbone (torchvision topology, reference models/segmentation.py:100-102)
    stem_width: int = 64
    block_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    expansion: int = 4
    # replace_stride_with_dilation=[False, True, True] → layer3/4 stride 1,
    # dilations grow 1→2→4 (reference models/segmentation.py:102).
    dilate_stages: Sequence[bool] = (False, False, True, True)
    # DeepLab ASPP head (reference models/deeplabv3.py:102-166)
    aspp_rates: Sequence[int] = (12, 24, 36)
    aspp_channels: int = 256
    aspp_dropout: float = 0.5
    # TPAVI fusion (reference models/ours.py:770-917): inter = in // 2
    tpavi_inter_channels: int | None = None
    # Center-aware local masking weight (reference models/ours.py:1709,1815)
    center_aware_weight: float = 20.0
    # Model variant switch — config-driven ablations (reference models/ours.py
    # Global_only :1999, Local_only :2113, conv_merge :2766, cyc_nofusion :2628,
    # early_fusion :2251, late_fusion :2317, fg_bg :2887).
    variant: str = "global_and_local"
    # Trainable architecture family (models/registry.py): the flagship or a
    # baseline from the zoo adapted to the same multi-view contract.
    arch: str = "glfusion"  # glfusion|unet|multiview_unet|utnet|cen
    # Compute dtype for conv/matmul (params stay fp32).
    dtype: str = "float32"
    # Use the fused Pallas non-local attention kernel (naive contraction
    # order, bit-faithful to the reference). Default False: the reassociated
    # O(N·C'²) contraction (ops/nonlocal_attn.py) is mathematically equal and
    # cheaper; flip on for parity-exact eval or when benchmarks favor it.
    use_pallas_fusion: bool = False
    # (A fused Pallas stem kernel attacking the stride-1-stem bandwidth
    # floor was built and measured a NET LOSS at every design point; the
    # closed book lives in experiments/ + BASELINE.md "stem kernel book".)
    # Rematerialize backbone stages to trade FLOPs for HBM (28×28×2048 maps).
    remat: bool = False
    # Per-stage remat override (len == len(block_sizes)); None → every stage
    # when remat=True. Lets the cheap-to-recompute, activation-heavy early
    # stages remat while late stages keep their activations (or vice versa).
    remat_stages: Sequence[bool] | None = None

    @property
    def backbone_out_channels(self) -> int:
        return self.widths[-1] * self.expansion

    @property
    def num_views(self) -> int:
        return len(self.views)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline contract (reference datasets/loader.py)."""

    root: str | None = None  # dataset root with .nii.gz files; None → synthetic
    infos_path: str = "infos/save_infos_reg_v2.npy"
    unlab_infos_path: str = "infos/infos_unlab.npy"
    test_infos_path: str = "infos/test_infos.npy"
    data_list_dir: str = "data_list"
    use_data: Sequence[str] = ("rmyy",)  # center selection (main.py:930)
    # Resize→crop protocol (datasets/loader.py:474-475)
    resize_hw: int = 144
    crop_hw: int = 112
    clip_length: int = 40  # main.py:917
    # regression (PAHDataset) clip frame count (loader.py:157: spatial_size
    # (144,144,48))
    reg_clip_frames: int = 48
    # Train dataset epoch multiplier (datasets/loader.py: __len__ ×4)
    train_repeat: int = 4
    # synthetic-data knobs (when root is None)
    synthetic_num_patients: int = 16
    synthetic_raw_hw: int = 160
    synthetic_num_frames: int = 48


@dataclasses.dataclass(frozen=True)
class OptConfig:
    """Optimizer (reference main.py:162-169, 933-938)."""

    name: str = "adam"
    lr: float = 3e-4
    weight_decay: float = 1e-5  # torch Adam-style L2 (added to grad pre-moments)
    betas: Sequence[float] = (0.9, 0.999)
    cosine_t_max: int = 100  # epochs (main.py:168)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop (reference main.py:909-949, 172-277)."""

    batch_size: int = 8
    num_epochs: int = 100
    seed: int = 6666  # reference fixed seed (datasets/loader.py:32-33)
    test_views: Sequence[str] = ("1", "3", "4")
    # cycle loss (main.py:215-237, 650-798)
    use_cycle: bool = True
    dense_cyc: bool = False
    cycle_weight: float = 1e-2
    # The cycle forward computes only f4_global (backbone + global
    # attention), skipping the heads whose outputs the cycle loss discards
    # — identical loss math; only the skipped heads' BN running stats stop
    # updating on cycle frames. Measured −14 % per step at full size on
    # v5e (0.319 vs 0.372 s, BASELINE.md; an earlier "neutral" finding
    # compared two graphs both silently dead-code-eliminated by an unsound
    # benchmark harness). glfusion arch only.
    cycle_light: bool = False
    # Per-pass rematerialization: when model.remat is on, remat exists to
    # fit the 120-frame cycle pass in HBM; the small supervised pass
    # (batch·V frames) can keep its activations and skip the backward
    # recompute. False → the supervised forward runs through a no-remat
    # twin module sharing the same parameter tree (bit-exact — nn.remat
    # recomputes identical math; tests/test_losses.py
    # ::test_per_pass_remat_step_is_exact). Measured in BASELINE.md
    # (tools/bench_pass_remat.py).
    remat_supervised: bool = True
    # Fused supervised+cycle forward: concatenate the supervised batch and
    # the cycle clip on the frame axis and run ONE backbone(+global
    # attention) pass per step instead of two, slicing the classifier/
    # centerness/local tail onto the supervised frames only (cycle_light
    # head semantics are implied). Same FLOPs, merged-batch BN moments
    # instead of the reference's two sequential stat updates (see
    # GlobalAndLocal.__call__ sup_count). glfusion arch only; exclusive
    # of CPS / temporal / remat_supervised=False. Measured in BASELINE.md
    # (tools/bench_pass_fusion.py).
    fuse_passes: bool = False
    # Global_and_Local_Temporal intent (reference models/ours.py:1846-1980;
    # its ``.shape(...)`` bug at :1962 means the video-attention path never
    # ran there): cycle-clip forwards fold the T frames into the attention
    # token axis (tokens = T·V·h·w) instead of treating frames as batch.
    # Supervised frames keep the per-frame graph. glfusion arch only.
    temporal: bool = False
    # cross-pseudo-supervision weight for the CPS twin (the reference ships
    # Global_and_Local_CPS, models/ours.py:3141, without a training path;
    # 1.0 follows the CPS paper's default trade-off)
    cps_weight: float = 1.0
    cycle_target_region: int = 16
    cycle_offset: int = 2
    cycle_chunk: int = 3
    cycle_temperature: float = 10.0
    # Gradient accumulation: one optimizer update per `grad_accum`
    # supervised microbatches of `batch_size` — the loader yields
    # batch_size·grad_accum frames per view and the train step scans the
    # microbatches, summing gradients before a single Adam update. Under
    # the sum-reduction BCE (main.py:87) the accumulated gradient is
    # EXACTLY the gradient of one batch_size·grad_accum batch, except BN
    # batch moments, which are per-microbatch (the same per-shard moments
    # the reference's DataParallel computed per GPU, main.py:155). The
    # cycle clip pass runs once per update (the reference's step = one
    # supervised batch + ONE clip regardless of batch size,
    # main.py:193-237). Use to train effective batches whose activations
    # exceed one chip's HBM: batch 32 + 40-frame clips OOMs a v5e chip,
    # --grad-accum 4 runs it (BASELINE.md). Exclusive of fuse_passes
    # (that knob merges everything into one pass; this one splits).
    grad_accum: int = 1
    # checkpointing / logging
    save_dir: str = "./result/ckpt"
    log_dir: str = "./result/log_info/log_01"
    save_every_epochs: int = 1
    eval_every_epochs: int = 1
    # Checkpoints retained on disk. None = keep every saved epoch, which is
    # the reference contract: main.py:857-872 writes net_{epoch:05}.pth for
    # every epoch and the post-training sweep (main.py:316-323, 414-416)
    # picks the best val-Dice epoch >= 50 over ALL of them — bounding
    # retention would silently restrict the sweep to the newest few.
    ckpt_keep: Optional[int] = None
    # mesh: (data, model) axis sizes; -1 = all remaining devices on data
    mesh_data: int = -1
    mesh_model: int = 1
    # per-parameter TensorBoard histograms each epoch (the reference's
    # optional add_summary histogram pass, main.py:252-255). Opt-in: the
    # full-size param fetch is ~2.2 GB device→host per epoch.
    log_histograms: bool = False
    # functional sanitizer (reference main.py:37 set_detect_anomaly):
    # jax.experimental.checkify finiteness checks on the loss and the
    # gradient norm INSIDE the compiled train step; divergence raises
    # host-side one step late (the error fetch overlaps the next step's
    # execution), under jit on TPU.
    # Complements --debug-nans (jax_debug_nans: op-by-op NaN hunting;
    # full-graph checkify.float_checks instrumentation was measured
    # impractical — trace/compile blowup even at toy widths).
    checkify: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    opt: OptConfig = dataclasses.field(default_factory=OptConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Default XLA:TPU compile options for the train/eval steps, from the r3
# 16-option sweep against the production train step (BASELINE.md "XLA:TPU
# compiler-option sweep"): 32 MiB scoped VMEM (larger fusions, fewer HBM
# round-trips; the default 16 MiB is the measured bottleneck, 48 MiB+
# regresses) + reduce-window-broadcast fusion off. Measured −1.8 % s/step
# on train AND +2.4 % frames/s at eval (the scoped-VMEM bump carries the
# eval win; rwb-off is train-only but eval-neutral within the set —
# result/xla_flag_sweep_r3_infer.json). Only meaningful on the TPU backend.
TPU_COMPILER_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
    "xla_tpu_rwb_fusion": "false",
}


def default_compiler_options(backend: str | None = None):
    """``compiler_options`` for jit on the current (or given) backend."""
    import jax

    backend = backend or jax.default_backend()
    return dict(TPU_COMPILER_OPTIONS) if backend == "tpu" else None


def tiny_config(views: Sequence[str] = ("1", "3", "4")) -> Config:
    """A topology-faithful miniature for unit tests and CPU smoke runs."""
    return Config(
        model=ModelConfig(
            views=tuple(views),
            stem_width=8,
            block_sizes=(1, 1, 1, 1),
            widths=(8, 16, 32, 64),
            aspp_rates=(2, 4, 6),
            aspp_channels=16,
            use_pallas_fusion=False,
        ),
        data=DataConfig(
            resize_hw=40,
            crop_hw=32,
            clip_length=8,
            reg_clip_frames=8,
            synthetic_num_patients=4,
            synthetic_raw_hw=48,
            synthetic_num_frames=12,
        ),
        train=TrainConfig(
            batch_size=2,
            num_epochs=2,
            # supervised views follow the model views (the full-size default
            # keeps the reference's test_view = {'1','3','4'}, main.py:919;
            # a narrowed tiny model must narrow the loss-bearing set too or
            # make_train_step rejects the config)
            test_views=tuple(views),
            cycle_target_region=4,
            cycle_offset=1,
            cycle_chunk=2,
        ),
    )

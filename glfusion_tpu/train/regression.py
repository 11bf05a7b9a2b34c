"""mPAP regression training path.

The reference ships the pieces of a video→scalar regression task without a
wired trainer: ``PAHDataset`` (loader.py:35-189, mPAP/Vmax targets),
regression backbones (``Resnet50PAH`` resnet3d.py:355, ``TimeSformer``
TimeSformer.py:219, ``r2plus1d_18_iekd`` rnet2dp1.py:436) and the scalar
metrics (utils/metrics.py). This module wires them the TPU way: jitted MSE
train step over a data-parallel mesh, metric accumulation in-graph.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import Config
from glfusion_tpu.data.infos import PatientIndex, load_infos, load_split
from glfusion_tpu.data.pipeline import (
    RegressionClipLoader,
    preprocess_regression_batch,
)
from glfusion_tpu.parallel import make_mesh, shard_batch
from glfusion_tpu.train.train_state import TrainState, make_optimizer
from glfusion_tpu.utils.checkpoint import CheckpointManager
from glfusion_tpu.utils.scores import mae, mse, r2, rmse


def make_regression_train_step(model,
                               compiler_options: "dict | None | str"
                               = "default"):
    """compiler_options: as in train/step.make_train_step — pass ``None``
    when the step nests inside an outer jit (bench.py's chained scan)."""
    import functools

    from glfusion_tpu.config import default_compiler_options

    if compiler_options == "default":
        compiler_options = default_compiler_options()

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["clips"], True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            pred = out[0] if isinstance(out, tuple) else out
            pred = pred[..., 0]
            loss = jnp.mean((pred - batch["targets"]) ** 2)
            return loss, (updates.get("batch_stats", {}), pred)

        (loss, (bstats, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if bstats:
            state = state.replace(batch_stats=bstats)
        return state, {"loss": loss, "pred": pred}

    return step


def make_regression_eval_step(model,
                              compiler_options: "dict | None | str"
                              = "default"):
    """compiler_options: see make_regression_train_step."""
    import functools

    from glfusion_tpu.config import default_compiler_options

    if compiler_options == "default":
        compiler_options = default_compiler_options()

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def step(state: TrainState, batch):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["clips"], False)
        pred = out[0] if isinstance(out, tuple) else out
        return pred[..., 0]

    return step


class RegressionTrainer:
    """Video clips → scalar mPAP; reports MSE/MAE/RMSE/R² like the
    reference's metric module intends."""

    def __init__(self, cfg: Config, model, data_paths: Dict[str, str],
                 label_type: str = "mPAP", verbose: bool = True,
                 input_adapter=None):
        self.cfg = cfg
        self.model = model
        self.verbose = verbose
        self._input_adapter = input_adapter
        self.mesh = make_mesh(data=cfg.train.mesh_data,
                              model=cfg.train.mesh_model)

        infos = load_infos(data_paths["infos"])
        index = PatientIndex.from_infos(infos, cfg.data.use_data)
        from pathlib import Path
        dl = Path(data_paths["data_list_dir"])
        self.train_loader = RegressionClipLoader(
            index, load_split(dl / "train_list.npy"), cfg.model.views, cfg,
            is_train=True, label_type=label_type, seed=cfg.train.seed)
        self.val_loader = RegressionClipLoader(
            index, load_split(dl / "val_list.npy"), cfg.model.views, cfg,
            is_train=False, label_type=label_type, seed=cfg.train.seed)

        rng = jax.random.PRNGKey(cfg.train.seed)
        c, t = cfg.data.crop_hw, cfg.data.reg_clip_frames
        v = cfg.model.num_views
        sample = self._model_input(jnp.zeros((v, 1, c, c, t)))
        variables = jax.jit(
            lambda r: self.model.init(r, sample, False))(rng)
        # the same Adam(wd)+cosine recipe as the segmentation Trainer —
        # the reference trains everything with Adam lr 3e-4 wd 1e-5 +
        # CosineAnnealingLR (main.py:161-169)
        steps_per_epoch = max(
            len(self.train_loader) // cfg.train.batch_size, 1)
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(cfg, steps_per_epoch),
        )
        self.train_step = make_regression_train_step(self.model)
        self.eval_step = make_regression_eval_step(self.model)
        # per-(epoch, step) keys derived by fold_in (not a mutable split
        # stream): resume from an epoch boundary replays the exact keys of
        # an uninterrupted run — see Trainer.__init__ for the rationale
        self._base_rng = jax.random.PRNGKey(cfg.train.seed + 1)
        self.ckpt = CheckpointManager(cfg.train.save_dir,
                                      max_to_keep=cfg.train.ckpt_keep)
        self.epoch = 0

    def _model_input(self, clips: jnp.ndarray) -> jnp.ndarray:
        """(V, B, H, W, T) device clips → the model's input convention.

        Default: video regressors take (B, T, H, W, C=V-merged) — we fold
        views into channels-last frames (B, T, H, W, V). Architectures with
        a different convention pass ``input_adapter`` (models/registry.py).
        """
        if self._input_adapter is not None:
            return self._input_adapter(clips)
        from glfusion_tpu.models.registry import _views_to_channels
        return _views_to_channels(clips)

    def train_epoch(self, epoch: int = 0) -> Dict[str, float]:
        cfg = self.cfg
        losses = []
        for host_batch in self.train_loader.batches(cfg.train.batch_size,
                                                    epoch):
            r_pre, r_step = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(self._base_rng, epoch), len(losses)))
            clips = preprocess_regression_batch(
                r_pre, jnp.asarray(host_batch["clips_raw"]),
                crop_hw=cfg.data.crop_hw, is_train=True)
            batch = {"clips": self._model_input(clips),
                     "targets": jnp.asarray(host_batch["targets"])}
            batch = shard_batch(batch, self.mesh, batch_axis=0)
            self.state, m = self.train_step(self.state, batch, r_step)
            # keep device scalars — a float() here would block every step
            # on a device→host sync (pathological through the remote TPU
            # transport); ONE transfer for the whole epoch below, like the
            # segmentation Trainer
            losses.append(m["loss"])
        losses = jax.device_get(losses)
        return {"loss": float(np.mean(losses)) if losses else 0.0,
                "steps": len(losses)}

    def save(self, epoch: int, wait: bool = False) -> None:
        """Checkpoint the full regression train state (async by default)."""
        self.ckpt.save(self.state, epoch, wait=wait)

    def load_latest(self) -> bool:
        """Restore the newest checkpoint; returns whether one was found
        (reg-val without this would score freshly-initialized weights)."""
        restored = self.ckpt.restore_latest(self.state)
        if restored is None:
            return False
        self.state, self.epoch = restored
        return True

    def evaluate(self) -> Dict[str, float]:
        preds, targets = [], []
        # full batches (one dispatch per batch_size patients, not per
        # patient); the loader emits a short final batch, costing at most
        # one extra compile shape
        for host_batch in self.val_loader.batches(self.cfg.train.batch_size):
            clips = preprocess_regression_batch(
                jax.random.PRNGKey(0), jnp.asarray(host_batch["clips_raw"]),
                crop_hw=self.cfg.data.crop_hw, is_train=False)
            batch = {"clips": self._model_input(clips)}
            preds.append(np.asarray(self.eval_step(self.state, batch)))
            targets.append(host_batch["targets"])
        if not preds:
            return {}
        p = np.concatenate(preds)
        t = np.concatenate(targets)
        return {
            "mse": float(mse(t, p)),
            "mae": float(mae(t, p)),
            "rmse": float(rmse(t, p)),
            "r2": float(r2(t, p)),
        }

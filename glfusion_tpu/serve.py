"""Pipelined online clip inference (the production serving path).

The reference's closest surface is offline eval (``main.py:459-543``: load
clip, forward, accumulate). For serving, the bottlenecks are different:
host NIfTI decode, host→device transfer, and device compute should all
overlap. This module runs them as a three-stage pipeline:

  decode (C++ native reader in a thread pool)
    ‖ dispatch (JAX async dispatch keeps ``depth`` clips in flight on
      device — the jitted forward returns immediately, compute overlaps
      the next clip's decode + upload)
    ‖ fetch (device→host of the thresholded uint8 masks — 4× smaller than
      the f32 logits, which matters on high-latency transports)

Static shapes by construction: every clip is padded/trimmed on host to
``clip_length`` frames so the forward compiles ONCE (XLA retraces on any
shape change); the true frame count trims the yielded prediction.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import Config, default_compiler_options


class ClipPipeline:
    """Overlapped decode → forward → fetch over a stream of clips.

    Parameters
    ----------
    cfg, model, variables: the flagship model + its eval variables
        (``{"params": ..., "batch_stats": ...}``).
    depth: clips kept in flight on device (2 is enough to hide decode and
        transfer behind compute; more only adds HBM pressure).
    threads: host decode workers (native reader threads; bounded by host
        cores).
    """

    def __init__(self, cfg: Config, model, variables: Dict[str, Any],
                 depth: int = 2, threads: int = 2,
                 forward: Any = None, pad_clips: bool = None,
                 expected_hw: int = None, pad_to: int = None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.depth = max(1, depth)
        self.threads = max(1, threads)
        # a live jit compiles once per shape → pad every clip to
        # clip_length; an AOT export with a symbolic frame axis runs the
        # true frame count directly (no wasted compute on padding frames).
        # An export with a PINNED frame axis must pad back on (callers use
        # export_pipeline_kwargs, which reads meta['symbolic_frames']).
        self._pad_clips = (forward is None) if pad_clips is None else pad_clips
        # AOT exports pin the spatial size; check per clip with a clear
        # error instead of a raw XLA shape mismatch
        self._expected_hw = expected_hw
        # pad/trim target; a frames-pinned export overrides clip_length
        self._pad_to = pad_to

        if forward is not None:
            # pre-built serving forward — e.g. a deserialized AOT export
            # (utils/model_export.load_serving_forward): weights baked in,
            # takes only the image array
            self._fwd = lambda _vars, images: forward(images)
            return

        def _apply(variables, images):
            # images (V, T, H, W, 1) float32 in [0,1]; frames-as-batch
            out = model.apply(variables, images, False)
            # sigmoid > 0.5 == logits > 0; uint8 masks cut D2H 4x vs f32
            return (out["mask"] > 0.0).astype(jnp.uint8)

        # top-level jit with the shipped TPU options: unlike an AOT
        # lower/compile, plain jit respects whatever shardings the caller's
        # variables are committed with (a mesh-sharded Trainer state works)
        self._fwd = jax.jit(_apply,
                            compiler_options=default_compiler_options())

    # ------------------------------------------------------------- helpers

    def _pad_clip(self, images: np.ndarray) -> Tuple[np.ndarray, int]:
        """Pad/trim (V, T, H, W, 1) to the compiled clip_length frames.

        With ``pad_clips=False`` (AOT export, symbolic frame axis) only
        the clip_length trim applies — the protocol caps clips either way
        (``Test_Seg_PAHDataset`` clip_length, reference loader.py:1095).
        """
        if self._expected_hw is not None and (
                images.shape[2:4] != (self._expected_hw, self._expected_hw)):
            raise ValueError(
                f"clip spatial size {images.shape[2:4]} does not match the "
                f"AOT export's pinned {self._expected_hw}²: serve clips at "
                f"the exported size, re-export with --export-hw, or serve "
                f"the live checkpoint (no --from-export)")
        t_fix = self._pad_to or self.cfg.data.clip_length
        t = images.shape[1]
        if t > t_fix:
            return images[:, :t_fix], t_fix
        if t == t_fix or not self._pad_clips:
            return images, t
        pad = np.zeros((images.shape[0], t_fix - t) + images.shape[2:],
                       images.dtype)
        return np.concatenate([images, pad], axis=1), t

    # -------------------------------------------------------------- stream

    def predict_iter(
        self,
        items: Iterable[Any],
        decode: Callable[[Any], Tuple[str, np.ndarray]],
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Yield ``(clip_id, masks)`` for each item, fully pipelined.

        ``decode(item) -> (clip_id, images)`` runs in the host thread pool
        (images (V, T, H, W, 1) float32 in [0,1]); yielded masks are
        (V, T_true, H, W, 5) uint8. Output order == input order.
        """
        import collections
        from concurrent.futures import ThreadPoolExecutor

        items_it = iter(items)
        with ThreadPoolExecutor(max_workers=self.threads) as ex:
            decoded = collections.deque()   # decode futures, input order
            inflight = collections.deque()  # (clip_id, t_true, device out)

            def submit() -> bool:
                try:
                    item = next(items_it)
                except StopIteration:
                    return False
                decoded.append(ex.submit(decode, item))
                return True

            for _ in range(self.threads + 1):
                if not submit():
                    break

            while decoded or inflight:
                # drain a finished prediction once the window is full (or
                # nothing is left to feed)
                if inflight and (len(inflight) >= self.depth or not decoded):
                    cid, t_true, dev = inflight.popleft()
                    yield cid, np.asarray(dev)[:, :t_true]
                    continue
                cid, images = decoded.popleft().result()
                submit()
                if images is None:
                    continue  # no requested view present: skip the clip
                images, t_true = self._pad_clip(np.asarray(images))
                dev = self._fwd(self.variables, jnp.asarray(images))
                inflight.append((cid, t_true, dev))

    # --------------------------------------------------------- conveniences

    def decode_paths(self, item: Tuple[str, Dict[str, str]]):
        """Decode one ``(clip_id, {view: image_path})`` to (cid, images).

        Reads each view with the from-scratch NIfTI reader (native C++
        when built), /255-normalizes, and stacks views at their NATIVE
        spatial size (same rule as TestClipLoader — the eval protocol runs
        raw sizes, no resize); views are trimmed to the common minimum
        frame count (≤ clip_length). Missing views are zero-filled
        (the reference pads with zeros, ``loader.py:268-282``); a clip
        with NO requested view present returns ``(cid, None)`` and is
        skipped by the pipeline, matching ``Trainer.infer``.
        """
        from glfusion_tpu.data.nifti import read_nifti

        cid, paths = item
        return cid, self.stack_raw_views(
            {v: read_nifti(p) for v, p in paths.items() if p is not None})

    def stack_raw_views(self, vols_by_view: Dict[str, np.ndarray]):
        """Raw per-view volumes → the (V, T, H, W, 1) forward input.

        Each volume is a raw uint8-range NIfTI array, (1, H, W, T) (the
        ``Test_Seg_PAHDataset`` file layout) or bare (H, W, T); it is
        /255-normalized and re-laid-out, then views are aligned to one
        common frame count (≤ clip_length) with zeros for missing views
        (``align_views`` — the same rule as eval). Returns ``None`` when
        no requested view is present. Also the HTTP endpoint's decode.
        """
        from glfusion_tpu.data.pipeline import align_views

        vols = []
        for view in self.cfg.model.views:
            raw = vols_by_view.get(view)
            if raw is None:
                vols.append(None)
                continue
            vol = np.asarray(raw, np.float32) / 255.0
            # an unconditional squeeze() would also collapse T on
            # single-frame clips and scramble the axes
            if vol.ndim == 4 and vol.shape[0] == 1:
                vol = vol[0]
            if vol.ndim == 2:
                vol = vol[..., None]  # single frame: (H, W) → (H, W, 1)
            if vol.ndim != 3:
                raise ValueError(
                    f"view {view}: expected (H, W, T) or (1, H, W, T) "
                    f"volume, got shape {np.asarray(raw).shape}")
            vols.append(np.moveaxis(vol, -1, 0)[..., None])  # (T, H, W, 1)
        # trim to the true common frame count so _pad_clip records it and
        # the yielded prediction is trimmed back (a short clip must not
        # come out with predictions over its zero-padding frames)
        images, _ = align_views(vols,
                                self._pad_to or self.cfg.data.clip_length)
        return images

    def predict_one(self, images: np.ndarray) -> np.ndarray:
        """Serial single-clip prediction (no pipelining): uint8 masks."""
        images, t_true = self._pad_clip(np.asarray(images))
        dev = self._fwd(self.variables, jnp.asarray(images))
        return np.asarray(dev)[:, :t_true]

    def predict_paths(
        self,
        clips: Sequence[Tuple[str, Dict[str, str]]],
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Serve from NIfTI paths: ``(clip_id, {view: image_path})``."""
        return self.predict_iter(clips, self.decode_paths)


def export_pipeline_kwargs(from_export: str, cfg: Config) -> Dict[str, Any]:
    """Load + validate a saved AOT export against this run's config.

    Shared by ``--mode serve`` (batch) and the HTTP endpoint so both
    reject an incompatible artifact with the same clear errors instead of
    opaque XLA shape mismatches (or, worse for num_classes, silently
    wrong-channel masks). Returns :class:`ClipPipeline` kwargs:
    ``forward``, ``expected_hw``, and — when the export's frame axis is
    PINNED rather than symbolic — ``pad_clips=True`` + ``pad_to`` so
    short clips are padded to exactly the exported frame count (the
    deserialized artifact accepts no other length).
    """
    from glfusion_tpu.utils.model_export import load_serving_forward

    forward, meta = load_serving_forward(from_export)
    meta = meta or {}
    if meta.get("views") and list(meta["views"]) != list(cfg.model.views):
        raise ValueError(
            f"export {from_export} was built for views {meta['views']} "
            f"but this run is configured for {list(cfg.model.views)}")
    if meta.get("num_classes") not in (None, cfg.model.num_classes):
        raise ValueError(
            f"export {from_export} predicts {meta['num_classes']} "
            f"classes but this run is configured for "
            f"{cfg.model.num_classes}")
    symbolic = meta.get("symbolic_frames", True)
    return {
        "forward": forward,
        "expected_hw": meta.get("input_hw") or meta.get("crop_hw"),
        "pad_clips": not symbolic,
        # older artifacts lack meta['frames']; clip_length is the export
        # default so the fallback matches
        "pad_to": None if symbolic else meta.get("frames"),
    }


def serve_test_clips(trainer, out_dir: str = "./predictions",
                     depth: int = 2, threads: int = 2,
                     from_export: str = None) -> dict:
    """``--mode serve``: Trainer.infer through the pipeline, with timing.

    Same outputs as ``Trainer.infer`` (per-clip per-view (5, H, W, T)
    uint8 NIfTI masks) but decode/compute/fetch overlapped; returns
    ``{"written": n, "clips": n, "clips_per_s": ..., "wall_s": ...}``.
    ``from_export`` serves a saved AOT artifact (``--mode export``)
    instead of the Trainer's live weights.
    """
    from pathlib import Path

    from glfusion_tpu.data.nifti import write_nifti

    if jax.process_count() > 1:
        # The pipeline stages clips onto the local device and fetches masks
        # with np.asarray — both are per-process operations that cannot see
        # another process's shards. Serving scales by replica-per-host, not
        # by sharding one stream across hosts.
        raise ValueError(
            "--mode serve is a single-controller path; in a multi-process "
            "run serve one replica per host, or use --mode infer (which "
            "assembles process-spanning shards)")
    cfg = trainer.cfg
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    export_kwargs = ({} if from_export is None
                     else export_pipeline_kwargs(from_export, cfg))
    pipe = ClipPipeline(cfg, trainer.model, variables,
                        depth=depth, threads=threads, **export_kwargs)
    ids = sorted(trainer.test_infos.keys())
    clips = [(cid, dict(trainer.test_infos[cid]["views_images"]))
             for cid in ids]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    written = 0
    served = 0  # clips with no requested view on disk are skipped —
    t0 = time.perf_counter()  # count what actually ran, not the nominal list
    for cid, pred in pipe.predict_paths(clips):
        served += 1
        for vi, view in enumerate(cfg.model.views):
            # (T, H, W, 5) → (5, H, W, T) uint8 (Test_Seg_PAHDataset layout)
            vol = np.transpose(pred[vi], (3, 1, 2, 0)).astype(np.uint8)
            write_nifti(out / f"pred_{cid}_v{view}.nii.gz", vol)
            written += 1
    wall = time.perf_counter() - t0
    return {"written": written, "clips": served,
            "clips_per_s": round(served / wall, 3) if wall else None,
            "wall_s": round(wall, 3)}

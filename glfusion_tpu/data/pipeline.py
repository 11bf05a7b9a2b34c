"""Host loaders + fused on-device preprocessing.

Split of work (TPU-first):
  host   — NIfTI decode, labeled-frame selection (the reference's
           mask-area>100 rule, ``datasets/loader.py:431-470``), nearest
           resize to the STATIC 144² grid (pure integer gather with the
           same float32 index rule as the device op).
  device — one jit: paired random/center crop to 112², /255 normalize,
           raw-label → 5-structure remap, view stacking. Replaces the
           MONAI transform stack (``datasets/loader.py:491-509``).

Note: the reference constructs RandFlipd augmentations but never adds them
to its Compose (``loader.py:482-489`` vs ``:491-499``) — flips are dead
code there and intentionally absent here.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import ALL_VIEWS, Config
from glfusion_tpu.data.infos import PatientIndex
from glfusion_tpu.data.nifti import read_nifti
from glfusion_tpu.ops.crops import center_crop
from glfusion_tpu.ops.masks import mask_to_allclass
from glfusion_tpu.ops.resize import _nearest_indices_np


# ---------------------------------------------------------------- host side

def _resize_nearest_np(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(H, W[, ...]) nearest resize on host, same index rule as device op."""
    hi = _nearest_indices_np(out_hw[0], x.shape[0])
    wi = _nearest_indices_np(out_hw[1], x.shape[1])
    return x[hi][:, wi]


MISS = object()


class ByteLRU:
    """Byte-bounded LRU of numpy entries (None values cost 0 bytes).

    Public: the trainer's eval-clip cache reuses it.

    The clip loaders cached decoded volumes in plain unbounded dicts —
    fine for the 178-patient corpus, a host-OOM hazard beyond it; this
    gives them the same bounded policy as SegFrameLoader's batch cache.
    """

    def __init__(self, max_bytes: int):
        import collections
        self._d: "collections.OrderedDict" = collections.OrderedDict()
        self._max = max_bytes
        self._used = 0

    @staticmethod
    def _nbytes(v) -> int:
        if v is None:
            return 0
        if isinstance(v, tuple):
            return sum(a.nbytes for a in v if a is not None)
        if isinstance(v, dict):
            return sum(a.nbytes for a in v.values()
                       if hasattr(a, "nbytes"))
        return v.nbytes

    def get(self, key, default=MISS):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        return default

    def put(self, key, value) -> None:
        if key in self._d:
            self._used -= self._nbytes(self._d.pop(key))
        self._d[key] = value
        self._used += self._nbytes(value)
        while self._used > self._max and len(self._d) > 1:
            _, old = self._d.popitem(last=False)
            self._used -= self._nbytes(old)


def align_views(vols, clip_length: int, t: int = None):
    """Stack per-view clip arrays to ``(V, T, ...)`` with one common T.

    THE single implementation of the eval/serving view-alignment rule
    (used by both ``TestClipLoader`` and ``serve.ClipPipeline``): present
    views are trimmed to the common minimum frame count (≤ ``clip_length``,
    or the explicit ``t``); missing views (``None``) are zero-filled (the
    reference pads missing views with zeros, ``loader.py:268-282``).
    Returns ``(stacked, t)`` or ``(None, 0)`` when every view is missing.
    """
    if all(v is None for v in vols):
        return None, 0
    if t is None:
        t = min(min(clip_length, v.shape[0]) for v in vols if v is not None)
    vols = [None if v is None else v[:t] for v in vols]
    shape = next(v.shape for v in vols if v is not None)
    out = [np.zeros(shape, np.float32) if v is None else v for v in vols]
    return np.stack(out), t


def labeled_frames(lab: np.ndarray) -> np.ndarray:
    """Indices of labeled frames in an (H, W, T) raw label volume.

    THE single implementation of the reference's labeled-frame rule
    (``datasets/loader.py:431-446`` input_select): a frame is labeled when
    its raw label sum exceeds 100. Callers decide the no-labeled-frame
    fallback (train loaders use all frames; AllMask skips the video).
    """
    return np.flatnonzero(lab.reshape(-1, lab.shape[-1]).sum(0) > 100)


class SegFrameLoader:
    """Single-frame multi-view segmentation batches (``Seg_PAHDataset``).

    Also covers ``Couple_Seg_PAHDataset`` (reference loader.py:513-744):
    that class's distinguishing behavior — ALL requested views of one
    patient in a single item — is this loader's native layout (the (V, B)
    leading axes).

    Yields host batches: images (V, B, 144, 144) float32 raw intensity,
    masks (V, B, 144, 144) int32 raw labels — device preprocessing does the
    rest. Missing views produce zero frames (reference pads with zeros,
    ``loader.py:268-282``).
    """

    def __init__(self, index: PatientIndex, ids: Sequence[str],
                 views: Sequence[str], cfg: Config, is_train: bool,
                 seed: int = 0, cache_bytes: int = 4 << 30):
        self.index = index
        self.ids = [i for i in ids if i in index.records]
        self.views = tuple(views)
        self.cfg = cfg
        self.is_train = is_train
        self.seed = seed
        # LRU of PRE-RESIZED videos in their on-disk dtype, bounded by BYTES
        # (an item bound thrashes: the real corpus is 178×3 = 534 entries
        # at ~2-5 MB each, so a 256-item cap re-decodes every epoch).
        # Caching raw decoded volumes instead would not scale: the corpus's
        # 800×600×~127 videos are ~240 MB each as f32.
        import collections
        import threading
        self._cache: "collections.OrderedDict[tuple, tuple]" = (
            collections.OrderedDict())
        self._cache_bytes = cache_bytes
        self._cache_used = 0
        # guards the LRU dict: the epoch loop's prefetch thread and the
        # warm_async ingest thread fill it concurrently (decode runs
        # outside the lock; only dict mutation is serialized)
        self._cache_lock = threading.Lock()
        self._warm_stop = threading.Event()

    def __len__(self) -> int:
        n = len(self.ids)
        return n * self.cfg.data.train_repeat if self.is_train else n

    @staticmethod
    def _entry_bytes(entry) -> int:
        return sum(a.nbytes for a in entry if a is not None)

    def _make_entry(self, img: np.ndarray, lab: np.ndarray):
        r = self.cfg.data.resize_hw
        img, lab = np.asarray(img).squeeze(), np.asarray(lab).squeeze()
        if img.ndim == 2:
            img, lab = img[..., None], lab[..., None]
        # labeled-frame rule on the RAW labels (loader.py:433-446)
        labeled = labeled_frames(lab)
        if len(labeled) == 0:
            labeled = np.arange(lab.shape[-1])
        return (_resize_nearest_np(img, (r, r)),
                _resize_nearest_np(lab, (r, r)), labeled)

    def _put(self, key, entry):
        with self._cache_lock:
            if key in self._cache:
                self._cache_used -= self._entry_bytes(self._cache.pop(key))
            self._cache[key] = entry
            self._cache_used += self._entry_bytes(entry)
            while (self._cache_used > self._cache_bytes
                   and len(self._cache) > 1):
                _, old = self._cache.popitem(last=False)
                self._cache_used -= self._entry_bytes(old)

    def _prefill(self, keys) -> None:
        """Decode a batch's uncached files in one parallel native read."""
        missing, paths = [], []
        with self._cache_lock:
            cached = set(self._cache)
        # dedupe: train_repeat shuffles can place one (pid, view) twice in
        # a batch; decoding it twice in the native call is pure waste
        for key in dict.fromkeys(keys):
            if key in cached:
                continue
            img_p, lab_p = self.index.view_paths(*key)
            if img_p is None:
                self._put(key, (None, None, None))
            else:
                missing.append(key)
                paths.extend((img_p, lab_p))
        if not missing:
            return
        try:
            from glfusion_tpu.native import (native_available,
                                             read_nifti_batch_native)
            if not native_available():
                return
            vols = read_nifti_batch_native(paths)
        except Exception:
            return  # per-file fallback in _load
        for i, key in enumerate(missing):
            self._put(key, self._make_entry(vols[2 * i], vols[2 * i + 1]))

    def _load(self, pid: str, view: str):
        """(resized_images (R,R,T), resized_labels (R,R,T), labeled_idx)."""
        key = (pid, view)
        with self._cache_lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                return self._cache[key]
        img_p, lab_p = self.index.view_paths(pid, view)
        if img_p is None:
            entry = (None, None, None)
        else:
            entry = self._make_entry(read_nifti(img_p), read_nifti(lab_p))
        self._put(key, entry)
        return entry

    def epoch_keys(self, epoch: int = 0):
        """The (pid, view) access sequence of ``batches(...)`` for one
        epoch, deduplicated in first-use order — the warm thread follows
        it so the earliest-needed files decode first."""
        rs = np.random.RandomState(self.seed + epoch if self.is_train
                                   else self.seed)
        order = np.arange(len(self))
        if self.is_train:
            rs.shuffle(order)
        seen, keys = set(), []
        for oi in order:
            pid = self.ids[oi % len(self.ids)]
            for view in self.views:
                if (pid, view) not in seen:
                    seen.add((pid, view))
                    keys.append((pid, view))
        return keys

    def warm_async(self, epoch: int = 0, chunk: int = 8):
        """Background-fill the LRU while the first train step compiles.

        First-epoch ingest was fully serial with compilation (measured
        321 s for the 534-video rehearsal corpus, BASELINE.md): the
        prefetch thread only runs ``depth`` batches ahead, so the
        minutes-long first XLA compile bought no decode progress. This
        daemon thread walks the epoch's access order through the native
        thread-pool reader. Idempotent with the epoch loop's own
        ``_prefill`` (both take the cache lock); returns the thread, or
        None when the corpus is empty.
        """
        import threading

        keys = self.epoch_keys(epoch)
        if not keys:
            return None
        self._warm_stop.clear()

        def run():
            for i in range(0, len(keys), chunk):
                if self._warm_stop.is_set():
                    return
                # budget guard: once the LRU is nearly full, further
                # warming would evict the earliest-decoded (= earliest
                # NEEDED) entries — the whole warm pass would be wasted
                # I/O and the consumer would re-decode serially anyway
                with self._cache_lock:
                    nearly_full = self._cache_used >= 0.9 * self._cache_bytes
                if nearly_full:
                    return
                try:
                    self._prefill(keys[i:i + chunk])
                except Exception:
                    return  # warming is best-effort; _load covers misses

        t = threading.Thread(target=run, daemon=True,
                             name="glfusion-warm-ingest")
        t.start()
        return t

    def stop_warming(self):
        self._warm_stop.set()

    def batches(self, batch_size: int, epoch: int = 0) -> Iterator[dict]:
        rs = np.random.RandomState(self.seed + epoch if self.is_train
                                   else self.seed)
        order = np.arange(len(self))
        if self.is_train:
            rs.shuffle(order)
        r = self.cfg.data.resize_hw
        if self.is_train:
            # drop-last: a partial batch would retrigger jit compilation of
            # the train step for one odd shape (torch DataLoader default is
            # also drop_last=False only for eval-style iteration)
            nb = len(order) // batch_size
        else:
            # eval must score EVERY patient: emit the final short batch
            nb = -(-len(order) // batch_size)
        for b in range(nb):
            take = order[b * batch_size:(b + 1) * batch_size]
            if len(take) == 0:
                return
            imgs = np.zeros((len(self.views), len(take), r, r), np.float32)
            masks = np.zeros((len(self.views), len(take), r, r), np.int32)
            self._prefill([(self.ids[oi % len(self.ids)], view)
                           for oi in take for view in self.views])
            for bi, oi in enumerate(take):
                pid = self.ids[oi % len(self.ids)]
                for vi, view in enumerate(self.views):
                    img, lab, labeled = self._load(pid, view)
                    if img is None:
                        continue
                    fr = int(rs.choice(labeled))
                    imgs[vi, bi] = img[..., fr].astype(np.float32)
                    masks[vi, bi] = lab[..., fr].astype(np.int32)
            yield {"images_raw": imgs, "masks_raw": masks}


class AlignedClipLoader:
    """Fixed-length cycle clips (``Aligned_Video_Seg_PAHDataset``).

    Yields (V, T, H, W) float32 raw-intensity clips (the reference feeds
    cycle clips WITHOUT /255, ``main.py:215-218`` + ``loader.py:1023-1027``).
    Clips shorter than clip_length are self-concatenated; longer ones take
    the first clip_length frames (``loader.py:1009-1021``, random_sample=False).
    """

    def __init__(self, index: PatientIndex, ids: Sequence[str],
                 views: Sequence[str], cfg: Config, seed: int = 0,
                 cache_bytes: int = 4 << 30):
        self.index = index
        self.ids = [i for i in ids if i in index.records]
        self.views = tuple(views)
        self.cfg = cfg
        self.seed = seed
        self._cache = ByteLRU(cache_bytes)

    def __len__(self) -> int:
        return len(self.ids)

    def _load_clip(self, pid: str, view: str) -> np.ndarray | None:
        key = (pid, view)
        hit = self._cache.get(key)
        if hit is not MISS:
            return hit
        img_p, _ = self.index.view_paths(pid, view)
        if img_p is None:
            entry = None
        else:
            vol = np.asarray(read_nifti(img_p))
            if vol.ndim == 4:  # (H, W, T, 1)
                vol = vol.squeeze(-1)
            t = self.cfg.data.clip_length
            while vol.shape[-1] < t:
                vol = np.concatenate([vol, vol], axis=-1)
            entry = vol[..., :t].astype(np.float32)
        self._cache.put(key, entry)
        return entry

    def clips(self, epoch: int = 0) -> Iterator[np.ndarray]:
        rs = np.random.RandomState(self.seed + epoch)
        order = rs.permutation(len(self.ids))
        hw = self.cfg.data.crop_hw
        t = self.cfg.data.clip_length
        for oi in order:
            pid = self.ids[oi]
            out = np.zeros((len(self.views), t, hw, hw), np.float32)
            ok = False
            for vi, view in enumerate(self.views):
                vol = self._load_clip(pid, view)
                if vol is None:
                    continue
                if vol.shape[:2] != (hw, hw):
                    vol = _resize_nearest_np(vol, (hw, hw))
                out[vi] = np.moveaxis(vol, -1, 0)  # (T, H, W)
                ok = True
            if ok:
                yield out


class TestClipLoader:
    """Raw evaluation clips (``Test_Seg_PAHDataset``): no transform, /255.

    Yields per-clip dicts with images (V, T, H, W, 1) float32 in [0,1] and
    masks (V, T, H, W, 5) float32 — the frames-as-batch eval feed
    (``main.py:495-499``).
    """

    def __init__(self, test_infos: Dict[str, dict], ids: Sequence[str],
                 views: Sequence[str], clip_length: int):
        self.infos = test_infos
        self.ids = list(ids)
        self.views = tuple(views)
        self.clip_length = clip_length

    def __len__(self):
        return len(self.ids)

    def clips(self) -> Iterator[dict]:
        for cid in self.ids:
            rec = self.infos[cid]
            imgs, masks = [], []
            for view in self.views:
                ip = rec["views_images"].get(view)
                lp = rec["views_labels"].get(view)
                if ip is None or lp is None:
                    # missing view: zero-filled below once a present view
                    # fixes the shape (reference pads missing views with
                    # zeros, loader.py:268-282)
                    imgs.append(None)
                    masks.append(None)
                    continue
                img = np.asarray(read_nifti(ip), np.float32) / 255.0
                lab = np.asarray(read_nifti(lp), np.float32)
                # img (1, H, W, T) → (T, H, W, 1); lab (5, H, W, T) → (T, H, W, 5)
                imgs.append(np.transpose(img, (3, 1, 2, 0)))
                masks.append(np.transpose(lab, (3, 1, 2, 0)))
            # views may differ in frame count: align_views trims to the
            # common minimum (≤ clip_length) and zero-fills missing views
            # — the same helper serve.ClipPipeline.decode_paths uses
            images, t = align_views(imgs, self.clip_length)
            if images is None:
                continue  # no requested view exists for this clip
            mask_stack, _ = align_views(masks, self.clip_length, t=t)
            yield {"clip_id": cid,
                   "images": images,       # (V, T, H, W, 1)
                   "masks": mask_stack}    # (V, T, H, W, 5)


class RegressionClipLoader:
    """Multi-view video clips + scalar target (``PAHDataset``, loader.py:35-189).

    Reference contract: per patient, each requested view is nearest-resized
    to (144,144,48), random/center-cropped to (112,112,48) and /255; views
    stack on a leading axis; the label is the scalar ``mPAP`` (or ``Vmax``).
    Patients with NaN targets are skipped (``loader.py:140-151``).

    Yields host batches: clips_raw (V, B, R, R, T) float32 raw intensity +
    targets (B,); ``preprocess_regression_batch`` does the device crop.
    """

    def __init__(self, index: PatientIndex, ids: Sequence[str],
                 views: Sequence[str], cfg: Config, is_train: bool,
                 label_type: str = "mPAP", seed: int = 0):
        self.index = index
        self.views = tuple(views)
        self.cfg = cfg
        self.is_train = is_train
        self.label_type = label_type
        self.seed = seed
        self.ids = [
            i for i in ids if i in index.records
            and index.records[i].get(label_type) is not None
            and not np.isnan(index.records[i][label_type])
        ]
        self._cache = ByteLRU(4 << 30)

    def __len__(self) -> int:
        return len(self.ids)

    def _load(self, pid: str, view: str, t: int, r: int):
        key = (pid, view)
        hit = self._cache.get(key)
        if hit is not MISS:
            return hit
        img_p, _ = self.index.view_paths(pid, view)
        if img_p is None:
            entry = None
        else:
            vol = np.asarray(read_nifti(img_p), np.float32).squeeze()
            # nearest resize H, W → r and T → t (MONAI Resized semantics)
            hi = _nearest_indices_np(r, vol.shape[0])
            wi = _nearest_indices_np(r, vol.shape[1])
            ti = _nearest_indices_np(t, vol.shape[2])
            entry = vol[hi][:, wi][:, :, ti]
        self._cache.put(key, entry)
        return entry

    def batches(self, batch_size: int, epoch: int = 0) -> Iterator[dict]:
        rs = np.random.RandomState(self.seed + epoch if self.is_train
                                   else self.seed)
        order = np.arange(len(self.ids))
        if self.is_train:
            rs.shuffle(order)
        r = self.cfg.data.resize_hw
        t = self.cfg.data.reg_clip_frames
        # train: drop-last (static shapes for the jitted step);
        # eval: ceil so every patient is scored (final batch may be short)
        nb = (len(order) // batch_size if self.is_train
              else -(-len(order) // batch_size))
        for b in range(nb):
            take = order[b * batch_size:(b + 1) * batch_size]
            if len(take) == 0:
                return
            clips = np.zeros((len(self.views), len(take), r, r, t),
                             np.float32)
            targets = np.zeros(len(take), np.float32)
            for bi, oi in enumerate(take):
                pid = self.ids[oi]
                targets[bi] = float(self.index.records[pid][self.label_type])
                for vi, view in enumerate(self.views):
                    vol = self._load(pid, view, t, r)
                    if vol is not None:
                        clips[vi, bi] = vol
            yield {"clips_raw": clips, "targets": targets}


class AllMaskFrameLoader:
    """Every annotated frame is one sample (``Seg_PAHDataset_all_mask``,
    loader.py:1340-1678): enumerates (patient, view, frame) triples whose
    raw label sum exceeds 100, in deterministic order."""

    def __init__(self, index: PatientIndex, ids: Sequence[str],
                 views: Sequence[str], cfg: Config):
        self.index = index
        self.views = tuple(views)
        self.cfg = cfg
        self.items: list[tuple] = []
        self._cache: Dict[tuple, tuple] = {}
        for pid in ids:
            if pid not in index.records:
                continue
            for view in self.views:
                img_p, lab_p = index.view_paths(pid, view)
                if img_p is None:
                    continue
                lab = np.asarray(read_nifti(lab_p)).squeeze()
                if lab.ndim == 2:
                    lab = lab[..., None]
                for fr in labeled_frames(lab):
                    self.items.append((pid, view, int(fr)))

    def __len__(self) -> int:
        return len(self.items)

    def frames(self) -> Iterator[dict]:
        r = self.cfg.data.resize_hw
        for pid, view, fr in self.items:
            key = (pid, view)
            if key not in self._cache:
                img_p, lab_p = self.index.view_paths(pid, view)
                img = np.asarray(read_nifti(img_p)).squeeze()
                lab = np.asarray(read_nifti(lab_p)).squeeze()
                if img.ndim == 2:
                    img, lab = img[..., None], lab[..., None]
                self._cache[key] = (img, lab)
            img, lab = self._cache[key]
            yield {
                "patient": pid, "view": view, "frame": fr,
                "image_raw": _resize_nearest_np(
                    img[..., fr].astype(np.float32), (r, r)),
                "mask_raw": _resize_nearest_np(
                    lab[..., fr].astype(np.int32), (r, r)),
            }


class FullVideoLoader:
    """Whole labeled videos per patient/view (``Align_Seg_PAHDataset``,
    loader.py:745-963): the full frame sequence with raw per-frame labels,
    nearest-resized spatially; no cropping (eval-style)."""

    def __init__(self, index: PatientIndex, ids: Sequence[str],
                 views: Sequence[str], cfg: Config):
        self.index = index
        self.ids = [i for i in ids if i in index.records]
        self.views = tuple(views)
        self.cfg = cfg

    def __len__(self) -> int:
        return len(self.ids)

    def videos(self) -> Iterator[dict]:
        r = self.cfg.data.resize_hw
        for pid in self.ids:
            out = {"patient": pid, "views": {}}
            for view in self.views:
                img_p, lab_p = self.index.view_paths(pid, view)
                if img_p is None:
                    continue
                img = np.asarray(read_nifti(img_p), np.float32).squeeze()
                lab = np.asarray(read_nifti(lab_p), np.int32).squeeze()
                if img.ndim == 2:
                    img, lab = img[..., None], lab[..., None]
                out["views"][view] = {
                    "images_raw": _resize_nearest_np(img, (r, r)),
                    "masks_raw": _resize_nearest_np(lab, (r, r)),
                }
            if out["views"]:
                yield out


# -------------------------------------------------------------- device side

def _preprocess_core(rng: jax.Array, images_raw: jnp.ndarray,
                     masks_raw: jnp.ndarray, *, crop_hw: int, is_train: bool,
                     view_ids: tuple[int, ...]) -> dict:
    """Traceable body of ``preprocess_batch`` — also inlined into the fused
    train step (train/step.py) so one dispatch covers preprocess + train."""
    v, b, r, _ = images_raw.shape
    c = crop_hw

    if is_train:
        def crop_one(rng, img, msk):
            k = jax.random.split(rng, 2)
            sh = jax.random.randint(k[0], (), 0, r - c + 1)
            sw = jax.random.randint(k[1], (), 0, r - c + 1)
            img_c = jax.lax.dynamic_slice(img, (sh, sw), (c, c))
            msk_c = jax.lax.dynamic_slice(msk, (sh, sw), (c, c))
            return img_c, msk_c

        rngs = jax.random.split(rng, v * b).reshape(v, b, 2)
        imgs, msks = jax.vmap(jax.vmap(crop_one))(rngs, images_raw, masks_raw)
    else:
        imgs = center_crop(images_raw[..., None], (c, c))[..., 0]
        msks = center_crop(masks_raw[..., None], (c, c))[..., 0]

    imgs = (imgs / 255.0)[..., None]  # (V, B, c, c, 1)
    view_idx = jnp.asarray(view_ids)

    def remap(vi, m):
        return mask_to_allclass(m, vi)

    masks5 = jax.vmap(remap)(view_idx, msks)  # (V, B, c, c, 5)
    return {"images": imgs.astype(jnp.float32), "masks": masks5}


@functools.partial(jax.jit, static_argnames=("crop_hw", "is_train", "view_ids"))
def preprocess_batch(rng: jax.Array, images_raw: jnp.ndarray,
                     masks_raw: jnp.ndarray, *, crop_hw: int, is_train: bool,
                     view_ids: tuple[int, ...]) -> dict:
    """Fused crop + normalize + remap + channelize on device.

    images_raw/masks_raw: (V, B, R, R). Returns images (V, B, c, c, 1) in
    [0,1] and masks (V, B, c, c, 5). The crop window is shared between image
    and mask (MONAI paired-keys behavior) and drawn independently per
    (view, sample) — the reference's Couple dataset applies its MONAI
    transform once PER VIEW with keys ['images','masks']
    (loader.py:551,676-690), so views of one sample get independent windows
    there too.
    """
    return _preprocess_core(rng, images_raw, masks_raw, crop_hw=crop_hw,
                            is_train=is_train, view_ids=view_ids)


@functools.partial(jax.jit, static_argnames=("crop_hw", "is_train"))
def preprocess_regression_batch(rng: jax.Array, clips_raw: jnp.ndarray, *,
                                crop_hw: int, is_train: bool) -> jnp.ndarray:
    """Device crop + /255 for regression clips (PAHDataset transform,
    loader.py:155-185): (V, B, R, R, T) → (V, B, c, c, T) in [0,1].
    The crop window is shared across a sample's views and frames."""
    v, b, r, _, t = clips_raw.shape
    c = crop_hw
    if is_train:
        def crop_one(rng, clip):  # clip: (V, R, R, T) per sample
            k = jax.random.split(rng, 2)
            sh = jax.random.randint(k[0], (), 0, r - c + 1)
            sw = jax.random.randint(k[1], (), 0, r - c + 1)
            return jax.lax.dynamic_slice(
                clip, (0, sh, sw, 0), (v, c, c, t))

        rngs = jax.random.split(rng, b)
        per_sample = jnp.swapaxes(clips_raw, 0, 1)  # (B, V, R, R, T)
        out = jax.vmap(crop_one)(rngs, per_sample)
        out = jnp.swapaxes(out, 0, 1)
    else:
        off = (r - c) // 2
        out = jax.lax.dynamic_slice(
            clips_raw, (0, 0, off, off, 0), (v, b, c, c, t))
    return out / 255.0


def view_ids_tuple(views: Sequence[str]) -> tuple[int, ...]:
    return tuple(ALL_VIEWS.index(v) for v in views)

"""Datasets + host-side loader for restoration training/eval.

Re-design of `dataset.py` (L4). Differences by design:
  * NHWC float32 [-1, 1] batches straight off the loader (the reference emits
    CHW [0,1] / uint8 and rescales in the train loop — the uint8-vs-float GT
    split between `dataset.py:128-132` and `:280` is reproduced via
    `quantize_gt`).
  * deterministic per-(seed, epoch, index) RNG streams.
  * per-host sharding for multi-process data parallelism replaces
    DistributedSampler (SURVEY.md §2.6).
  * a threaded prefetch DataLoader keeps the degradation chain (two full
    512^2 chains per sample, `dataset.py:302-303`) off the device step's
    critical path.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator, Sequence

import numpy as np
from PIL import Image

from vspbfr_tpu.data.degradations import DegradationConfig, degrade_image

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG", ".webp")


def list_images(root: str) -> list[str]:
    """Recursive sorted image listing (`op/utils_train.py:8-25`)."""
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(IMG_EXTS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _load_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def _resize_crop(img: Image.Image, size: tuple[int, int],
                 rng: np.random.Generator | None) -> Image.Image:
    """Lanczos aspect-preserving resize + (random|center) crop
    (`dataset.py:264-280`, `:455-470`)."""
    w, h = img.size
    th, tw = size
    if h != th or w != tw:
        ratio = max(th / h, tw / w)
        nw, nh = int(ratio * w), int(ratio * h)
        img = img.resize((nw, nh), Image.Resampling.LANCZOS)
        hr, wr = nh - th, nw - tw
        if rng is not None:
            hi = int(rng.integers(0, hr + 1)) if hr > 0 else 0
            wi = int(rng.integers(0, wr + 1)) if wr > 0 else 0
        else:
            hi, wi = hr // 2, wr // 2
        img = img.crop((wi, hi, wi + tw, hi + th))
    return img


@dataclasses.dataclass
class RestoreTrainDataset:
    """On-the-fly degradation training set.

    n_degraded=2 with float GT  == ImageFolder_restore_free_form (stage 3);
    n_degraded=1 with quantize_gt == ImageFolder_restore (stage 2), whose GT
    round-trips through uint8 (`dataset.py:128-132`).
    """

    root: str
    im_size: tuple[int, int] = (512, 512)
    n_degraded: int = 2
    quantize_gt: bool = False
    gray_prob: float = 0.008
    config: DegradationConfig = dataclasses.field(default_factory=DegradationConfig)
    seed: int = 0
    subset: int | None = None  # debug N-image subset (`code_diffuser_train.py:369-371`)
    use_native: bool = True    # C++ engine when built and config is default

    def __post_init__(self):
        self.files = list_images(self.root)
        if not self.files:
            raise FileNotFoundError(f"no images under {self.root}")
        if self.subset:
            self.files = self.files[: self.subset]
        from vspbfr_tpu.data import native as _native
        self._native = (_native if self.use_native and _native.available()
                        and self.config == DegradationConfig() else None)

    def _degrade(self, rng: np.random.Generator, gt: np.ndarray) -> np.ndarray:
        if self._native is not None:
            seed = rng.integers(0, np.iinfo(np.uint64).max, dtype=np.uint64)
            return self._native.degrade_batch(
                gt[None], np.asarray([seed], np.uint64), n_threads=1)[0]
        return degrade_image(rng, gt, self.config)

    def __len__(self):
        return len(self.files)

    def sample_gt(self, idx: int, epoch: int = 0
                  ) -> tuple[np.ndarray, np.random.Generator]:
        """The GT-loading prefix shared with the device loader's
        `_GTView` (same SeedSequence, flip draw, resize/crop order —
        `dataset.py:264-280`): returns (gt u8 HWC, the rng positioned
        for the degradation draws)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        img = _load_rgb(self.files[idx % len(self.files)])
        if rng.integers(0, 2) == 1:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = _resize_crop(img, self.im_size, rng)
        return np.asarray(img, dtype=np.uint8), rng

    def sample(self, idx: int, epoch: int = 0) -> tuple[np.ndarray, ...]:
        """Returns (lq_1..lq_n, gt), all (H, W, 3) float32 in [-1, 1]."""
        gt_u8, rng = self.sample_gt(idx, epoch)
        gt = gt_u8.astype(np.float32) / 255.0

        lqs = [self._degrade(rng, gt) for _ in range(self.n_degraded)]

        if self.gray_prob and rng.uniform() < self.gray_prob:
            def to_gray(x):
                g = cv2.cvtColor(x, cv2.COLOR_BGR2GRAY)
                return np.repeat(g[..., None], 3, axis=2)
            lqs = [to_gray(x) for x in lqs]
            gt = to_gray(gt)  # gt_gray=True (`dataset.py:306-315`)

        if self.quantize_gt:
            gt = np.round(gt * 255.0).astype(np.uint8).astype(np.float32) / 127.5 - 1.0
        else:
            gt = gt * 2.0 - 1.0
        lqs = [x * 2.0 - 1.0 for x in lqs]
        return (*lqs, gt)


@dataclasses.dataclass
class RestoreTestDataset:
    """Paired (or lq-only) eval set (`dataset.py:376-493`): Lanczos resize +
    center crop + normalize to [-1, 1]."""

    lq_root: str
    hq_root: str | None = None
    im_size: tuple[int, int] = (512, 512)

    def __post_init__(self):
        self.lq_files = list_images(self.lq_root)
        if not self.lq_files:
            raise FileNotFoundError(f"no images under {self.lq_root}")
        self.hq_files = list_images(self.hq_root) if self.hq_root else None
        if self.hq_files is not None:
            assert len(self.hq_files) == len(self.lq_files), \
                "lq/hq count mismatch"

    def __len__(self):
        return len(self.lq_files)

    def sample(self, idx: int, epoch: int = 0):
        del epoch  # eval sets are epoch-independent
        def load(path):
            img = _resize_crop(_load_rgb(path), self.im_size, None)
            return np.asarray(img, dtype=np.float32) / 127.5 - 1.0

        lq = load(self.lq_files[idx])
        name = os.path.splitext(os.path.basename(self.lq_files[idx]))[0]
        if self.hq_files is None:
            return lq, name
        return lq, load(self.hq_files[idx]), name


class DataLoader:
    """Threaded prefetching batch loader over a dataset with `.sample(idx, epoch)`.

    Deterministic batch order given (seed, shard): indices are an
    epoch-seeded permutation sharded across hosts (DistributedSampler
    equivalent), batches assembled by worker threads into pinned numpy
    arrays, handed out through a bounded queue (double-buffered prefetch).
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 num_workers: int = 8, prefetch: int = 4, seed: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 drop_last: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.drop_last = drop_last

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).permutation(n)
        return idx[self.shard_index::self.shard_count]

    def batches_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def epoch(self, epoch: int = 0,
              start_batch: int = 0) -> Iterator[tuple[np.ndarray, ...]]:
        """Iterate one epoch of batches (tuples of stacked arrays).

        start_batch skips the first batches WITHOUT loading them (resume
        cursor: the batch sequence is deterministic given (seed, epoch))."""
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else \
            -(-len(indices) // self.batch_size)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def batch_of(b):
            rows = [self.ds.sample(int(i), epoch)
                    for i in indices[b * self.batch_size:(b + 1) * self.batch_size]]
            cols = list(zip(*rows))
            return tuple(
                np.stack(c) if isinstance(c[0], np.ndarray) else list(c)
                for c in cols)

        def worker(worker_id):
            for b in range(start_batch + worker_id, nb, self.num_workers):
                if stop.is_set():
                    return
                try:
                    q.put((b, batch_of(b)))
                except BaseException as e:  # propagate instead of deadlocking
                    q.put((b, e))
                    return

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            pending: dict[int, tuple] = {}
            nxt = start_batch
            received = start_batch
            while nxt < nb:
                while nxt not in pending and received < nb:
                    b, data = q.get()
                    if isinstance(data, BaseException):
                        raise data
                    pending[b] = data
                    received += 1
                yield pending.pop(nxt)
                nxt += 1
        finally:
            stop.set()
            # drain so producer threads blocked on a full queue can exit
            while not q.empty():
                q.get_nowait()
            for t in threads:
                t.join(timeout=1.0)

    def forever(self, start_epoch: int = 0,
                start_batch: int = 0) -> Iterator[tuple[np.ndarray, ...]]:
        """Endless stream (`sample_data` loop, `restoration_test.py:60-63`).

        (start_epoch, start_batch) is the resume cursor; use
        `divmod(global_step, batches_per_epoch())` to recover it."""
        e = start_epoch
        yield from self.epoch(e, start_batch)
        while True:
            e += 1
            yield from self.epoch(e)

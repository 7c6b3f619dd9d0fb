"""Batching data loader with background prefetch.

Replaces the reference's Keras-``Sequence`` ``DataLoader`` + multiprocessing
worker queue (preprocess.py:272-475, training.py:46-79). The expensive parts
of the reference's CPU pipeline (normalization, RPN-target matching) run on
device in this framework, so the host loop is only decode + resize + pad; a
single background thread double-buffers batches ahead of the training step
(host->HBM transfer overlaps compute via ``prefetch_to_device``).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.dataset import SegmentationDataset, load_image_gt


class DataLoader:
    """Iterates fixed-shape numpy batches.

    Batch dict: images [B,H,W,3] float32 (raw 0..255), image_meta [B,M],
    gt_class_ids [B,G], gt_boxes [B,G,4] (normalized), gt_masks [B,G,mh,mw]
    float32. Instance-less images are skipped (reference preprocess.py:337-339);
    steps_per_epoch = floor(n / batch) (reference preprocess.py:461-466).
    """

    def __init__(
        self,
        dataset: SegmentationDataset,
        config: MaskRCNNConfig,
        shuffle: bool = True,
        augment_fn=None,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``process_index``/``process_count`` shard the input pipeline
        across hosts for multi-host training (SURVEY §2.15): every host
        shuffles the full index order with the same seed, then takes its
        ``index::count`` slice — deterministic, disjoint, load-balanced."""
        self.dataset = dataset
        self.config = config
        self.shuffle = shuffle
        self.augment_fn = augment_fn
        self._rng = np.random.RandomState(seed)
        # config.batch_size is the GLOBAL batch; each host loads its share.
        assert config.batch_size % process_count == 0, (
            config.batch_size, process_count,
        )
        self.batch_size = config.batch_size // process_count
        self.process_index = process_index
        self.process_count = process_count
        self._cache_tag: Optional[str] = None

    @property
    def steps_per_epoch(self) -> int:
        return len(self.dataset) // (self.batch_size * self.process_count)

    def _sample(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        cache_dir = self.config.sample_cache_dir
        if cache_dir and self.augment_fn is None:
            # Pre-decoded sample cache: decode+resize+mini-mask once, then
            # read back a single npz per image — JPEG decode on one CPU core
            # (~10 img/s) would otherwise starve the chip (SURVEY §2.10;
            # measured in scripts/bench_loader.py). Host-side augment_fn
            # disables the cache (it needs fresh full-res masks); the
            # device-side augmentations (ops/augment.py) compose fine.
            import os

            # Fingerprint the cache by config + dataset so reusing a cache
            # dir after changing image size / mini-mask settings / dataset
            # invalidates instead of silently returning stale samples.
            if self._cache_tag is None:
                import hashlib

                c = self.config
                # Dataset identity = every image's registration record
                # (size-capped repr covers id, path, AND generator params of
                # path-less synthetic sets): a regenerated or swapped dataset
                # of the SAME length must miss, not silently serve another
                # dataset's samples.
                ds_ident = [
                    repr(info)[:2000]
                    for info in getattr(self.dataset, "_image_info", [])
                ] or [len(self.dataset)]
                key = repr(  # every knob load_image_gt consumes + dataset
                    (
                        c.image_shape, c.image_min_dim, c.image_max_dim,
                        c.image_min_scale, c.image_resize_mode,
                        c.max_gt_instances, c.use_mini_masks,
                        c.mini_mask_shape, c.num_classes, len(self.dataset),
                        ds_ident,
                    )
                )
                self._cache_tag = hashlib.md5(key.encode()).hexdigest()[:12]
            tag_dir = os.path.join(cache_dir, self._cache_tag)
            os.makedirs(tag_dir, exist_ok=True)
            path = os.path.join(tag_dir, f"{idx}.npz")
            if os.path.exists(path):
                with np.load(path) as z:
                    if "empty" in z.files:
                        return None
                    return {k: z[k] for k in z.files}
            sample = load_image_gt(self.dataset, self.config, idx, None)
            tmp = path + f".tmp{os.getpid()}"
            # write through a file handle: np.savez(str_path) APPENDS
            # ".npz" when the name doesn't end in it, which would break the
            # atomic-rename (tmp file would not exist under `tmp`)
            with open(tmp, "wb") as f:
                if sample is None:
                    np.savez(f, empty=np.zeros(1, np.uint8))
                else:
                    np.savez(f, **sample)
            os.replace(tmp, path)
            return sample
        return load_image_gt(self.dataset, self.config, idx, self.augment_fn)

    def epoch(
        self, num_workers: int = 4, fixed_steps: Optional[int] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of batches. Decode/resize runs in a small thread pool
        (cv2 releases the GIL) — the replacement for the reference's
        multiprocessing worker queue (training.py:46-79).

        ``fixed_steps``: yield EXACTLY that many batches, cycling this host's
        shard if needed. Multi-host training requires it: train/eval steps
        are cross-process collectives, so every host must run the same number
        of steps per epoch — but instance-less skips and the ragged tail
        differ per host shard. All hosts pass the same deterministic count
        (``steps_per_epoch``, a function of global dataset length only) and
        cycle to meet it, instead of deadlocking at the epoch boundary.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        if self.process_count > 1:  # per-host input shard (multi-host DP)
            from maskrcnn_tf2_tpu.parallel.distributed import host_shard

            order = host_shard(order, self.process_index, self.process_count)
        buf = []
        yielded = 0
        since_yield = 0  # samples consumed since the last completed batch
        window = max(2 * num_workers, self.batch_size)
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            pending: deque = deque()

            if fixed_steps and len(order) == 0:
                # an empty host shard would make index_stream below spin
                # forever ('while True: yield from <empty>') and deadlock the
                # other hosts at the first collective — fail loudly instead
                raise RuntimeError(
                    f"host shard {self.process_index}/{self.process_count} is "
                    f"empty (dataset of {len(self.dataset)} over "
                    f"{self.process_count} hosts) but fixed_steps="
                    f"{fixed_steps} batches were requested"
                )

            def index_stream():
                while True:
                    yield from order
                    if fixed_steps is None:
                        return  # one measured pass

            it = index_stream()

            def top_up():
                while len(pending) < window:
                    nxt = next(it, None)
                    if nxt is None:
                        break
                    pending.append(pool.submit(self._sample, int(nxt)))

            top_up()
            while pending and (fixed_steps is None or yielded < fixed_steps):
                sample = pending.popleft().result()
                top_up()
                since_yield += 1
                if fixed_steps is not None and since_yield > 2 * max(
                    len(order), 1
                ) + self.batch_size:
                    raise RuntimeError(
                        f"host shard {self.process_index}/{self.process_count} "
                        f"has too few usable samples to fill a batch of "
                        f"{self.batch_size} (cycled twice without completing one)"
                    )
                if sample is None:
                    continue
                buf.append(sample)
                if len(buf) == self.batch_size:
                    yield self._collate(buf)
                    buf = []
                    yielded += 1
                    since_yield = 0

    def __iter__(self):
        """Endless stream (reference wraps the generator in .repeat())."""
        while True:
            yield from self.epoch()

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        batch = {
            "images": np.stack([s["image"] for s in samples]).astype(np.float32),
            "image_meta": np.stack([s["image_meta"] for s in samples]),
            "gt_class_ids": np.stack([s["gt_class_ids"] for s in samples]),
            "gt_boxes": np.stack([s["gt_boxes"] for s in samples]),
            "gt_masks": np.stack([s["gt_masks"] for s in samples]).astype(
                np.float32
            ),
        }
        if self.config.random_rois:
            from maskrcnn_tf2_tpu.data.random_rois import generate_random_rois

            batch["input_rois"] = np.stack(
                [
                    generate_random_rois(
                        self.config.image_shape,
                        self.config.random_rois,
                        s["gt_boxes"],
                        self._rng,
                    )
                    for s in samples
                ]
            )
        return batch


def prefetch(iterator, size: int = 2):
    """Run ``iterator`` in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Prefetch + async host->device transfer (double buffering into HBM)."""
    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    return prefetch(map(put, iterator), size=size)

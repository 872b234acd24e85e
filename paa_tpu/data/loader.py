"""Batched, bucketed data loading.

Replaces the reference's DataLoader stack (paa_core/data/build.py:107-177:
DistributedSampler -> GroupedBatchSampler -> IterationBasedBatchSampler ->
torch DataLoader workers -> BatchCollator pad-to-batch-max) with a
TPU-native design: images are resized then padded into a SMALL, FIXED set
of size buckets (cfg.TPU.TRAIN_BUCKETS) so every train/eval step runs one
of a handful of XLA programs, instead of the reference's pad-to-batch-max
dynamic shapes (structures/image_list.py:54-61) that would recompile
constantly.

The reference's aspect-ratio grouping (build.py:85-104, two bins) maps
onto bucket grouping: batches are formed within a bucket. The iteration-
based infinite sampler with epoch-seeded shuffling mirrors
samplers/iteration_based_batch_sampler.py + distributed.py. Decoding and
augmentation run in a thread pool (cv2 releases the GIL) with batch
prefetch, replacing torch worker processes.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class BucketAssigner:
    """Assigns a resized (h, w) to the smallest bucket that contains it."""

    def __init__(self, buckets: Sequence[Tuple[int, int]]):
        self.buckets = [tuple(b) for b in buckets]
        order = np.argsort([h * w for h, w in self.buckets])
        self._by_area = [self.buckets[i] for i in order]

    def assign(self, h, w):
        for bh, bw in self._by_area:
            if h <= bh and w <= bw:
                return (bh, bw)
        raise ValueError(
            f"image of resized size ({h}, {w}) fits no bucket "
            f"{self.buckets}; add a larger bucket to cfg.TPU.*_BUCKETS"
        )

    def assign_by_aspect(self, width, height):
        """Static bucket prediction from the ORIGINAL aspect ratio
        (resize preserves aspect, flip doesn't change it) — the analogue
        of the reference's aspect-ratio grouping bins."""
        if width >= height:
            cands = [b for b in self._by_area if b[1] >= b[0]]
        else:
            cands = [b for b in self._by_area if b[0] >= b[1]]
        return cands[0] if cands else self._by_area[-1]


def pad_to_bucket(image, bucket_hw):
    bh, bw = bucket_hw
    h, w = image.shape[:2]
    assert h <= bh and w <= bw, (image.shape, bucket_hw)
    out = np.zeros((bh, bw, image.shape[2]), dtype=image.dtype)
    out[:h, :w] = image
    return out


def make_batch(samples, bucket_hw, max_gt, mask_size=112,
               normalize=None, device_normalize=False):
    """Assemble transformed samples into fixed-shape arrays.

    samples: list of dicts with image (float32 HWC), boxes, labels,
    image_id, orig_size (h, w). Short batches are padded with zero images
    and image_id -1.

    normalize: optional (pixel_mean, pixel_std) — samples then carry
    RAW uint8 images (transform built with defer_normalize=True) and
    (x - mean)/std is computed straight into the padded float32 batch
    buffer: one fused pass instead of per-image temporaries, with
    bit-identical values.

    device_normalize: emit the batch's images as RAW padded uint8 and
    leave normalization to the jitted device program
    (ops/image_norm.py) — 4x less host->device traffic, bit-identical
    results. The consuming step/eval fn dispatches on dtype.
    """
    bsz = len(samples)
    bh, bw = bucket_hw
    images = np.zeros(
        (bsz, bh, bw, 3),
        dtype=np.uint8 if device_normalize else np.float32,
    )
    gt_boxes = np.zeros((bsz, max_gt, 4), dtype=np.float32)
    gt_labels = np.zeros((bsz, max_gt), dtype=np.int32)
    image_sizes = np.zeros((bsz, 2), dtype=np.float32)
    orig_sizes = np.zeros((bsz, 2), dtype=np.float32)
    image_ids = np.full((bsz,), -1, dtype=np.int64)
    with_masks = any(s.get("masks") is not None for s in samples)
    gt_masks = (
        np.zeros((bsz, max_gt, mask_size, mask_size), dtype=np.uint8)
        if with_masks else None
    )
    with_kps = any(s.get("keypoints") is not None for s in samples)
    num_kps = next(
        (
            s["keypoints"].shape[1]
            for s in samples
            if s.get("keypoints") is not None and len(s["keypoints"])
        ),
        17,
    ) if with_kps else 0
    gt_keypoints = (
        np.zeros((bsz, max_gt, num_kps, 3), dtype=np.float32)
        if with_kps else None
    )

    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        if device_normalize:
            images[i, :h, :w] = img  # raw uint8 (sentinel f32 zeros cast)
        elif normalize is not None and img.dtype == np.uint8:
            from .transforms import normalize_image

            normalize_image(img, *normalize, out=images[i, :h, :w])
        else:
            images[i, :h, :w] = img
        image_sizes[i] = (h, w)
        orig_sizes[i] = s["orig_size"]
        image_ids[i] = s["image_id"]
        boxes, labels = s["boxes"], s["labels"]
        n = min(len(labels), max_gt)
        if n:
            gt_boxes[i, :n] = boxes[:n]
            gt_labels[i, :n] = labels[:n]
            if gt_masks is not None and s.get("masks") is not None:
                gt_masks[i, :n] = s["masks"][:n]
            if gt_keypoints is not None and s.get("keypoints") is not None:
                gt_keypoints[i, :n] = s["keypoints"][:n]
    batch = {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "image_sizes": image_sizes,
        "orig_sizes": orig_sizes,
        "image_ids": image_ids,
    }
    if gt_masks is not None:
        batch["gt_masks"] = gt_masks
    if gt_keypoints is not None:
        batch["gt_keypoints"] = gt_keypoints
    return batch


class DetectionLoader:
    """Iterates fixed-shape batches over a COCO-style dataset."""

    def __init__(self, dataset, transform, buckets, batch_size, max_gt,
                 is_train=True, seed=0, num_threads=4, prefetch=2,
                 start_iter=0, max_iter=None, process_count=1,
                 process_index=0, normalize=None, device_normalize=False):
        """``batch_size`` is the GLOBAL batch; with ``process_count`` > 1
        every process computes the identical global batch/bucket stream
        (deterministic seed + per-(epoch, index) augmentation draws) and
        loads only its ``process_index``-th interleaved slice — the
        multi-host analogue of the reference's DistributedSampler
        (paa_core/data/samplers/distributed.py:10-66) that additionally
        keeps XLA program shapes aligned across hosts."""
        self.dataset = dataset
        self.transform = transform
        self.assigner = BucketAssigner(buckets)
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.is_train = is_train
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.start_iter = start_iter
        self.max_iter = max_iter
        assert batch_size % process_count == 0, (
            f"global batch {batch_size} not divisible by "
            f"{process_count} processes"
        )
        self.process_count = process_count
        self.process_index = process_index
        # fused normalize-into-batch-buffer vs raw-uint8 device
        # normalization (see make_batch)
        self.normalize = normalize
        self.device_normalize = device_normalize

        # static bucket prediction per image (aspect grouping)
        self._bucket_of = [
            self.assigner.assign_by_aspect(r.width, r.height)
            for r in dataset.records
        ]

    def _predicted_bucket(self, idx, epoch):
        """Exact bucket for a sample, computed WITHOUT loading the image:
        the resize rule is deterministic given the record's size and the
        (deterministic) size draw, so every process predicts the same
        bucket. Falls back to the aspect-group bucket for transforms
        without known sizes."""
        from .transforms import get_resize_size

        r = self.dataset.records[idx]
        t = self.transform
        if self.is_train and hasattr(t, "min_sizes"):
            size_draw, _ = self._draws(epoch, idx)
            chosen = t.min_sizes[int(size_draw * len(t.min_sizes))]
            max_size = t.max_size
        elif hasattr(t, "min_size"):
            chosen, max_size = t.min_size, t.max_size
        else:
            return self._bucket_of[idx]
        oh, ow = get_resize_size((r.width, r.height), chosen, max_size)
        return self.assigner.assign(oh, ow)

    def _draws(self, epoch, index):
        """Deterministic per-(epoch, sample) augmentation draws."""
        rng = np.random.RandomState(
            (self.seed * 1000003 + epoch * 9973 + index) % (2 ** 31)
        )
        return rng.random_sample(), rng.random_sample()

    def _load_sample(self, index, epoch=0):
        if index < 0:  # eval tail padding sentinel
            return {
                "image": np.zeros((1, 1, 3), dtype=np.float32),
                "boxes": np.zeros((0, 4), dtype=np.float32),
                "labels": np.zeros((0,), dtype=np.int64),
                "masks": None,
                "keypoints": None,
                "image_id": -1,
                "orig_size": (1, 1),
            }
        r = self.dataset.records[index]
        image = self.dataset.load_image(index)
        boxes, labels = r.boxes.copy(), r.labels.copy()
        masks = None
        if getattr(r, "polygons", None) is not None:
            from ..structures.masks import rasterize_instances

            # box-normalized masks: resize-invariant, flipped by the
            # transform alongside the image
            masks = rasterize_instances(
                r.polygons, r.boxes, max(len(labels), 1)
            )[: len(labels)]
        keypoints = getattr(r, "keypoints", None)
        out = self.transform(
            image, boxes, masks=masks, keypoints=keypoints,
            draws=self._draws(epoch, index) if self.is_train else None,
        )
        image, boxes = out[0], out[1]
        rest = list(out[2:])
        if masks is not None:
            masks = rest.pop(0)
        if keypoints is not None:
            keypoints = rest.pop(0)
        return {
            "image": image,
            "boxes": boxes if boxes is not None else np.zeros((0, 4)),
            "labels": labels,
            "masks": masks,
            "keypoints": keypoints,
            "image_id": r.id,
            "orig_size": (r.height, r.width),
        }

    def _batches_of_indices(self):
        """Yields (epoch, bucket, global_indices); deterministic given
        (seed, start_iter) so all processes agree on the stream."""
        n = len(self.dataset)
        if self.is_train:
            # infinite, epoch-seeded shuffle, grouped by bucket
            # (IterationBasedBatchSampler + GroupedBatchSampler)
            it = 0
            epoch = 0
            while self.max_iter is None or it < self.max_iter:
                rng = np.random.RandomState(self.seed + epoch)
                perm = rng.permutation(n)
                pending = {}
                for idx in perm:
                    b = self._predicted_bucket(int(idx), epoch)
                    pending.setdefault(b, []).append(int(idx))
                    if len(pending[b]) == self.batch_size:
                        if it >= self.start_iter:
                            yield epoch, b, pending.pop(b)
                        else:
                            pending.pop(b)
                        it += 1
                        if self.max_iter is not None and it >= self.max_iter:
                            return
                epoch += 1
        else:
            # sequential, grouped by bucket, dropping nothing; tail
            # batches are padded to batch_size with sentinel index -1
            # (dummy image_id -1 samples) so eval compiles exactly one
            # program per bucket instead of one per leftover size
            pending = {}
            for idx in range(n):
                b = self._predicted_bucket(idx, 0)
                pending.setdefault(b, []).append(idx)
                if len(pending[b]) == self.batch_size:
                    yield 0, b, pending.pop(b)
            for b, rest in pending.items():
                if rest:
                    yield 0, b, rest + [-1] * (self.batch_size - len(rest))

    def _assemble(self, epoch, group_bucket, indices, pool):
        # this process loads only its interleaved slice of the global
        # batch (identical across processes for process_count=1)
        local = indices[self.process_index::self.process_count]
        samples = list(
            pool.map(lambda i: self._load_sample(i, epoch), local)
        )
        # the bucket is the deterministic aspect-group key, NOT the
        # realized max size: all processes must compile/run the same
        # program shape at every step
        for s in samples:
            h, w = s["image"].shape[:2]
            assert h <= group_bucket[0] and w <= group_bucket[1], (
                (h, w), group_bucket
            )
        return make_batch(
            samples, group_bucket, self.max_gt, normalize=self.normalize,
            device_normalize=self.device_normalize,
        )

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for epoch, bucket, indices in self._batches_of_indices():
                    q.put(self._assemble(epoch, bucket, indices, pool))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        pool.shutdown(wait=False)


def make_data_loader(cfg, dataset, is_train=True, start_iter=0, seed=0):
    from .transforms import build_transforms

    transform = build_transforms(
        cfg, is_train=is_train, seed=seed, defer_normalize=True
    )
    buckets = (
        cfg.TPU.TRAIN_BUCKETS if is_train else cfg.TPU.TEST_BUCKETS
    )
    batch_size = (
        cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH
    )
    import jax

    return DetectionLoader(
        dataset,
        transform,
        buckets,
        batch_size,
        cfg.TPU.MAX_GT,
        is_train=is_train,
        seed=seed,
        num_threads=cfg.DATALOADER.NUM_WORKERS,
        start_iter=start_iter,
        max_iter=cfg.SOLVER.MAX_ITER if is_train else None,
        process_count=jax.process_count() if is_train else 1,
        process_index=jax.process_index() if is_train else 0,
        normalize=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD),
        device_normalize=cfg.TPU.DEVICE_NORMALIZE,
    )

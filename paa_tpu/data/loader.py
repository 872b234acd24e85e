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


def make_batch(samples, bucket_hw, max_gt, mask_size=112):
    """Assemble transformed samples into fixed-shape arrays.

    samples: list of dicts with image (float32 HWC), boxes, labels,
    image_id, orig_size (h, w). Short batches are padded with zero images
    and image_id -1.
    """
    bsz = len(samples)
    bh, bw = bucket_hw
    images = np.zeros((bsz, bh, bw, 3), dtype=np.float32)
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

    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
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
    if gt_masks is not None:
        return {
            "images": images,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_masks": gt_masks,
            "image_sizes": image_sizes,
            "orig_sizes": orig_sizes,
            "image_ids": image_ids,
        }
    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "image_sizes": image_sizes,
        "orig_sizes": orig_sizes,
        "image_ids": image_ids,
    }


class DetectionLoader:
    """Iterates fixed-shape batches over a COCO-style dataset."""

    def __init__(self, dataset, transform, buckets, batch_size, max_gt,
                 is_train=True, seed=0, num_threads=4, prefetch=2,
                 start_iter=0, max_iter=None):
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

        # static bucket prediction per image (aspect grouping)
        self._bucket_of = [
            self.assigner.assign_by_aspect(r.width, r.height)
            for r in dataset.records
        ]

    def _load_sample(self, index):
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
        if masks is not None:
            image, boxes, masks = self.transform(image, boxes, masks)
        else:
            image, boxes = self.transform(image, boxes)
        return {
            "image": image,
            "boxes": boxes if boxes is not None else np.zeros((0, 4)),
            "labels": labels,
            "masks": masks,
            "image_id": r.id,
            "orig_size": (r.height, r.width),
        }

    def _batches_of_indices(self) -> Iterator[List[int]]:
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
                    b = self._bucket_of[idx]
                    pending.setdefault(b, []).append(int(idx))
                    if len(pending[b]) == self.batch_size:
                        if it >= self.start_iter:
                            yield pending.pop(b)
                        else:
                            pending.pop(b)
                        it += 1
                        if self.max_iter is not None and it >= self.max_iter:
                            return
                epoch += 1
        else:
            # sequential, grouped by bucket, dropping nothing
            pending = {}
            order = []
            for idx in range(n):
                b = self._bucket_of[idx]
                pending.setdefault(b, []).append(idx)
                if len(pending[b]) == self.batch_size:
                    yield pending.pop(b)
            for b, rest in pending.items():
                if rest:
                    yield rest

    def _assemble(self, indices, pool):
        samples = list(pool.map(self._load_sample, indices))
        # actual bucket from realized sizes (must agree across the batch
        # by construction of aspect grouping; take the max to be safe)
        hs = max(s["image"].shape[0] for s in samples)
        ws = max(s["image"].shape[1] for s in samples)
        bucket = self.assigner.assign(hs, ws)
        return make_batch(samples, bucket, self.max_gt)

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for indices in self._batches_of_indices():
                    q.put(self._assemble(indices, pool))
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

    transform = build_transforms(cfg, is_train=is_train, seed=seed)
    buckets = (
        cfg.TPU.TRAIN_BUCKETS if is_train else cfg.TPU.TEST_BUCKETS
    )
    batch_size = (
        cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH
    )
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
    )

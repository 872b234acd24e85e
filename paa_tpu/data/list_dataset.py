"""In-memory list-of-paths dataset.

Port of the reference's ListDataset
(paa_core/data/datasets/list_dataset.py): wraps a plain list of image
file paths with a dummy full-image GT box, exposing the same dataset
protocol as COCODataset (records / get_img_info / load_image) so the
bucketed loader and inference engine can run over ad-hoc image lists
(e.g. demo folders) without COCO annotations.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class _ListRecord:
    id: int
    file_name: str
    width: int
    height: int
    boxes: np.ndarray
    labels: np.ndarray
    polygons: Optional[list] = None
    keypoints: Optional[np.ndarray] = None


class ListDataset:
    """image_paths: list of absolute (or root-relative) image paths.

    Image sizes are probed once up front (the reference leaves
    get_img_info unimplemented, which breaks aspect-ratio grouping;
    here the loader's bucketing needs real dimensions)."""

    def __init__(self, image_paths: List[str], root: str = ""):
        import cv2

        self.root = root
        self.records: List[_ListRecord] = []
        for i, p in enumerate(image_paths):
            path = os.path.join(root, p) if root else p
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(path)
            h, w = img.shape[:2]
            # dummy target: one full-image box, label 1
            # (list_dataset.py:20-21)
            self.records.append(
                _ListRecord(
                    id=i,
                    file_name=p,
                    width=w,
                    height=h,
                    boxes=np.asarray(
                        [[0.0, 0.0, w - 1.0, h - 1.0]], np.float32
                    ),
                    labels=np.asarray([1], np.int64),
                )
            )

    def __len__(self):
        return len(self.records)

    def get_img_info(self, index):
        r = self.records[index]
        return {
            "id": r.id, "width": r.width, "height": r.height,
            "file_name": r.file_name,
        }

    def image_path(self, index):
        r = self.records[index]
        return (
            os.path.join(self.root, r.file_name)
            if self.root
            else r.file_name
        )

    def load_image(self, index):
        import cv2

        img = cv2.imread(self.image_path(index), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.image_path(index))
        return img

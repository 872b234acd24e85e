"""COCO detection dataset.

Mirrors reference paa_core/data/datasets/coco.py:39-101 without
pycocotools/torchvision (neither available here): the instances json is
parsed with stdlib json into flat numpy records. Semantics preserved:

- image ids sorted; images without valid annotations removed at train
  (has_valid_annotation: empty, or all boxes with w/h <= 1, coco.py:21-36)
- crowd annotations filtered (coco.py:71)
- json category ids -> contiguous 1..80 by ascending json id
- boxes xywh -> xyxy with the +1 convention (BoxList.convert) and
  clipped to the image with degenerate boxes removed
  (clip_to_image(remove_empty=True))
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class ImageRecord:
    id: int
    file_name: str
    width: int
    height: int
    boxes: np.ndarray  # (n, 4) float32 xyxy
    labels: np.ndarray  # (n,) int32 contiguous 1..C
    polygons: Optional[list] = None  # per-instance COCO polygon lists
    keypoints: Optional[object] = None  # (G, K, 3) float array


def _xywh_to_xyxy(boxes):
    """BoxList 'xywh'->'xyxy' conversion (bounding_box.py:86-99):
    x2 = x1 + max(w - 1, 0)."""
    out = boxes.copy()
    out[:, 2] = boxes[:, 0] + np.clip(boxes[:, 2] - 1, 0, None)
    out[:, 3] = boxes[:, 1] + np.clip(boxes[:, 3] - 1, 0, None)
    return out


def _clip_remove_empty(boxes, labels, width, height):
    """clip_to_image(remove_empty=True) (bounding_box.py:215-227).
    Returns the keep mask so parallel fields (polygons) can follow."""
    boxes[:, 0] = np.clip(boxes[:, 0], 0, width - 1)
    boxes[:, 1] = np.clip(boxes[:, 1], 0, height - 1)
    boxes[:, 2] = np.clip(boxes[:, 2], 0, width - 1)
    boxes[:, 3] = np.clip(boxes[:, 3], 0, height - 1)
    keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
    return boxes[keep], labels[keep], keep


def _has_valid_annotation(annos):
    if len(annos) == 0:
        return False
    # all boxes close to zero area
    if all(any(o <= 1 for o in a["bbox"][2:]) for a in annos):
        return False
    return True


class COCODataset:
    def __init__(self, ann_file, root,
                 remove_images_without_annotations=True,
                 with_masks=False, with_keypoints=False):
        self.root = root
        self.with_masks = with_masks
        self.with_keypoints = with_keypoints
        with open(ann_file) as f:
            data = json.load(f)

        cat_ids = sorted(c["id"] for c in data["categories"])
        self.json_category_id_to_contiguous_id = {
            v: i + 1 for i, v in enumerate(cat_ids)
        }
        self.contiguous_category_id_to_json_id = {
            v: k for k, v in self.json_category_id_to_contiguous_id.items()
        }
        self.categories = {
            c["id"]: c["name"] for c in data["categories"]
        }

        annos_by_image: Dict[int, list] = {}
        for a in data.get("annotations", []):
            annos_by_image.setdefault(a["image_id"], []).append(a)

        images = {img["id"]: img for img in data["images"]}
        ids = sorted(images.keys())

        self.records: List[ImageRecord] = []
        for img_id in ids:
            annos = annos_by_image.get(img_id, [])
            if remove_images_without_annotations and not _has_valid_annotation(
                annos
            ):
                continue
            img = images[img_id]
            non_crowd = [a for a in annos if a.get("iscrowd", 0) == 0]
            if non_crowd:
                boxes = np.asarray(
                    [a["bbox"] for a in non_crowd], dtype=np.float32
                ).reshape(-1, 4)
                labels = np.asarray(
                    [
                        self.json_category_id_to_contiguous_id[
                            a["category_id"]
                        ]
                        for a in non_crowd
                    ],
                    dtype=np.int32,
                )
            else:
                boxes = np.zeros((0, 4), dtype=np.float32)
                labels = np.zeros((0,), dtype=np.int32)
            boxes = _xywh_to_xyxy(boxes)
            boxes, labels, keep = _clip_remove_empty(
                boxes, labels, img["width"], img["height"]
            )
            polygons = None
            if with_masks:
                polys_all = [
                    a.get("segmentation") or [] for a in non_crowd
                ]
                polygons = [
                    p for p, k in zip(polys_all, keep) if k
                ]
            keypoints = None
            if with_keypoints:
                if non_crowd:
                    kps_all = np.asarray(
                        [
                            np.asarray(
                                a.get("keypoints") or [0.0] * 51,
                                dtype=np.float32,
                            ).reshape(-1, 3)
                            for a in non_crowd
                        ],
                        dtype=np.float32,
                    )
                    keypoints = kps_all[keep]
                else:
                    keypoints = np.zeros((0, 17, 3), dtype=np.float32)
            self.records.append(
                ImageRecord(
                    id=img_id,
                    file_name=img["file_name"],
                    width=img["width"],
                    height=img["height"],
                    boxes=boxes,
                    labels=labels,
                    polygons=polygons,
                    keypoints=keypoints,
                )
            )

        # eval needs the full GT (including crowd) — keep raw annos around
        self._raw_annotations = annos_by_image

    def __len__(self):
        return len(self.records)

    def get_img_info(self, index):
        r = self.records[index]
        return {"id": r.id, "width": r.width, "height": r.height,
                "file_name": r.file_name}

    def image_path(self, index):
        return os.path.join(self.root, self.records[index].file_name)

    def load_image(self, index):
        """Decode to BGR uint8 HWC (cv2 native order — the Caffe2
        convention the reference reaches via PIL-RGB + channel flip)."""
        import cv2

        path = self.image_path(index)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img

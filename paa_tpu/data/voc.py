"""Pascal VOC dataset.

Mirrors reference paa_core/data/datasets/voc.py:17-135: XML annotation
parsing, the fixed 20-class list (+background at index 0), the -1 pixel
coordinate shift (voc.py TO_REMOVE in _preprocess_annotation), and the
``use_difficult`` switch (difficult objects are kept only at test time).
Records use the same ImageRecord layout as the COCO dataset so the loader
and evaluation stack are shared.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from .coco import ImageRecord

CLASSES = (
    "__background__",
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class PascalVOCDataset:
    def __init__(self, data_dir, split, use_difficult=False):
        self.root = data_dir
        self.image_set = split
        self.keep_difficult = use_difficult

        self._annopath = os.path.join(data_dir, "Annotations", "%s.xml")
        self._imgpath = os.path.join(data_dir, "JPEGImages", "%s.jpg")
        imgset = os.path.join(
            data_dir, "ImageSets", "Main", f"{split}.txt"
        )
        with open(imgset) as f:
            self.ids = [line.strip() for line in f if line.strip()]
        self.class_to_ind = {c: i for i, c in enumerate(CLASSES)}
        self.categories = {i: c for i, c in enumerate(CLASSES)}

        self.records: List[ImageRecord] = []
        self._difficult = {}
        for idx, img_id in enumerate(self.ids):
            anno = ET.parse(self._annopath % img_id).getroot()
            size = anno.find("size")
            width = int(size.find("width").text)
            height = int(size.find("height").text)
            boxes, labels, difficult = [], [], []
            for obj in anno.iter("object"):
                is_difficult = int(obj.find("difficult").text) == 1
                if is_difficult and not self.keep_difficult:
                    continue
                name = obj.find("name").text.lower().strip()
                bb = obj.find("bndbox")
                # -1: VOC is 1-indexed (reference voc.py TO_REMOVE)
                box = [
                    float(bb.find("xmin").text) - 1,
                    float(bb.find("ymin").text) - 1,
                    float(bb.find("xmax").text) - 1,
                    float(bb.find("ymax").text) - 1,
                ]
                boxes.append(box)
                labels.append(self.class_to_ind[name])
                difficult.append(is_difficult)
            self.records.append(
                ImageRecord(
                    id=idx,
                    file_name=f"{img_id}.jpg",
                    width=width,
                    height=height,
                    boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int32),
                )
            )
            self._difficult[idx] = np.asarray(difficult, dtype=bool)

    def __len__(self):
        return len(self.records)

    def image_path(self, index):
        return self._imgpath % self.ids[index]

    def load_image(self, index):
        import cv2

        img = cv2.imread(self.image_path(index), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.image_path(index))
        return img

    def get_img_info(self, index):
        r = self.records[index]
        return {"id": r.id, "width": r.width, "height": r.height}

    def map_class_id_to_class_name(self, class_id):
        return CLASSES[class_id]

"""Data pipeline tests on a synthetic COCO dataset (tiny json + generated
JPEGs), mirroring the reference's transform math and sampler invariants."""

import json
import os

import numpy as np
import pytest

from paa_tpu.data.coco import COCODataset
from paa_tpu.data.loader import BucketAssigner, DetectionLoader, make_batch
from paa_tpu.data.transforms import (
    EvalTransform,
    get_resize_size,
    hflip_image_and_boxes,
    normalize_image,
)


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    import cv2

    rng = np.random.RandomState(0)
    images, annotations = [], []
    sizes = [(640, 480), (480, 640), (500, 375), (123, 456)]
    ann_id = 1
    for i, (w, h) in enumerate(sizes):
        name = f"img{i}.jpg"
        cv2.imwrite(
            str(img_dir / name),
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
        )
        images.append(
            dict(id=i + 1, file_name=name, width=w, height=h)
        )
        n_boxes = 2 if i < 3 else 0  # last image empty
        for _ in range(n_boxes):
            x = float(rng.randint(0, w // 2))
            y = float(rng.randint(0, h // 2))
            bw = float(rng.randint(10, w // 2))
            bh = float(rng.randint(10, h // 2))
            annotations.append(
                dict(
                    id=ann_id, image_id=i + 1,
                    bbox=[x, y, bw, bh], area=bw * bh,
                    category_id=rng.choice([1, 2, 18]), iscrowd=0,
                )
            )
            ann_id += 1
    categories = [
        dict(id=1, name="person"), dict(id=2, name="bicycle"),
        dict(id=18, name="dog"),
    ]
    ann_file = root / "instances.json"
    ann_file.write_text(
        json.dumps(
            dict(
                images=images,
                annotations=[
                    {**a, "category_id": int(a["category_id"])}
                    for a in annotations
                ],
                categories=categories,
            )
        )
    )
    return str(ann_file), str(img_dir)


def test_dataset_parsing(synthetic_coco):
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(ann_file, img_dir, remove_images_without_annotations=True)
    assert len(ds) == 3  # empty image filtered
    # contiguous label mapping: json ids 1,2,18 -> 1,2,3
    assert ds.json_category_id_to_contiguous_id == {1: 1, 2: 2, 18: 3}
    r = ds.records[0]
    assert r.boxes.shape[1] == 4
    assert (r.labels >= 1).all() and (r.labels <= 3).all()
    # xyxy within image (+1 convention clip)
    assert (r.boxes[:, 2] <= r.width - 1).all()

    ds_all = COCODataset(ann_file, img_dir,
                         remove_images_without_annotations=False)
    assert len(ds_all) == 4


def test_resize_rule_matches_reference():
    # shortest side to 800, cap 1333 (transforms.py:35-55)
    assert get_resize_size((640, 480), 800, 1333) == (800, 1066)
    assert get_resize_size((480, 640), 800, 1333) == (1066, 800)
    # max cap engages: 1280x720 -> scale so long side 1333
    oh, ow = get_resize_size((1280, 720), 800, 1333)
    assert ow == 1333 and oh == int(round(1333 * 720 / 1280) / (720 / 720))
    # equality short-circuit
    assert get_resize_size((800, 1000), 800, 1333) == (1000, 800)


def test_hflip_box_convention():
    img = np.zeros((10, 20, 3), dtype=np.uint8)
    boxes = np.array([[2.0, 1.0, 5.0, 4.0]], dtype=np.float32)
    _, flipped = hflip_image_and_boxes(img, boxes)
    # BoxList.transpose(0): x1' = W - x2 - 1, x2' = W - x1 - 1
    np.testing.assert_allclose(flipped[0], [20 - 5 - 1, 1, 20 - 2 - 1, 4])


def test_normalize_bgr_mean():
    img = np.full((2, 2, 3), 100, dtype=np.uint8)
    mean = [102.9801, 115.9465, 122.7717]
    out = normalize_image(img, mean, [1.0, 1.0, 1.0])
    np.testing.assert_allclose(out[0, 0], 100 - np.array(mean), atol=1e-5)


def test_bucket_assignment():
    ba = BucketAssigner([(800, 1344), (1344, 800)])
    assert ba.assign(800, 1066) == (800, 1344)
    assert ba.assign(1066, 800) == (1344, 800)
    assert ba.assign_by_aspect(640, 480) == (800, 1344)  # landscape
    assert ba.assign_by_aspect(480, 640) == (1344, 800)  # portrait
    with pytest.raises(ValueError):
        ba.assign(1400, 900)


def test_loader_batches(synthetic_coco):
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(ann_file, img_dir)
    transform = EvalTransform(200, 333, [102.98, 115.95, 122.77],
                              [1.0, 1.0, 1.0])
    loader = DetectionLoader(
        ds, transform, buckets=[(208, 336), (336, 208)], batch_size=2,
        max_gt=10, is_train=False, num_threads=2,
    )
    batches = list(loader)
    total = sum(len(b["image_ids"][b["image_ids"] >= 0]) for b in batches)
    assert total == 3
    for b in batches:
        # tail batches are padded to the static batch size (one XLA
        # program per bucket at eval, not one per leftover size)
        assert b["images"].shape[0] == 2
        assert b["images"].ndim == 4
        assert b["images"].shape[1:3] in [(208, 336), (336, 208)]
        assert b["gt_boxes"].shape[1:] == (10, 4)
        # content extent <= bucket
        assert (b["image_sizes"] <= b["images"].shape[1:3]).all()


def test_train_loader_infinite_and_grouped(synthetic_coco):
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(ann_file, img_dir)
    transform = EvalTransform(200, 333, [0, 0, 0], [1, 1, 1])
    loader = DetectionLoader(
        ds, transform, buckets=[(208, 336), (336, 208)], batch_size=2,
        max_gt=10, is_train=True, num_threads=2, max_iter=5, seed=0,
    )
    batches = list(loader)
    assert len(batches) == 5
    for b in batches:
        # all images in a batch share one bucket shape
        assert b["images"].shape[0] == 2
        assert (b["image_ids"] >= 0).all()


def test_make_batch_truncates_gt():
    samples = [
        dict(
            image=np.zeros((50, 60, 3), np.float32),
            boxes=np.tile(np.array([[1, 2, 3, 4]], np.float32), (20, 1)),
            labels=np.ones(20, np.int32),
            image_id=7,
            orig_size=(100, 120),
        )
    ]
    b = make_batch(samples, (64, 64), max_gt=5)
    assert b["gt_boxes"].shape == (1, 5, 4)
    assert (b["gt_labels"][0] == 1).all()


def test_list_dataset(tmp_path):
    """ListDataset (reference list_dataset.py): ad-hoc image paths with
    a dummy full-image GT box, exposing the standard dataset protocol."""
    import cv2

    from paa_tpu.data.list_dataset import ListDataset

    paths = []
    for i, (w, h) in enumerate([(40, 30), (24, 48)]):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, np.zeros((h, w, 3), np.uint8))
        paths.append(p)
    ds = ListDataset(paths)
    assert len(ds) == 2
    info = ds.get_img_info(0)
    assert (info["width"], info["height"]) == (40, 30)
    np.testing.assert_array_equal(
        ds.records[0].boxes, [[0.0, 0.0, 39.0, 29.0]]
    )
    assert ds.records[0].labels.tolist() == [1]
    assert ds.load_image(1).shape == (48, 24, 3)

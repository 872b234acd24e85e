"""Multi-host data-parallel readiness (pure-python process simulation).

The loader's process sharding replaces the reference's DistributedSampler
(paa_core/data/samplers/distributed.py:10-66): every process derives the
IDENTICAL global batch + bucket stream from the seed (deterministic
per-(epoch, index) augmentation draws) and loads only its interleaved
slice — required so all hosts run the same XLA program shape each step.
"""

import json

import numpy as np
import pytest

from paa_tpu.data.coco import COCODataset
from paa_tpu.data.loader import DetectionLoader
from paa_tpu.data.transforms import TrainTransform


@pytest.fixture(scope="module")
def multihost_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_mh")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(8):
        w, h = (200, 150) if i % 2 == 0 else (150, 200)
        name = f"img{i}.jpg"
        cv2.imwrite(
            str(img_dir / name),
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
        )
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        annotations.append(
            dict(id=i + 1, image_id=i + 1, bbox=[5, 5, 40, 40],
                 area=1600, category_id=1, iscrowd=0)
        )
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="thing")],
    )))
    return str(ann_file), str(img_dir)


def _loader(ds, process_count, process_index, seed=3, max_iter=6):
    transform = TrainTransform(
        [96, 128], 171, [0, 0, 0], [1, 1, 1], flip_prob=0.5, seed=seed
    )
    return DetectionLoader(
        ds, transform,
        buckets=[(96, 128), (128, 171), (128, 96), (171, 128)],
        batch_size=4, max_gt=8, is_train=True, seed=seed,
        num_threads=2, max_iter=max_iter,
        process_count=process_count, process_index=process_index,
    )


def test_two_process_loaders_partition_the_global_batch(multihost_coco):
    ann_file, img_dir = multihost_coco
    ds = COCODataset(ann_file, img_dir)

    global_batches = list(_loader(ds, 1, 0))
    p0_batches = list(_loader(ds, 2, 0))
    p1_batches = list(_loader(ds, 2, 1))

    assert len(global_batches) == len(p0_batches) == len(p1_batches) == 6
    for g, b0, b1 in zip(global_batches, p0_batches, p1_batches):
        # identical program shape on every process at every step
        assert b0["images"].shape[1:] == b1["images"].shape[1:]
        assert g["images"].shape[1:] == b0["images"].shape[1:]
        assert b0["images"].shape[0] == b1["images"].shape[0] == 2
        # the two slices partition the global batch (interleaved)
        ids0 = list(b0["image_ids"])
        ids1 = list(b1["image_ids"])
        gids = list(g["image_ids"])
        assert ids0 == gids[0::2]
        assert ids1 == gids[1::2]
        assert set(ids0).isdisjoint(ids1)
        # deterministic augmentation: realized sizes match the
        # single-process loader for the same image ids
        for local, idxs in ((b0, [0, 2]), (b1, [1, 3])):
            for li, gi in enumerate(idxs):
                np.testing.assert_array_equal(
                    local["image_sizes"][li], g["image_sizes"][gi]
                )
                np.testing.assert_allclose(
                    local["gt_boxes"][li], g["gt_boxes"][gi]
                )


def test_all_gather_pickled_single_process():
    from paa_tpu.utils.comm import all_gather_pickled

    obj = {"a": np.arange(3), "b": "x"}
    out = all_gather_pickled(obj)
    assert len(out) == 1 and out[0] is obj

"""Keypoint R-CNN: structures, heatmap projection, loss, OKS eval, and
the end-to-end CLI plumbing (reference
paa_core/structures/keypoint.py + roi_heads/keypoint_head/)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.structures.keypoints import (
    FLIP_INDS,
    OKS_SIGMAS,
    PERSON_KEYPOINT_NAMES,
    flip_keypoints,
    heatmaps_to_keypoints,
    keypoints_to_heatmap,
    resize_keypoints,
)


def test_flip_indices_swap_left_right():
    names = list(PERSON_KEYPOINT_NAMES)
    assert names[FLIP_INDS[names.index("left_eye")]] == "right_eye"
    assert names[FLIP_INDS[names.index("right_ankle")]] == "left_ankle"
    assert FLIP_INDS[0] == 0  # nose maps to itself


def test_flip_keypoints_convention():
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 1] = (10, 20, 2)   # left_eye
    kps[0, 2] = (30, 20, 1)   # right_eye
    kps[0, 3] = (5, 5, 0)     # left_ear invisible
    out = flip_keypoints(kps, width=100)
    # left_eye slot now holds the flipped right_eye
    np.testing.assert_allclose(out[0, 1], (100 - 30 - 1, 20, 1))
    np.testing.assert_allclose(out[0, 2], (100 - 10 - 1, 20, 2))
    # invisible keypoints zero out entirely (COCO convention)
    np.testing.assert_allclose(out[0, 4], (0, 0, 0))


def test_resize_keypoints():
    kps = np.array([[[10.0, 20.0, 2.0]]], np.float32)
    out = resize_keypoints(kps, 2.0, 0.5)
    np.testing.assert_allclose(out, [[[20.0, 10.0, 2.0]]])


def test_keypoints_to_heatmap_matches_reference_math():
    """Mirror of reference keypoint.py:154-188 on concrete values."""
    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0], [10.0, 10.0, 38.0, 38.0]])
    kps = jnp.asarray(
        [
            [[0.0, 0.0, 2.0], [55.9, 55.9, 1.0], [56.0, 28.0, 1.0],
             [60.0, 10.0, 1.0], [5.0, 5.0, 0.0]],
            [[10.0, 10.0, 2.0], [24.0, 24.0, 1.0], [9.0, 20.0, 1.0],
             [38.0, 38.0, 2.0], [0.0, 0.0, 0.0]],
        ]
    )
    lin, valid = keypoints_to_heatmap(kps, rois, 56)
    lin, valid = np.asarray(lin), np.asarray(valid)
    # roi 0 is exactly the heatmap: identity binning
    assert valid[0, 0] == 1 and lin[0, 0] == 0
    assert valid[0, 1] == 1 and lin[0, 1] == 55 * 56 + 55
    # boundary snap: x == x2 -> last bin
    assert valid[0, 2] == 1 and lin[0, 2] == 28 * 56 + 55
    # out of roi -> invalid; invisible -> invalid
    assert valid[0, 3] == 0 and valid[0, 4] == 0
    # roi 1: scale 2x
    assert valid[1, 0] == 1 and lin[1, 0] == 0
    assert valid[1, 1] == 1 and lin[1, 1] == 28 * 56 + 28
    assert valid[1, 2] == 0  # x < x1
    assert valid[1, 3] == 1 and lin[1, 3] == 55 * 56 + 55  # boundary


def test_heatmaps_to_keypoints_peak_recovery():
    rois = np.array([[10.0, 20.0, 66.0, 76.0]], np.float32)
    maps = np.full((1, 56, 56, 2), -5.0, np.float32)
    maps[0, 14, 28, 0] = 8.0   # keypoint 0 peak at (x=28, y=14)
    maps[0, 42, 7, 1] = 8.0
    out = heatmaps_to_keypoints(maps, rois)
    assert out.shape == (1, 2, 3)
    # peak maps back into image coords inside the roi
    x, y, p = out[0, 0]
    assert 10 + 26 < x < 10 + 31 and 20 + 12 < y < 20 + 17
    assert p > 0.5  # dominant peak
    x, y, p = out[0, 1]
    assert 10 + 5 < x < 10 + 10 and 20 + 40 < y < 20 + 45


def test_keypoint_loss_decreases_on_correct_logits():
    from paa_tpu.modeling.roi_keypoint_head import keypoint_loss

    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.zeros((1, 17, 3)).at[0, :, 2].set(2.0)  # all at bin 0
    positive = jnp.asarray([True])

    bad = jnp.zeros((1, 56, 56, 17))
    good = bad.at[0, 0, 0, :].set(10.0)
    l_bad = keypoint_loss(bad, rois, kps, positive)["loss_kp"]
    l_good = keypoint_loss(good, rois, kps, positive)["loss_kp"]
    assert float(l_good) < float(l_bad)
    # no positives -> zero loss, finite
    l_none = keypoint_loss(bad, rois, kps, jnp.asarray([False]))["loss_kp"]
    assert float(l_none) == 0.0


def test_oks_iou_perfect_and_far():
    from paa_tpu.evaluation.coco_eval import _oks_iou

    gkp = np.zeros((17, 3))
    gkp[:, 0] = np.linspace(10, 40, 17)
    gkp[:, 1] = np.linspace(10, 40, 17)
    gkp[:5, 2] = 2  # 5 visible
    gt = dict(keypoints=gkp.reshape(-1).tolist(),
              bbox=[10, 10, 30, 30], area=900)

    perfect = gkp[None, :, :].copy()
    far = perfect.copy()
    far[..., :2] += 1000
    ious = _oks_iou(np.concatenate([perfect, far]), [gt])
    assert ious[0, 0] > 0.99
    assert ious[1, 0] < 1e-6


@pytest.mark.slow
def test_keypoint_rcnn_cli_path(tmp_path):
    """Keypoint R-CNN e2e: tiny person-keypoints dataset -> training
    steps through do_train -> inference with the keypoints OKS flavor."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        w, h = (96, 64) if i % 2 == 0 else (64, 96)
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        x, y, bw, bh = 8, 8, 28, 22
        arr[y:y + bh, x:x + bw] = 255
        cv2.imwrite(str(img_dir / name), arr)
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        kps = np.zeros((17, 3))
        kps[:, 0] = np.linspace(x + 2, x + bw - 2, 17)
        kps[:, 1] = np.linspace(y + 2, y + bh - 2, 17)
        kps[:, 2] = 2
        annotations.append(
            dict(
                id=i + 1, image_id=i + 1, bbox=[x, y, bw, bh],
                area=bw * bh, category_id=1, iscrowd=0,
                keypoints=kps.reshape(-1).tolist(), num_keypoints=17,
            )
        )
    ann_file = tmp_path / "person_keypoints.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="person")],
    )))

    from paa_tpu.config import get_cfg
    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 2
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 128
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SCALES = (
        0.25, 0.125, 0.0625, 0.03125
    )
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = (64, 64)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 40
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 40
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.TRAIN_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.TEST_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.MAX_GT = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    model = build_detection_model(cfg)
    dataset = COCODataset(str(ann_file), str(img_dir),
                          with_keypoints=True)
    mesh = get_data_mesh(2)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    tx, _ = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)

    state = do_train(cfg, model, state, dataset, mesh)
    assert int(state.step) == 2

    eval_dataset = COCODataset(
        str(ann_file), str(img_dir),
        remove_images_without_annotations=False,
    )
    results = inference(
        cfg, model, {"params": state.params}, eval_dataset,
        output_folder=os.path.join(cfg.OUTPUT_DIR, "inference"),
    )
    assert any(k.startswith("keypoints/") for k in results), sorted(results)

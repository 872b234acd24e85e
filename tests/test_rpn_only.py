"""RPN-only proposal models + box-proposal AR evaluation (reference
rpn_*.yaml configs; coco_eval.py:189-300 evaluate_box_proposals)."""

import json
import os

import numpy as np
import jax
import pytest

from paa_tpu.evaluation.coco_eval import evaluate_box_proposals


def test_evaluate_box_proposals_known_values():
    gt = {
        1: [
            # area 1600 -> 'medium' range (1024..9216)
            dict(bbox=[10, 10, 40, 40], area=1600, iscrowd=0),
            # area 100 -> 'small' range
            dict(bbox=[50, 50, 10, 10], area=100, iscrowd=0),
            dict(bbox=[0, 0, 5, 5], area=25, iscrowd=1),  # crowd ignored
        ]
    }
    # first proposal covers gt0 exactly; nothing covers gt1
    proposals = {
        1: dict(boxes=np.array([[10.0, 10, 49, 49], [80, 80, 90, 90]]))
    }
    out = evaluate_box_proposals(proposals, gt, [1])
    assert out["num_pos"] == 2
    np.testing.assert_allclose(out["ar"], 0.5)  # gt0 at IoU 1.0, gt1 at 0
    # area filters
    out_small = evaluate_box_proposals(proposals, gt, [1], area="small")
    assert out_small["num_pos"] == 1
    assert out_small["ar"] == 0.0  # the small gt is uncovered
    out_med = evaluate_box_proposals(proposals, gt, [1], area="medium")
    assert out_med["num_pos"] == 1
    np.testing.assert_allclose(out_med["ar"], 1.0)
    # limit=1 drops the second proposal (which matched nothing anyway)
    out_lim = evaluate_box_proposals(proposals, gt, [1], limit=1)
    np.testing.assert_allclose(out_lim["ar"], 0.5)


def test_greedy_matching_is_one_to_one():
    gt = {
        1: [
            dict(bbox=[0, 0, 10, 10], area=100, iscrowd=0),
            dict(bbox=[2, 2, 10, 10], area=100, iscrowd=0),
        ]
    }
    # one proposal overlapping both GTs: may only cover ONE
    proposals = {1: dict(boxes=np.array([[0.0, 0, 9, 9]]))}
    out = evaluate_box_proposals(proposals, gt, [1])
    # one gt covered at IoU 1.0 (10/20 thresholds pass -> 0.5 recall
    # for it), the other 0 -> AR 0.5 * 1.0 / 2? ar = mean recall:
    # recalls are (#covered >= t)/2 -> 0.5 for all t -> ar 0.5
    np.testing.assert_allclose(out["ar"], 0.5)


@pytest.mark.slow
def test_rpn_only_engine_path(tmp_path):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        w, h = 96, 64
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        arr[8:30, 8:36] = 255
        cv2.imwrite(str(img_dir / name), arr)
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        annotations.append(
            dict(id=i + 1, image_id=i + 1, bbox=[8, 8, 28, 22],
                 area=616, category_id=1, iscrowd=0)
        )
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="thing")],
    )))

    from paa_tpu.config import get_cfg
    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.modeling.two_stage import RPNOnlyModel
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    cfg = get_cfg()
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 40
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 40
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.TRAIN_BUCKETS = ((64, 96),)
    cfg.TPU.TEST_BUCKETS = ((64, 96),)
    cfg.TPU.MAX_GT = 4
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 1
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    model = build_detection_model(cfg)
    assert isinstance(model, RPNOnlyModel)
    dataset = COCODataset(str(ann_file), str(img_dir))
    mesh = get_data_mesh(1)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    tx, _ = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)
    state = do_train(cfg, model, state, dataset, mesh)
    assert int(state.step) == 1

    eval_dataset = COCODataset(
        str(ann_file), str(img_dir),
        remove_images_without_annotations=False,
    )
    results = inference(
        cfg, model, {"params": state.params}, eval_dataset,
        output_folder=os.path.join(cfg.OUTPUT_DIR, "inference"),
    )
    assert "AR@100" in results and "ARl@1000" in results
    assert os.path.exists(
        os.path.join(cfg.OUTPUT_DIR, "inference", "box_proposals.json")
    )

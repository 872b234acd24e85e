"""End-to-end smoke: synthetic COCO dataset -> a few sharded training
iterations -> checkpoint save/resume -> inference -> COCO metrics.
Exercises the same plumbing as tools/train_net.py / test_net.py."""

import json
import os

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_e2e")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(6):
        w, h = (96, 64) if i % 2 == 0 else (64, 96)
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        # paint a bright box as the "object"
        x, y, bw, bh = 10, 10, 30, 25
        arr[y:y + bh, x:x + bw] = 255
        cv2.imwrite(str(img_dir / name), arr)
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        annotations.append(
            dict(id=ann_id, image_id=i + 1, bbox=[x, y, bw, bh],
                 area=bw * bh, category_id=1, iscrowd=0)
        )
        ann_id += 1
    categories = [dict(id=1, name="thing"), dict(id=2, name="other")]
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories
    )))
    return str(ann_file), str(img_dir)


def small_cfg(tmp_path):
    from paa_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.PAA.NUM_CLASSES = 3  # 2 classes + bg
    cfg.MODEL.PAA.INFERENCE_SCORE_VOTING = True
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.TRAIN_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.TEST_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.MAX_GT = 8
    cfg.TPU.GMM_ITERS = 4
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.mark.slow
def test_train_then_eval(tiny_coco, tmp_path):
    ann_file, img_dir = tiny_coco
    cfg = small_cfg(tmp_path)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.checkpoint import Checkpointer
    from paa_tpu.utils.comm import get_data_mesh

    dataset = COCODataset(ann_file, img_dir)
    assert len(dataset) == 6

    model = build_detection_model(cfg)
    mesh = get_data_mesh(2)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    params = variables["params"]
    tx, _ = make_optimizer(cfg, params)
    state = TrainState.create(model.module.apply, params, tx)
    ckpt = Checkpointer(cfg.OUTPUT_DIR)

    state = do_train(cfg, model, state, dataset, mesh, checkpointer=ckpt)
    assert int(state.step) == 3
    assert ckpt.has_checkpoint()
    assert ckpt.get_checkpoint_file() == "model_final"

    # resume restores params bit-exact
    tree, extra = ckpt.load(
        None, {"params": state.params, "opt_state": state.opt_state}
    )
    assert extra["iteration"] == 3
    a = jax.tree_util.tree_leaves(tree["params"])[0]
    b = jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval end-to-end: untrained net finds nothing, but the whole
    # pipeline (bucketing, postproc, rescale, COCOeval) must run
    eval_dataset = COCODataset(
        ann_file, img_dir, remove_images_without_annotations=False
    )
    results = inference(
        cfg, model, {"params": state.params}, eval_dataset,
        output_folder=os.path.join(cfg.OUTPUT_DIR, "inference"),
    )
    assert set(results) >= {"AP", "AP50", "AR100"}
    assert os.path.exists(
        os.path.join(cfg.OUTPUT_DIR, "inference", "bbox.json")
    )

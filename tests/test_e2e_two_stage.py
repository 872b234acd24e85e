"""End-to-end two-stage (Faster R-CNN) smoke through the REAL entry
plumbing: build_detection_model dispatch -> do_train -> checkpoint ->
engine.inference — the same code path tools/train_net.py / test_net.py
drive (reference wires this through GeneralizedRCNN,
modeling/detector/generalized_rcnn.py:33-65)."""

import json
import os

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_2stage")
    img_dir = root / "images"
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
        annotations.append(
            dict(
                id=i + 1, image_id=i + 1, bbox=[x, y, bw, bh],
                area=bw * bh, category_id=1, iscrowd=0,
                segmentation=[[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            )
        )
    categories = [dict(id=1, name="thing"), dict(id=2, name="other")]
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories
    )))
    return str(ann_file), str(img_dir)


def two_stage_cfg(tmp_path, mask_on=False):
    from paa_tpu.config import get_cfg

    cfg = get_cfg()
    # Faster R-CNN: no dense-head flag, RPN_ONLY False — exercises the
    # build_detection_model two-stage dispatch
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.MASK_ON = mask_on
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
    cfg.SOLVER.CHECKPOINT_PERIOD = 10
    cfg.SOLVER.BASE_LR = 0.001
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.mark.slow
def test_faster_rcnn_cli_path(tiny_coco, tmp_path):
    ann_file, img_dir = tiny_coco
    cfg = two_stage_cfg(tmp_path)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.modeling.two_stage import TwoStageModel
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.checkpoint import Checkpointer
    from paa_tpu.utils.comm import get_data_mesh

    model = build_detection_model(cfg)
    assert isinstance(model, TwoStageModel)

    dataset = COCODataset(ann_file, img_dir)
    mesh = get_data_mesh(2)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    params = variables["params"]
    tx, _ = make_optimizer(cfg, params)
    state = TrainState.create(model.module.apply, params, tx)
    ckpt = Checkpointer(cfg.OUTPUT_DIR)

    state = do_train(cfg, model, state, dataset, mesh, checkpointer=ckpt)
    assert int(state.step) == 2
    assert ckpt.has_checkpoint()

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


@pytest.mark.slow
def test_mask_rcnn_cli_path_with_segm_eval(tiny_coco, tmp_path):
    """Mask R-CNN through build_detection_model + do_train + inference:
    asserts the segm flavor runs and reports metrics."""
    ann_file, img_dir = tiny_coco
    cfg = two_stage_cfg(tmp_path / "mask", mask_on=True)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    model = build_detection_model(cfg)
    dataset = COCODataset(ann_file, img_dir, with_masks=True)
    mesh = get_data_mesh(2)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    tx, _ = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)

    state = do_train(cfg, model, state, dataset, mesh)
    assert int(state.step) == 2

    eval_dataset = COCODataset(
        ann_file, img_dir, remove_images_without_annotations=False
    )
    results = inference(
        cfg, model, {"params": state.params}, eval_dataset,
        output_folder=os.path.join(cfg.OUTPUT_DIR, "inference"),
    )
    # bbox metrics plus the segm flavor
    assert set(results) >= {"AP", "AP50"}
    assert any(k.startswith("segm/") for k in results), sorted(results)


@pytest.mark.slow
def test_c4_faster_rcnn_engine_path(tiny_coco, tmp_path):
    """R-50-C4 (single-level) Faster R-CNN: build via
    build_detection_model, run train steps + inference through the
    engine (reference e2e_faster_rcnn_R_50_C4_1x.yaml path)."""
    ann_file, img_dir = tiny_coco
    cfg = two_stage_cfg(tmp_path / "c4")
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    cfg.MODEL.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
    cfg.MODEL.RPN.ANCHOR_STRIDE = (16,)
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.SOLVER.MAX_ITER = 1
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    model = build_detection_model(cfg)
    assert model.strides == (16,)
    dataset = COCODataset(ann_file, img_dir)
    mesh = get_data_mesh(1)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    tx, _ = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)

    state = do_train(cfg, model, state, dataset, mesh)
    assert int(state.step) == 1

    eval_dataset = COCODataset(
        ann_file, img_dir, remove_images_without_annotations=False
    )
    results = inference(cfg, model, {"params": state.params}, eval_dataset)
    assert set(results) >= {"AP", "AP50"}


def test_fbnet_faster_rcnn_builds_and_steps():
    """FBNet-body two-stage model (reference e2e_faster_rcnn_fbnet.yaml):
    one jitted train step with finite losses."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from paa_tpu.config import get_cfg
    from paa_tpu.engine import TrainState, jit_train_step
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
    cfg.MODEL.FBNET.ARCH = "default"
    cfg.MODEL.FBNET.WIDTH_DIVISOR = 8
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64, 128, 256)
    cfg.MODEL.RPN.ANCHOR_STRIDE = (16,)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 6
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5

    model = build_detection_model(cfg)
    hw = (64, 64)
    variables = model.init(jax.random.PRNGKey(0), hw)
    tx, labels = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)
    step_fn = model.make_bucket_train_step(hw, param_label_tree=labels)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step = jit_train_step(step_fn, mesh)
    batch = {
        "images": jnp.zeros((1, *hw, 3), jnp.float32),
        "gt_boxes": jnp.asarray([[[4, 4, 30, 30], [0, 0, 0, 0]]],
                                jnp.float32),
        "gt_labels": jnp.asarray([[2, 0]], jnp.int32),
        "image_sizes": jnp.asarray([[64.0, 64.0]]),
    }
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert {"loss_objectness", "loss_classifier"} <= set(metrics)

    # eval path produces fixed-shape detections
    fn = model.make_eval_fn({"params": state.params})
    det = fn(batch["images"], batch["image_sizes"])
    assert det["boxes"].shape[0] == 1 and det["boxes"].shape[2] == 4


def test_fbnet_mask_rcnn_builds():
    """FBNet Mask R-CNN (reference e2e_mask_rcnn_fbnet_xirb16d_dsmask):
    mask branch builds and produces upsampled per-class logits."""
    import jax.numpy as jnp
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
    cfg.MODEL.FBNET.ARCH = "xirb16d_dsmask"
    cfg.MODEL.FBNET.WIDTH_DIVISOR = 8
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64, 128, 256)
    cfg.MODEL.RPN.ANCHOR_STRIDE = (16,)
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 6
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 6

    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    from paa_tpu.modeling.two_stage import FasterRCNN

    feats = model.module.apply(
        variables, jnp.zeros((1, 64, 64, 3)),
        method=lambda m, x: m.backbone(x),
    )
    rois = jnp.asarray([[4.0, 4, 30, 30]])
    bidx = jnp.zeros((1,), jnp.int32)
    logits = model.module.apply(
        variables, feats, rois, bidx, method=FasterRCNN.mask
    )
    # 6x6 pool -> dsmask stages (x4 upsample net) -> deconv x2
    assert logits.shape[0] == 1 and logits.shape[-1] == 3
    assert logits.shape[1] >= 12


def test_c4_mask_rcnn_builds():
    import jax.numpy as jnp
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.modeling.two_stage import FasterRCNN

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4

    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 96))
    feats = model.module.apply(
        variables, jnp.zeros((1, 64, 96, 3)),
        method=lambda m, x: m.backbone(x),
    )
    rois = jnp.asarray([[4.0, 4, 30, 30]])
    bidx = jnp.zeros((1,), jnp.int32)
    logits = model.module.apply(
        variables, feats, rois, bidx, method=FasterRCNN.mask
    )
    # reference C4 semantics: pool 14 -> shared res5 (stride 2) -> 7x7
    # -> MaskRCNNC4Predictor deconv -> 14x14 masks
    assert logits.shape == (1, 14, 14, 3)
    # the extractor weights ARE the box head's (roi_heads.py:19): the
    # mask head owns only the predictor params
    assert model.module.share_mask_extractor
    assert set(variables["params"]["mask_head"].keys()) == {
        "conv5_mask", "mask_fcn_logits"
    }
    # and the box head's res5 blocks exist exactly once
    assert "layer4_0" in variables["params"]["box_head"]

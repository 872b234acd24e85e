#!/usr/bin/env python
"""Overfit-convergence gate: the TPU-native analogue of the reference's
quick_schedules + check_expected_results regression
(configs/quick_schedules/*, coco_eval.py:403).

Trains flagship PAA (R-50-FPN) on a tiny synthetic COCO set of
class-colored rectangles through the REAL pipeline — bucketed loader,
do_train, checkpointing path, full inference + from-scratch COCOeval —
and asserts (1) the training loss falls below a pinned threshold and
(2) self-eval AP reaches ~1.0. This proves the vectorized GMM
assignment actually LEARNS, not just runs.

Usage: python tools/quick_overfit.py [--iters 300] [--assert]
(tests/test_overfit.py runs the same entry with --assert on the CPU
mesh; this CLI exists for quick manual runs and TPU spot checks.)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n_images=8, seed=0):
    """COCO-format dataset of solid class-colored rectangles: class 1 =
    red-ish, class 2 = green-ish, on dark noise background."""
    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        w, h = (96, 64) if i % 2 == 0 else (64, 96)
        arr = rng.randint(0, 40, (h, w, 3), dtype=np.uint8)
        n_boxes = 1 + (i % 2)
        for b in range(n_boxes):
            cls = 1 + ((i + b) % 2)
            bw = int(rng.randint(20, 34))
            bh = int(rng.randint(16, 28))
            x = int(rng.randint(2, w - bw - 2))
            y = int(rng.randint(2, h - bh - 2))
            color = (
                (40, 40, 220) if cls == 1 else (40, 220, 40)
            )  # BGR
            arr[y:y + bh, x:x + bw] = color
            annotations.append(dict(
                id=ann_id, image_id=i + 1, bbox=[x, y, bw, bh],
                area=bw * bh, category_id=cls, iscrowd=0,
            ))
            ann_id += 1
        name = f"img{i}.jpg"
        cv2.imwrite(str(os.path.join(img_dir, name)), arr)
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
    ann_file = os.path.join(root, "instances.json")
    with open(ann_file, "w") as f:
        json.dump(dict(
            images=images, annotations=annotations,
            categories=[dict(id=1, name="red"), dict(id=2, name="green")],
        ), f)
    return ann_file, img_dir


def overfit_cfg(output_dir, max_iter):
    from paa_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 128
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0  # everything learns
    cfg.MODEL.PAA.NUM_CLASSES = 3
    cfg.MODEL.PAA.NUM_CONVS = 2
    cfg.MODEL.PAA.INFERENCE_SCORE_VOTING = True
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.TRAIN_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.TEST_BUCKETS = ((64, 96), (96, 64))
    cfg.TPU.MAX_GT = 8
    cfg.TPU.GMM_ITERS = 8
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.STEPS = (int(max_iter * 0.7), int(max_iter * 0.9))
    cfg.SOLVER.CHECKPOINT_PERIOD = 10_000_000  # no mid-run ckpts
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.OUTPUT_DIR = output_dir
    return cfg


def run(iters, workdir, n_devices=2, seed=0):
    import jax

    from paa_tpu.data.coco import COCODataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    ann_file, img_dir = make_dataset(os.path.join(workdir, "data"),
                                     seed=seed)
    out_dir = os.path.join(workdir, "out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = overfit_cfg(out_dir, iters)

    dataset = COCODataset(ann_file, img_dir)
    model = build_detection_model(cfg)
    mesh = get_data_mesh(min(n_devices, jax.device_count()))
    variables = model.init(jax.random.PRNGKey(seed), (64, 96))
    tx, _ = make_optimizer(cfg, variables["params"])
    state = TrainState.create(model.module.apply, variables["params"], tx)

    losses = []
    state = do_train(
        cfg, model, state, dataset, mesh,
        metric_hook=lambda step, m: losses.append(float(m["loss"])),
    )

    eval_dataset = COCODataset(
        ann_file, img_dir, remove_images_without_annotations=False
    )
    results = inference(
        cfg, model, {"params": state.params}, eval_dataset,
        output_folder=os.path.join(out_dir, "inference"),
    )
    ap = float(results["AP"])
    ap50 = float(results["AP50"])
    final_loss = float(np.mean(losses[-20:])) if losses else float("nan")
    return dict(final_loss=final_loss, ap=ap, ap50=ap50,
                first_loss=losses[0] if losses else float("nan"))


def main():
    ap = argparse.ArgumentParser()
    # 1500 iters @ BASE_LR 0.02 reaches loss ~0.16 / AP50 1.0 / AP 0.96
    # on the 8-image set (measured; 500 iters only gets AP50 ~0.59)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--workdir", default="/tmp/paa_overfit")
    ap.add_argument("--assert", dest="do_assert", action="store_true")
    ap.add_argument("--loss-threshold", type=float, default=0.35)
    ap.add_argument("--ap50-threshold", type=float, default=0.95)
    args = ap.parse_args()

    r = run(args.iters, args.workdir)
    print(json.dumps(r))
    if args.do_assert:
        assert r["final_loss"] < args.loss_threshold, r
        assert r["ap50"] >= args.ap50_threshold, r
        print("OVERFIT GATE PASSED")


if __name__ == "__main__":
    main()

"""Demo predictor smoke test (reference demo/predictor.py COCODemo —
which is broken upstream: it imports the renamed atss_core package)."""

import sys
import os

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_demo_predictor_runs():
    from demo.predictor import COCODemo
    from paa_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.NUM_CONVS = 1
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.TEST_BUCKETS = ((64, 96), (96, 64))

    demo = COCODemo(cfg, confidence_threshold=0.5)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (60, 90, 3), dtype=np.uint8)
    boxes, scores, labels = demo.compute_prediction(image)
    assert boxes.shape[1:] == (4,)
    assert len(boxes) == len(scores) == len(labels)
    # untrained net: focal-prior init keeps scores < 0.5 threshold
    out = demo.run_on_opencv_image(image)
    assert out.shape == image.shape

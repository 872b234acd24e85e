#!/usr/bin/env python
"""Run detection on an image file and save the visualization.

Usage: python demo/demo.py --config-file configs/paa/paa_R_50_FPN_1x.yaml \
           --ckpt out/model_final --input img.jpg --output out.jpg
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default="demo_out.jpg")
    parser.add_argument("--confidence-threshold", type=float, default=0.7)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import cv2

    from paa_tpu.config import get_cfg
    from demo.predictor import COCODemo

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    demo = COCODemo(cfg, args.ckpt, args.confidence_threshold)
    img = cv2.imread(args.input, cv2.IMREAD_COLOR)
    out = demo.run_on_opencv_image(img)
    cv2.imwrite(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

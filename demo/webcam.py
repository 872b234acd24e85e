#!/usr/bin/env python
"""Webcam demo: run the detector on a cv2 capture stream.

Mirrors reference demo/webcam.py (argparse surface and display loop);
the predictor underneath is the jitted paa_tpu pipeline.

Usage: python demo/webcam.py --config-file configs/paa/paa_R_50_FPN_1x.yaml \
           --ckpt out/model_final
Press ESC to exit.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="paa_tpu object detection webcam demo"
    )
    parser.add_argument("--config-file", required=True, metavar="FILE")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument(
        "--confidence-threshold", type=float, default=0.7,
        help="minimum score for a prediction to be shown",
    )
    parser.add_argument(
        "--camera", type=int, default=0, help="cv2 capture device index"
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import cv2

    from demo.predictor import COCODemo
    from paa_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    demo = COCODemo(cfg, args.ckpt, args.confidence_threshold)

    cam = cv2.VideoCapture(args.camera)
    if not cam.isOpened():
        print(f"could not open camera {args.camera}", file=sys.stderr)
        return 1
    while True:
        start_time = time.time()
        ret_val, img = cam.read()
        if not ret_val:
            break
        composite = demo.run_on_opencv_image(img)
        print(f"inference time: {time.time() - start_time:.2f}s")
        cv2.imshow("paa_tpu detections", composite)
        if cv2.waitKey(1) == 27:
            break  # esc
    cam.release()
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""One-command AP-gate runbook for the north-star result.

The reference publishes PAA_R_50_FPN_1x at **AP 40.4 on COCO minival**
(/root/reference/README.md:42) and asserts regression results via
check_expected_results (/root/reference/paa_core/data/datasets/
evaluation/coco/coco_eval.py:403). This tool packages that gate as ONE
command for the day COCO data + released weights are mounted:

    python tools/reproduce_ap.py \
        --weights /path/to/PAA_R_50_FPN_1x.pth \
        --data /path/to/datasets        # dir containing coco/...

It runs: torch-checkpoint import -> bucketed sharded eval on
cfg.DATASETS.TEST -> COCO AP -> the expected-results assertion
(default AP 0.404 +/- 0.003). Exit code 0 = gate passed, 1 = failed,
2 = setup error (missing data/weights).

Works with any config/weights pair: pass --config-file and --expected.
--ann-file/--img-dir bypass the dataset catalog for a custom minival
location. The gate MECHANISM is dry-run-tested on synthetic data in
tests/test_reproduce_ap.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="paa_tpu AP-gate runbook")
    p.add_argument(
        "--config-file", default="configs/paa/paa_R_50_FPN_1x.yaml",
        metavar="FILE",
    )
    p.add_argument(
        "--weights", required=True,
        help=".pth/.pkl/catalog:// released checkpoint to import",
    )
    p.add_argument(
        "--data", default=None,
        help="datasets root (the directory containing coco/...); "
        "sets PAA_TPU_DATA_DIR for the dataset catalog",
    )
    p.add_argument(
        "--ann-file", default=None,
        help="direct path to a COCO-format annotation json "
        "(bypasses the catalog; requires --img-dir)",
    )
    p.add_argument("--img-dir", default=None)
    p.add_argument(
        "--expected", type=float, default=0.404,
        help="expected COCO AP (fraction, e.g. 0.404)",
    )
    p.add_argument(
        "--tol", type=float, default=0.003,
        help="allowed |actual - expected| (fraction, e.g. 0.003)",
    )
    p.add_argument(
        "--output-dir", default=None,
        help="override cfg.OUTPUT_DIR for eval artifacts",
    )
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def run_gate(cfg, weights, datasets, logger):
    """Import weights, evaluate every dataset, apply the expected-results
    gate (inference() raises AssertionError when the gate fails).
    Returns the results list. Split out so the synthetic dry-run test
    can drive the exact production path."""
    import jax

    from paa_tpu.engine.inference import inference
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.utils.torch_import import load_pretrained_into

    model = build_detection_model(cfg)
    init_hw = tuple(cfg.TPU.TEST_BUCKETS[0])
    variables = model.init(jax.random.PRNGKey(0), init_hw)
    params = load_pretrained_into(cfg, variables["params"], weights, logger)
    variables = dict(variables, params=params)

    all_results = []
    for name, dataset in datasets:
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        results = inference(
            cfg, model, variables, dataset,
            output_folder=output_folder, logger=logger,
        )
        all_results.append(results)
    return all_results


def main():
    args = parse_args()
    if args.data:
        os.environ["PAA_TPU_DATA_DIR"] = args.data

    from paa_tpu.config import get_cfg
    from paa_tpu.utils.logger import setup_logger

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # wire the gate through the same TEST.EXPECTED_RESULTS machinery the
    # reference quick_schedules use: mean +/- sigma_tol * std
    cfg.TEST.EXPECTED_RESULTS = [
        ["bbox", "AP", args.expected, args.tol]
    ]
    cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL = 1
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("paa_tpu.reproduce_ap", cfg.OUTPUT_DIR)

    # ---- resolve datasets ------------------------------------------
    from paa_tpu.data.build import build_dataset

    try:
        if args.ann_file:
            if not args.img_dir:
                logger.error("--ann-file requires --img-dir")
                return 2
            from paa_tpu.data.coco import COCODataset

            datasets = [(
                "custom",
                COCODataset(
                    args.ann_file, args.img_dir,
                    remove_images_without_annotations=False,
                ),
            )]
        else:
            built = build_dataset(cfg, cfg.DATASETS.TEST, is_train=False)
            if not isinstance(built, list):
                built = [built]
            datasets = list(zip(cfg.DATASETS.TEST, built))
    except (FileNotFoundError, OSError, KeyError) as e:
        logger.error(
            f"dataset not found ({e}); mount COCO under --data "
            "(the default config evaluates coco_2017_val: expects "
            "<data>/coco/annotations/instances_val2017.json and "
            "<data>/coco/val2017) or pass --ann-file/--img-dir"
        )
        return 2
    if not os.path.exists(str(args.weights)) and not str(
            args.weights).startswith(("catalog://", "http")):
        logger.error(f"weights not found: {args.weights}")
        return 2

    try:
        all_results = run_gate(cfg, args.weights, datasets, logger)
    except AssertionError as e:
        logger.error(f"AP GATE FAILED: {e}")
        return 1
    ap = all_results[0].get("AP") if all_results else None
    logger.info(
        f"AP GATE PASSED: AP={ap:.4f} within "
        f"{args.expected:.4f} +/- {args.tol:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

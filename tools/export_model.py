#!/usr/bin/env python
"""Export a trained detector as a self-contained serving artifact.

Serializes the full jitted inference program (forward + static-shape
post-processing, weights baked in) to StableHLO via jax.export — see
paa_tpu/serving.py. The artifact is loadable with
``paa_tpu.serving.load_exported`` (or any jax.export consumer) without
model-building code.

Usage:
  python tools/export_model.py --config-file configs/paa/paa_R_50_FPN_1x.yaml \
      --ckpt out/model_final --output paa_r50.paax \
      --batch 16 --height 800 --width 1344 [--platforms tpu cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="paa_tpu serving export")
    parser.add_argument("--config-file", required=True, metavar="FILE")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument(
        "--height", type=int, default=None,
        help="input height (default: first TPU.TEST_BUCKETS entry)",
    )
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument(
        "--platforms", nargs="*", default=None,
        help="lowering platforms, e.g. --platforms tpu cpu "
             "(default: current backend only)",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax

    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.serving import export_inference, save_exported
    from paa_tpu.utils.logger import setup_logger

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    logger = setup_logger("paa_tpu.export", None)

    hw = (
        (args.height, args.width)
        if args.height and args.width
        else tuple(cfg.TPU.TEST_BUCKETS[0])
    )
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), hw)
    if args.ckpt:
        from paa_tpu.utils.checkpoint import Checkpointer

        checkpointer = Checkpointer(
            os.path.dirname(args.ckpt) or ".", logger=logger
        )
        template = {"params": variables["params"], "opt_state": None}
        if "batch_stats" in variables:
            template["batch_stats"] = variables["batch_stats"]
        tree, _ = checkpointer.load(args.ckpt, template)
        if tree is not None:
            variables = {"params": tree["params"]}
            if tree.get("batch_stats") is not None:
                variables["batch_stats"] = tree["batch_stats"]

    exported, meta = export_inference(
        model, variables, args.batch, hw, platforms=args.platforms
    )
    meta["config_file"] = os.path.basename(args.config_file)
    save_exported(args.output, exported, meta)
    size_mb = os.path.getsize(args.output) / 1e6
    logger.info(
        f"wrote {args.output} ({size_mb:.1f} MB) "
        f"input {meta['input_shape']} platforms {meta['platforms']}"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: PAA dcnv2 single-chip inference throughput on the real TPU.

North-star config 4 is paa_dcnv2_X_101_64x4d_FPN_2x; this measures the
dcnv2 family on chip (VERDICT r2 item 2b): full inference path (backbone
with modulated-DCN stages 2-4 + FPN + PAA head + on-device NMS/voting),
bf16, 800x1344. Config file and batch are selectable:

    python tools/bench_dcnv2.py [--config-file configs/paa/paa_dcnv2_R_101_FPN_2x.yaml] [--batch 8]

Prints one JSON line like bench.py.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config-file",
        default="configs/paa/paa_dcnv2_R_101_FPN_2x.yaml",
    )
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hw", default="800,1344")
    ap.add_argument(
        "--dcn-mode", default=None,
        choices=["auto", "gather", "onehot", "optimistic"],
        help="override cfg.TPU.DCN_MODE (sampling lowering A/B)",
    )
    ap.add_argument(
        "--train", action="store_true",
        help="measure the full train step (fwd + assignment + losses "
             "+ bwd + SGD) instead of inference",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.modeling.paa_inference import (
        PostProcessConfig,
        paa_postprocess,
    )

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.MODEL.WEIGHT = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if args.dcn_mode is not None:
        cfg.TPU.DCN_MODE = args.dcn_mode
    cfg.freeze()

    model = build_detection_model(cfg)
    hw = tuple(int(x) for x in args.hw.split(","))
    batch = args.batch

    variables = model.init(jax.random.PRNGKey(0), hw)
    anchors, counts = model.anchors_for(hw)
    pp = PostProcessConfig.from_cfg(cfg)

    if args.train:
        from paa_tpu.engine.train_step import TrainState
        from paa_tpu.solver import make_optimizer, param_labels

        params = variables["params"]
        tx, _ = make_optimizer(cfg, params)
        state = TrainState.create(model.module.apply, params, tx)
        labels = param_labels(
            params, cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
        )
        step = jax.jit(
            model.make_bucket_train_step(hw, param_label_tree=labels),
            donate_argnums=(0,),
        )
        rng = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(
                rng.uniform(-128, 128, (args.batch, *hw, 3))
                .astype(np.float32)
            ),
            "gt_boxes": jnp.asarray(
                np.tile(
                    np.array(
                        [[[20, 30, 300, 400], [350, 200, 700, 640]]],
                        np.float32,
                    ),
                    (args.batch, 1, 1),
                )
            ),
            "gt_labels": jnp.asarray(
                np.tile(np.array([[5, 17]], np.int32), (args.batch, 1))
            ),
        }
        t0 = time.time()
        state, metrics = step(state, batch)
        float(metrics["loss"])
        first_call_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        dt = time.time() - t0
        name = os.path.basename(args.config_file).replace(".yaml", "")
        print(
            json.dumps(
                {
                    "metric": f"{name} train-step throughput "
                              f"({args.hw.replace(',', 'x')}, bf16, "
                              "fwd+assign+bwd+SGD)",
                    "value": round(args.batch * args.iters / dt, 2),
                    "unit": "images/sec/chip",
                    "batch": args.batch,
                    "first_call_s": round(first_call_s, 1),
                }
            )
        )
        return

    if args.dcn_mode == "optimistic":
        # the honest optimistic program: model.make_eval_fn keeps the
        # per-image escape-flag reduction live (the inline harness below
        # would let XLA DCE the sown intermediates away)
        eval_fn = model.make_eval_fn(variables)

        @jax.jit
        def infer(variables, images, image_sizes, carry):
            det = eval_fn(images + carry * 0.0, image_sizes)
            return det["scores"].sum() + det["dcn_escaped"].sum()
    else:

        @jax.jit
        def infer(variables, images, image_sizes, carry):
            outputs = model.module.apply(variables, images + carry * 0.0)
            det = paa_postprocess(
                outputs, image_sizes, jnp.asarray(anchors), counts, pp
            )
            return det["scores"].sum()

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-128, 128, (batch, *hw, 3)).astype(np.float32)
    )
    sizes = jnp.asarray(
        np.tile(np.array([[800.0, 1333.0]], np.float32), (batch, 1))
    )

    zero = jnp.float32(0.0)
    t0 = time.time()
    float(infer(variables, images, sizes, zero))
    first_call_s = time.time() - t0
    float(infer(variables, images, sizes, zero))

    t0 = time.time()
    carry = zero
    for _ in range(args.iters):
        carry = infer(variables, images, sizes, carry)
    float(carry)
    dt = time.time() - t0

    name = os.path.basename(args.config_file).replace(".yaml", "")
    img_per_s = batch * args.iters / dt
    print(
        json.dumps(
            {
                "metric": f"{name} inference throughput "
                          f"({args.hw.replace(',', 'x')}, bf16, "
                          "incl. NMS+score-voting)",
                "value": round(img_per_s, 2),
                "unit": "images/sec/chip",
                "batch": batch,
                "first_call_s": round(first_call_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

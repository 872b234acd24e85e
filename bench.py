#!/usr/bin/env python
"""Benchmark: PAA_R_50_FPN_1x single-chip inference throughput.

Runs the flagship model's full inference path (ResNet-50+FPN+PAA head
forward + on-device post-processing incl. class-aware NMS and score
voting) on one chip at the standard COCO eval resolution bucket
(800x1344), bf16 compute, batch 48 (throughput-optimal on v5e; B=32 is
~1% lower, B=16 ~3%), and reports images/sec/chip.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its eval loop logs s/img at runtime. A PAA-R50 torch model at batch 1 on
a V100 runs at roughly 12.5 img/s (0.08 s/img), which we use as the
vs_baseline denominator — documented, not measured here.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the full-model program takes minutes to
# build over the remote-TPU tunnel, milliseconds to reload
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache"
)


BASELINE_IMG_PER_S = 12.5  # torch reference proxy (see module docstring)


def main():
    import jax
    import jax.numpy as jnp

    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.modeling.paa_inference import (
        PostProcessConfig,
        paa_postprocess,
    )

    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.PAA.INFERENCE_SCORE_VOTING = True
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # opt-in: BENCH_FUSED_GN=1 measures the one-pass GN+ReLU Pallas
    # kernel (ops/fused_gn.py) for the A/B before flipping the default
    cfg.TPU.FUSED_GN = os.environ.get("BENCH_FUSED_GN", "0") == "1"
    cfg.freeze()

    model = build_detection_model(cfg)
    hw = (800, 1344)
    batch = int(os.environ.get("BENCH_BATCH", "48"))

    variables = model.init(jax.random.PRNGKey(0), hw)
    anchors, counts = model.anchors_for(hw)
    pp = PostProcessConfig.from_cfg(cfg)

    @jax.jit
    def infer(variables, images, image_sizes, carry):
        # the carry dependency lives INSIDE the jit: a host-side
        # `images + carry` between iterations adds one extra XLA
        # program dispatch per step, which costs ~40 ms/step on the
        # axon remote platform and halves the measured throughput
        outputs = model.module.apply(variables, images + carry * 0.0)
        det = paa_postprocess(
            outputs, image_sizes, jnp.asarray(anchors), counts, pp
        )
        # scalar summary so timing can force execution with one tiny
        # host fetch (block_until_ready is unreliable on the axon
        # remote-TPU platform — see .claude/skills/verify/SKILL.md)
        return det["scores"].sum()

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-128, 128, (batch, *hw, 3)).astype(np.float32)
    )
    sizes = jnp.asarray(
        np.tile(np.array([[800.0, 1333.0]], np.float32), (batch, 1))
    )

    # compile + warmup (float() forces a real round trip)
    zero = jnp.float32(0.0)
    float(infer(variables, images, sizes, zero))
    float(infer(variables, images, sizes, zero))

    # Chain each iteration's input on the previous output so the device
    # must execute all iterations serially; fetch once at the end.
    iters = 20
    t0 = time.time()
    carry = zero
    for _ in range(iters):
        carry = infer(variables, images, sizes, carry)
    float(carry)
    dt = time.time() - t0

    img_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "PAA_R_50_FPN_1x inference throughput "
                          "(800x1344, bf16, incl. NMS+score-voting)",
                "value": round(img_per_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TTA (multi-scale testing) on-chip benchmark — VERDICT r3 item 8.

Runs the full TEST.BBOX_AUG path (engine/bbox_aug.py: per-aug resize +
flip + jitted forward/postprocess + host vote merge) end-to-end on the
real chip for PAA R-50 with 3 scales + hflip (6 augmentations over 3
compiled buckets), and prints per-bucket compile time, total compile
count, and steady-state TTA throughput in original-images/s.

Also prints the static compile-count bound for the reference's X-152
TTA recipe (configs/paa/paa_dcnv2_X_152_32x8d_FPN_2x.yaml:46-56,
12 scales + identity, hflip + scale_h_flip): compiled programs are keyed
by the padded bucket shape, so each scale's hflip reuses the scale's
program — 26 augmentations cost 13 compiles, not 26.

Usage: python tools/bench_tta.py [--batches N] [--batch B]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def x152_compile_bound():
    """Static bucket accounting for the reference's X-152 TTA recipe."""
    from paa_tpu.config import get_cfg
    from paa_tpu.engine.bbox_aug import _ceil32, build_aug_list

    cfg = get_cfg()
    cfg.merge_from_file("configs/paa/paa_dcnv2_X_152_32x8d_FPN_2x.yaml")
    cfg.TEST.BBOX_AUG.ENABLED = True
    augs = build_aug_list(cfg)
    buckets = {
        (_ceil32(min(scale, mx)), _ceil32(mx))
        for scale, mx, _, _ in augs
    }
    return len(augs), len(buckets), sorted(buckets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()

    import jax

    from paa_tpu.config import get_cfg
    from paa_tpu.engine.bbox_aug import TTAEngine, build_aug_list, _ceil32
    from paa_tpu.modeling import build_detection_model

    n_augs, n_buckets, buckets = x152_compile_bound()
    print(
        f"X-152 TTA bound: {n_augs} augmentations -> {n_buckets} compiled "
        f"buckets (hflip reuses each scale's program)"
    )
    print(f"  buckets: {buckets}")

    cfg = get_cfg()
    cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALES = (400, 1000)
    cfg.TEST.BBOX_AUG.MAX_SIZE = 1667
    cfg.TEST.BBOX_AUG.SCALE_H_FLIP = True
    cfg.TEST.BBOX_AUG.VOTE = True
    cfg.TEST.BBOX_AUG.MERGE_TYPE = "soft-vote"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()

    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (800, 1344))
    engine = TTAEngine(cfg, model, variables)

    augs = build_aug_list(cfg)
    print(f"R-50 aug list ({len(augs)} augs): {augs}")

    rng = np.random.RandomState(0)
    raw = [
        rng.randint(0, 255, (480, 640, 3), np.uint8)
        if i % 2 == 0
        else rng.randint(0, 255, (426, 640, 3), np.uint8)
        for i in range(args.batch)
    ]

    # warmup = compile pass (one compile per distinct padded bucket)
    t0 = time.time()
    engine.detect_batch(raw)
    compile_s = time.time() - t0
    n_compiled = len(engine._fns)
    print(
        f"warmup (compile) pass: {compile_s:.1f} s, "
        f"{n_compiled} compiled programs for {len(augs)} augs"
    )

    t0 = time.time()
    for _ in range(args.batches):
        results = engine.detect_batch(raw)
    dt = time.time() - t0
    n_img = args.batches * len(raw)
    img_s = n_img / dt
    print(
        f"steady-state TTA: {img_s:.2f} original-img/s "
        f"({dt / n_img:.3f} s/img across {len(augs)} augs; "
        f"{img_s * len(augs):.1f} aug-forwards/s)"
    )
    assert all(len(r[0]) > 0 for r in results), (
        "TTA merge returned an empty detection set for at least one "
        "image — random-noise inputs should still yield low-score boxes"
    )
    print(json.dumps({
        "metric": "tta_r50_3scale_hflip_throughput",
        "value": round(img_s, 2),
        "unit": "img/s",
        "compile_s": round(compile_s, 1),
        "compiled_programs": n_compiled,
        "augs": len(augs),
    }))


if __name__ == "__main__":
    main()

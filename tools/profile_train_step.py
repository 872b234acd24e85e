#!/usr/bin/env python
"""Train-step device-op profile — VERDICT r3 item 6.

Profiles the flagship PAA R-50 B=32 train step (forward + GMM assignment
+ losses + backward + SGD) on the real chip with jax.profiler, parses
the xplane trace with jax.profiler.ProfileData, and prints the top
device ops grouped into MXU (conv/dot fusions), GN statistics
(convert/reduce), copies, scatter/gather, and other — answering where
the non-MXU fraction of the step goes (PERF.md measured ~64% MFU on the
train step vs 71% on the forward).

Usage: python tools/profile_train_step.py [--batch 32] [--hw 800 1344]
       [--steps 3] [--config CONFIG]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def classify(name):
    n = name.lower()
    if "convolution" in n or "dot" in n or "conv" in n:
        return "mxu(conv/dot fusions)"
    if "convert_reduce" in n or ("reduce" in n and "window" not in n):
        return "reduce/convert (GN stats, loss sums)"
    if n.startswith("copy") or "transpose" in n:
        return "copy/layout"
    if "scatter" in n or "gather" in n or "sort" in n or "select-and" in n:
        return "scatter/gather/sort (assignment, topk)"
    if "all-reduce" in n or "fusion" in n:
        return "fusion (elementwise/mixed)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paa_tpu.config import get_cfg
    from paa_tpu.engine import TrainState, jit_train_step
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    cfg = get_cfg()
    cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()

    hw = tuple(args.hw)
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), hw)
    params = variables["params"]
    tx, labels = make_optimizer(cfg, params)
    state = TrainState.create(model.module.apply, params, tx)

    step_fn = model.make_bucket_train_step(
        hw, param_label_tree=labels, num_shards=1
    )
    step = jit_train_step(step_fn, get_data_mesh(1))

    rng = np.random.RandomState(0)
    b = args.batch
    batch = {
        "images": jnp.asarray(
            rng.uniform(-2, 2, (b, *hw, 3)).astype(np.float32)
        ),
        "gt_boxes": jnp.asarray(
            np.tile(
                np.array(
                    [[[40, 60, 300, 400], [350, 100, 700, 500],
                      [100, 420, 520, 760]]],
                    np.float32,
                ),
                (b, 1, 1),
            )
        ),
        "gt_labels": jnp.asarray(
            np.tile(np.array([[3, 17, 55]], np.int32), (b, 1))
        ),
    }

    print(f"compiling B={b} {hw} train step ...", flush=True)
    t0 = time.time()
    state, metrics = step(state, batch)
    print(
        f"first step (compile+run): {time.time() - t0:.1f} s, "
        f"loss={float(metrics['loss_cls']):.3f}",
        flush=True,
    )
    # warmup: one more step, timed via host fetch (block_until_ready is
    # unreliable on axon — see verify skill)
    t0 = time.time()
    state, metrics = step(state, batch)
    _ = float(metrics["loss_cls"])
    warm = time.time() - t0
    print(f"steady step: {warm * 1000:.0f} ms ({b / warm:.1f} img/s)")

    trace_dir = os.environ.get(
        "PROFILE_DIR", tempfile.mkdtemp(prefix="paa_train_trace_")
    )
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        state, metrics = step(state, batch)
        _ = float(metrics["loss_cls"])
    jax.profiler.stop_trace()
    print(f"trace -> {trace_dir}")

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    pd = jax.profiler.ProfileData.from_file(paths[0])
    ops = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name.startswith("XLA Modules"):
                continue
            for ev in line.events:
                ops[ev.name] += ev.duration_ns / 1e6
    total = sum(ops.values())
    step_ms = total / args.steps
    print(
        f"\ndevice total {total:.1f} ms over {args.steps} steps "
        f"= {step_ms:.1f} ms/step attributed"
    )
    groups = collections.Counter()
    for name, ms in ops.items():
        groups[classify(name)] += ms
    print("\n== time by op class (per step) ==")
    for g, ms in groups.most_common():
        print(f"{ms / args.steps:8.2f} ms  {100 * ms / total:5.1f}%  {g}")
    print(f"\n== top {args.top} device ops (per step) ==")
    for name, ms in ops.most_common(args.top):
        print(f"{ms / args.steps:8.2f} ms  {100 * ms / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()

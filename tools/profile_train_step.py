#!/usr/bin/env python
"""Train-step device-op profile — VERDICT r3 item 6 / r4 item 1.

Profiles the flagship PAA R-50 B=32 train step (forward + GMM assignment
+ losses + backward + SGD) on the real chip with jax.profiler, parses
the xplane trace with jax.profiler.ProfileData, and prints the top
device ops — answering where the non-MXU fraction of the step goes.

Two details matter for honest numbers on TPU (round-5 fixes):
- only the device plane's "XLA Ops" line holds the serialized op
  timeline; "Steps" markers and "Async XLA Ops" (copy-start/done that
  OVERLAP compute) must be excluded or the totals double-count ~7x.
- XLA hides convolutions inside kOutput/kLoop fusions whose names say
  nothing ("fusion.2411"), so op-name classification undercounts the
  MXU share; instead the compiled HLO text is scanned to map each
  fusion name to whether its body contains a convolution/dot, and
  cost_analysis() supplies the true FLOP count for the MFU claim.

Usage: python tools/profile_train_step.py [--batch 32] [--hw 800 1344]
       [--steps 3]
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def fusion_op_classes(hlo_text):
    """Map computation/op name -> class by scanning the optimized HLO:
    a fusion is MXU if the fused computation it calls contains a
    convolution or dot op."""
    # fused computation bodies: name -> body text
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(
            r"(?:ENTRY\s+)?(%?[\w.\-]+)\s*\([^)]*\)\s*->.*{\s*$",
            line.strip(),
        )
        if m:
            cur = m.group(1).lstrip("%")
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)
            if line.strip() == "}":
                cur = None
    mxu_comps = {
        name
        for name, body in comps.items()
        if any(
            " convolution(" in ln or " dot(" in ln
            or "= convolution" in ln or "= dot" in ln
            for ln in body
        )
    }
    # op name -> class, from top-level instructions that call computations
    op_class = {}
    for name, body in comps.items():
        for ln in body:
            m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=.*", ln)
            if not m:
                continue
            op = m.group(1)
            mc = re.search(r"calls=%?([\w.\-]+)", ln)
            if "fusion(" in ln and mc:
                op_class[op] = (
                    "mxu (fusion w/ conv|dot)"
                    if mc.group(1) in mxu_comps
                    else "elementwise/reduce fusion"
                )
            elif " convolution(" in ln or "= convolution" in ln:
                op_class[op] = "mxu (bare conv)"
            elif " dot(" in ln:
                op_class[op] = "mxu (bare dot)"
    return op_class


def classify(name, op_class):
    op = name.lstrip("%").split(" ")[0].split("=")[0].strip()
    if op in op_class:
        return op_class[op]
    n = name.lower()
    if "convolution" in n or "dot" in n or "conv" in n:
        return "mxu (bare conv)"
    if "reduce" in n and "window" not in n:
        return "reduce/convert"
    if n.startswith("%copy") or "transpose" in n:
        return "copy/layout"
    if "scatter" in n or "gather" in n or "sort" in n or "select-and" in n:
        return "scatter/gather/sort"
    if "fusion" in n:
        return "elementwise/reduce fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--config-file", default="configs/paa/paa_R_50_FPN_1x.yaml"
    )
    ap.add_argument(
        "opts", nargs=argparse.REMAINDER,
        help="dotted-key config overrides (e.g. TPU.DCN_MODE onehot)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paa_tpu.config import get_cfg
    from paa_tpu.engine import TrainState, jit_train_step
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.comm import get_data_mesh

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.MODEL.WEIGHT = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    print(f"config: {args.config_file}  overrides: {args.opts}")

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

    print(f"compiling B={b} {hw} train step (AOT) ...", flush=True)
    t0 = time.time()
    compiled = step.lower(state, batch).compile()
    compile_s = time.time() - t0
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    hbm_bytes = float(
        cost.get("bytes accessed", cost.get("bytes accessed0{}", 0.0))
    )
    print(
        f"compile: {compile_s:.1f} s; XLA cost analysis: "
        f"{flops / 1e12:.2f} TFLOP/step, "
        f"{hbm_bytes / 1e9:.2f} GB accessed/step"
    )
    op_class = fusion_op_classes(compiled.as_text())
    print(f"classified {len(op_class)} compiled ops from the HLO")

    t0 = time.time()
    state, metrics = compiled(state, batch)
    print(
        f"first run: {time.time() - t0:.1f} s, "
        f"loss={float(metrics['loss_cls']):.3f}",
        flush=True,
    )
    # steady state: chain steps through the state carry, ONE host fetch
    # at the end (block_until_ready is unreliable on axon; a per-step
    # fetch would add a host round-trip to every step)
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = compiled(state, batch)
    _ = float(metrics["loss_cls"])
    warm = (time.time() - t0) / args.steps
    print(
        f"steady step: {warm * 1000:.0f} ms ({b / warm:.1f} img/s) -> "
        f"{flops / warm / 1e12:.1f} TFLOP/s "
        f"= {100 * flops / warm / 197e12:.1f}% of nominal peak, "
        f"{100 * flops / warm / 128e12:.1f}% of this chip's measured "
        f"matmul ceiling (PERF.md)"
    )

    trace_dir = os.environ.get(
        "PROFILE_DIR", tempfile.mkdtemp(prefix="paa_train_trace_")
    )
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        state, metrics = compiled(state, batch)
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
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            # ONLY the serialized op timeline: "Steps" markers span the
            # whole step and "Async XLA Ops" (copy-start/done) overlap
            # compute — both double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                ops[ev.name] += ev.duration_ns / 1e6
    total = sum(ops.values())
    step_ms = total / args.steps
    print(
        f"\ndevice total {total:.1f} ms over {args.steps} steps "
        f"= {step_ms:.1f} ms/step attributed "
        f"({warm * 1e3 - step_ms:.0f} ms/step dispatch gap)"
    )
    groups = collections.Counter()
    for name, ms in ops.items():
        groups[classify(name, op_class)] += ms
    print("\n== time by op class (per step) ==")
    for g, ms in groups.most_common():
        print(f"{ms / args.steps:8.2f} ms  {100 * ms / total:5.1f}%  {g}")
    print(f"\n== top {args.top} device ops (per step) ==")
    for name, ms in ops.most_common(args.top):
        cls = classify(name, op_class)
        print(
            f"{ms / args.steps:8.2f} ms  {100 * ms / total:5.1f}%  "
            f"[{cls}] {name[:120]}"
        )


if __name__ == "__main__":
    main()

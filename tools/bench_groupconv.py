#!/usr/bin/env python
"""A/B microbenchmark: ResNeXt grouped-conv lowerings on the MXU.

North-star config 4 (paa_dcnv2_X_101_64x4d_FPN_2x) runs 64-group /
4-wide bottleneck convs (reference resnet.py:98-101 via NUM_GROUPS /
WIDTH_PER_GROUP). A grouped conv with 4-channel groups maps terribly
onto the 128x128 MXU: each group's matmul has K = 9*4 = 36 and N = 4,
~3% lane utilization. Candidate reformulations (all EXACT — the extra
multiplies are by structural zeros):

  grouped     lax feature_group_count=G (current paa_tpu default)
  dense       feature_group_count=1 with a block-diagonal kernel
              (G x more FLOPs at full MXU efficiency)
  superN      feature_group_count = G*c/N: merge m = N/c groups into one
              N-wide supergroup whose kernel is block-diagonal
              (m x more FLOPs; N=128 matches the MXU lane tile)
  g2b         group-to-batch: transpose x to (G*B, H, W, c) and run with
              batch_group_count=G — TRUE grouped FLOPs, zero padding,
              but each group's implicit matmul keeps N = out_g lanes

Run:  python tools/bench_groupconv.py [--batch 8] [--stage all]
Prints per-variant ms and img/s-equivalents.
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def expand_supergroup(w, groups, super_width):
    """(kh, kw, c, O) grouped-HWIO kernel -> block-diagonal kernel for
    feature_group_count = G' = G*c // super_width  (m = G//G' groups per
    supergroup). Output shape (kh, kw, m*c, O); zero off-diagonal.
    Exact: extra contractions multiply structural zeros."""
    import jax.numpy as jnp

    kh, kw, c, o = w.shape
    og = o // groups
    m = super_width // (og if og > c else c)  # groups per supergroup
    m = max(1, min(m, groups))
    gp = groups // m  # new feature_group_count
    # w5: (kh, kw, c, gp, m, og) - group g = sg*m + a
    w5 = w.reshape(kh, kw, c, gp, m, og)
    eye = jnp.eye(m, dtype=w.dtype)  # (a_in, a_out)
    # out kernel: (kh, kw, a_in, c, gp, m, og) with a_in==m diag
    wbd = jnp.einsum("xycgmo,nm->xyncgmo", w5, eye)
    # lax grouped conv kernel layout: input dim = (a_in, c) per supergroup,
    # output dim = full O ordered (gp, m, og) group-major
    return wbd.transpose(0, 1, 2, 3, 4, 5, 6).reshape(
        kh, kw, m * c, o
    ), gp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # (name, H, W, C, groups) — X-101-64x4d bottleneck conv2 shapes at
    # 800x1344; C = bottleneck channels = 64 * width * 2^stage
    stages = [
        ("stage2 200x336 c256 g64", 200, 336, 256, 64),
        ("stage3 100x168 c512 g64", 100, 168, 512, 64),
        ("stage4 50x84 c1024 g64", 50, 84, 1024, 64),
        ("stage5 25x42 c2048 g64", 25, 42, 2048, 64),
        ("32x8d-s3 100x168 c512 g32", 100, 168, 512, 32),
    ]
    if args.stage != "all":
        stages = [s for s in stages if s[0].startswith(args.stage)]

    b = args.batch
    rng = np.random.RandomState(0)

    def timeit(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        # serial carry-chain timing (axon block_until_ready unreliable)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            carry = jnp.float32(0.0)
            for _ in range(args.iters):
                carry = carry + fn(*xs).astype(jnp.float32).ravel()[0]
            float(carry)
            best = min(best, (time.time() - t0) / args.iters)
        return best * 1e3  # ms

    for name, h, w_, c, groups in stages:
        cg = c // groups
        x = jnp.asarray(
            rng.uniform(-1, 1, (b, h, w_, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wk = jnp.asarray(
            rng.uniform(-0.1, 0.1, (3, 3, cg, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def conv_fgc(x, k, fgc):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=fgc,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        results = {}
        results["grouped"] = timeit(
            jax.jit(lambda x, k: conv_fgc(x, k, groups)), x, wk
        )
        for sw in (64, 128, 256):
            if sw <= cg:
                continue
            wbd, gp = expand_supergroup(wk, groups, sw)
            if gp < 1:
                continue
            results[f"super{sw} (fgc={gp})"] = timeit(
                jax.jit(lambda x, k, gp=gp: conv_fgc(x, k, gp)), x, wbd
            )
        wdense, _ = expand_supergroup(wk, groups, c)
        results["dense"] = timeit(
            jax.jit(lambda x, k: conv_fgc(x, k, 1)), x, wdense
        )

        # group-to-batch: batch_group_count=G pays the TRUE grouped
        # FLOPs (no zero padding) — input batch slice g produces output
        # feature slice g — at the cost of a (B,H,W,G,c)->(G*B,H,W,c)
        # transpose each side and the same tiny per-group N as `grouped`
        def conv_g2b(x, k):
            xg = x.reshape(b, h, w_, groups, cg)
            xg = jnp.moveaxis(xg, 3, 0).reshape(groups * b, h, w_, cg)
            out = jax.lax.conv_general_dilated(
                xg, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                batch_group_count=groups,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # (B, H, W, O) group-major features
            return out

        results["g2b (batch_group)"] = timeit(jax.jit(conv_g2b), x, wk)

        # correctness spot check (vs grouped, f32)
        ref = conv_fgc(x, wk, groups)
        wbd, gp = expand_supergroup(wk, groups, 128)
        got = conv_fgc(x, wbd, gp)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        err_g2b = float(jnp.max(jnp.abs(
            ref.astype(jnp.float32) - conv_g2b(x, wk).astype(jnp.float32)
        )))
        print(f"\n{name}  B={b}  (super128 max|err| vs grouped: {err:.2e}, "
              f"g2b: {err_g2b:.2e})")
        base = results["grouped"]
        for k, v in results.items():
            print(f"  {k:20s} {v:8.2f} ms   ({base / v:5.2f}x vs grouped)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evaluation CLI.

Mirrors reference tools/test_net.py: evaluate one checkpoint, or watch a
checkpoint directory (--eval_dir): poll every 5 minutes for new
checkpoints, evaluate each, track the best AP, optionally keep only the
best (test_net.py:31-146). The reference's hard apex.amp import quirk is
deliberately NOT replicated (SURVEY.md flags it as an environment bug).
"""

import argparse
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(cfg):
    import jax

    from paa_tpu.modeling import build_detection_model

    model = build_detection_model(cfg)
    init_hw = tuple(cfg.TPU.TEST_BUCKETS[0])
    variables = model.init(jax.random.PRNGKey(0), init_hw)
    return model, variables


def _write_tb_scalars(output_dir, dataset_names, all_results, n_iter):
    """TensorBoard scalars per evaluated checkpoint, mirroring reference
    tools/test_net.py:140-143 ('{dataset}_{metric}' tags at the
    checkpoint's iteration). Soft dependency: skipped when tensorboard
    is unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:  # noqa: BLE001
        return
    writer = SummaryWriter(output_dir)
    for name, results in zip(dataset_names, all_results):
        if not isinstance(results, dict):
            continue
        for ap_type, ap in results.items():
            if isinstance(ap, (int, float)):
                writer.add_scalar(f"{name}_{ap_type}", float(ap), n_iter)
    writer.close()


def _ckpt_iteration(ckpt_path):
    """model_0025000[.pth] -> 25000 (reference test_net.py:202-204)."""
    name = os.path.basename(ckpt_path or "")
    m = re.search(r"model_(\d+)", name)
    return int(m.group(1)) if m else 0


def eval_checkpoint(cfg, model, variables, ckpt_path, logger,
                    tb_iter=None):
    from paa_tpu.data.build import build_dataset
    from paa_tpu.engine.inference import inference
    from paa_tpu.utils.checkpoint import Checkpointer

    if ckpt_path:
        checkpointer = Checkpointer(
            os.path.dirname(ckpt_path) or ".", logger=logger
        )
        template = {"params": variables["params"], "opt_state": None}
        if "batch_stats" in variables:  # SyncBN running stats
            template["batch_stats"] = variables["batch_stats"]
        tree, _ = checkpointer.load(ckpt_path, template)
        if tree is not None:
            variables = {"params": tree["params"]}
            if tree.get("batch_stats") is not None:
                variables["batch_stats"] = tree["batch_stats"]

    datasets = build_dataset(cfg, cfg.DATASETS.TEST, is_train=False)
    if not isinstance(datasets, list):
        datasets = [datasets]
    all_results = []
    for name, dataset in zip(cfg.DATASETS.TEST, datasets):
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        results = inference(
            cfg, model, variables, dataset,
            output_folder=output_folder, logger=logger,
        )
        all_results.append(results)
    if tb_iter is not None:
        _write_tb_scalars(
            cfg.OUTPUT_DIR, list(cfg.DATASETS.TEST), all_results, tb_iter
        )
    return all_results


def watch_dir(cfg, model, variables, eval_dir, logger,
              poll_s=300, give_up_s=6 * 3600, keep_best_only=False):
    evaluated = set()
    best_ap, best_ckpt = -1.0, None
    last_new = time.time()
    while True:
        ckpts = sorted(glob.glob(os.path.join(eval_dir, "model_*")))
        fresh = [c for c in ckpts if c not in evaluated]
        for ckpt in fresh:
            last_new = time.time()
            for attempt in range(3):
                try:
                    results = eval_checkpoint(
                        cfg, model, variables, ckpt, logger,
                        tb_iter=_ckpt_iteration(ckpt),
                    )
                    break
                except Exception as e:  # noqa: BLE001
                    logger.warning(f"eval failed ({e}); retrying in 10s")
                    time.sleep(10)
            else:
                continue
            evaluated.add(ckpt)
            ap = results[0].get("AP", -1.0) if results else -1.0
            if ap > best_ap:
                best_ap, best_ckpt = ap, ckpt
                logger.info(f"new best AP {ap:.4f} at {ckpt}")
            if keep_best_only:
                for c in list(evaluated):
                    if c != best_ckpt and os.path.isdir(c):
                        import shutil

                        shutil.rmtree(c, ignore_errors=True)
        if time.time() - last_new > give_up_s:
            logger.info("No new checkpoints for 6h; exiting watcher")
            return
        time.sleep(poll_s)


def main():
    parser = argparse.ArgumentParser(description="paa_tpu evaluation")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument("--keep_best_only", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from paa_tpu.config import get_cfg
    from paa_tpu.utils.logger import setup_logger

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("paa_tpu", cfg.OUTPUT_DIR)
    model, variables = build(cfg)

    if args.eval_dir:
        watch_dir(cfg, model, variables, args.eval_dir, logger,
                  keep_best_only=args.keep_best_only)
    else:
        eval_checkpoint(cfg, model, variables, args.ckpt, logger)


if __name__ == "__main__":
    main()

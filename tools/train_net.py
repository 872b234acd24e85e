#!/usr/bin/env python
"""Training CLI.

Mirrors reference tools/train_net.py: --config-file, dotted-key overrides,
--skip-test, checkpoint resume; NCCL process-group setup is replaced by a
jax.sharding data mesh (no bootstrap needed on a TPU slice).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="paa_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--skip-test", action="store_true")
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="Modify config options using the command-line",
    )
    args = parser.parse_args()

    import jax

    from paa_tpu.config import get_cfg
    from paa_tpu.utils.logger import setup_logger

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("paa_tpu", output_dir)
    from paa_tpu.utils.comm import initialize_multihost

    # multi-host slices: bootstrap jax.distributed when a coordinator is
    # configured (no-op on one host); the loader then shards the global
    # batch by jax.process_index()
    initialize_multihost(logger)
    from paa_tpu.utils.misc import collect_env_info, save_config

    logger.info(f"environment:\n{collect_env_info()}")
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"Running with config:\n{cfg}")
    if output_dir:
        # persist the merged config next to the run's outputs
        # (reference train_net.py output_config_path)
        save_config(cfg, os.path.join(output_dir, "config.yml"))

    model, state = train(cfg, logger)

    if not args.skip_test:
        run_test(cfg, model, state, logger)


def train(cfg, logger):
    import jax

    from paa_tpu.data.build import build_dataset
    from paa_tpu.engine.train_step import TrainState
    from paa_tpu.engine.trainer import do_train
    from paa_tpu.modeling import build_detection_model
    from paa_tpu.solver import make_optimizer
    from paa_tpu.utils.checkpoint import Checkpointer
    from paa_tpu.utils.comm import get_data_mesh

    model = build_detection_model(cfg)
    mesh = get_data_mesh(cfg.TPU.MESH_DATA)
    logger.info(f"mesh: {mesh}")

    init_hw = tuple(cfg.TPU.TRAIN_BUCKETS[0])
    variables = model.init(jax.random.PRNGKey(0), init_hw)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")  # SyncBN running stats

    # pretrained / resume weights
    checkpointer = Checkpointer(cfg.OUTPUT_DIR, logger=logger)
    start_iter = 0
    weight = cfg.MODEL.WEIGHT
    if checkpointer.has_checkpoint():
        tx, _ = make_optimizer(cfg, params)
        state = TrainState.create(
            model.module.apply, params, tx, batch_stats=batch_stats
        )
        tree, extra = checkpointer.load(
            None, {"params": state.params, "opt_state": state.opt_state}
        )
        if tree is not None:
            state = state.replace(
                params=tree["params"], opt_state=tree["opt_state"]
            )
            start_iter = int(extra.get("iteration", 0))
            state = state.replace(
                step=jax.numpy.asarray(start_iter, jax.numpy.int32)
            )
    else:
        if weight:
            from paa_tpu.utils.torch_import import load_pretrained_into

            params = load_pretrained_into(cfg, params, weight, logger)
        tx, _ = make_optimizer(cfg, params)
        state = TrainState.create(
            model.module.apply, params, tx, batch_stats=batch_stats
        )

    dataset = build_dataset(cfg, cfg.DATASETS.TRAIN, is_train=True)
    logger.info(f"train dataset: {len(dataset)} images")

    state = do_train(
        cfg, model, state, dataset, mesh,
        checkpointer=checkpointer, start_iter=start_iter, logger=logger,
    )
    return model, state


def run_test(cfg, model, state, logger):
    from paa_tpu.data.build import build_dataset
    from paa_tpu.engine.inference import inference

    datasets = build_dataset(cfg, cfg.DATASETS.TEST, is_train=False)
    if not isinstance(datasets, list):
        datasets = [datasets]
    for name, dataset in zip(cfg.DATASETS.TEST, datasets):
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        inference(
            cfg, model, variables, dataset,
            output_folder=output_folder, logger=logger,
        )


if __name__ == "__main__":
    main()

"""Evaluation engine.

Mirrors reference paa_core/engine/inference.py:19-123: batched no-grad
forward + post-processing per image, predictions gathered to host keyed by
image id, timing of total vs model time, then COCO-style evaluation.

TPU redesign: one jitted forward+postprocess program per size bucket;
boxes are rescaled to original image coordinates on host and converted to
COCO xywh with the +1 convention (BoxList.convert semantics) before
entering the evaluator.
"""

from __future__ import annotations

import logging
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import make_data_loader
from ..evaluation.coco_eval import COCOEvaluator, format_results
from ..modeling.paa_inference import PostProcessConfig, paa_postprocess


def make_eval_fn(model, variables, pp=None, mesh=None):
    """Returns eval_fn(images, image_sizes) jitted per input shape.

    The model provides the body (dense heads and two-stage R-CNN expose
    the same make_eval_fn protocol); ``pp`` is retained for signature
    compatibility and unused.
    """
    return model.make_eval_fn(variables, mesh=mesh)


def _eval_mesh(model):
    """Local data mesh for eval, when this process has several devices
    and the static eval batch divides across them (each process
    evaluates its round-robin share of batches on its own chips)."""
    n_local = len(jax.local_devices())
    batch = model.cfg.TEST.IMS_PER_BATCH
    if n_local > 1 and batch % n_local == 0:
        from ..utils.comm import local_data_mesh

        return local_data_mesh()
    return None


def _gather_fallback_eval_fn(model, variables, logger=None):
    """Gather-pinned eval fn for TPU.DCN_MODE='optimistic' escapes.

    Optimistic programs run the pure onehot DCN lowering and only REPORT
    per-image escape flags; exactness for out-of-window offsets lives
    here: a second model pinned to the (always-exact) gather lowering,
    compiled lazily on the first escaped batch and used to re-run it.
    """
    from ..modeling import build_detection_model
    from ..ops.dcn import set_default_dcn_mode

    cfg = model.cfg.clone()
    cfg.defrost()
    cfg.TPU.DCN_MODE = "gather"
    cfg.freeze()
    gather_model = build_detection_model(cfg)
    # build_detection_model set the process-wide default mode as a side
    # effect; restore the primary model's configuration
    set_default_dcn_mode(
        model.cfg.TPU.DCN_MODE, model.cfg.TPU.DCN_WINDOW_MARGIN
    )
    if logger:
        logger.info(
            "DCN optimistic escape: compiling gather-pinned fallback"
        )
    return gather_model.make_eval_fn(variables, mesh=_eval_mesh(model))


def compute_on_dataset(model, variables, loader, pp=None, logger=None):
    eval_fn = make_eval_fn(model, variables, pp, mesh=_eval_mesh(model))
    fallback_fn = None
    predictions = {}
    model_time = 0.0
    n_images = 0
    # multi-host: processes take disjoint round-robin batches, then the
    # per-process prediction dicts are gathered (the reference's pickle
    # all_gather at eval, paa_core/engine/inference.py:45-64)
    p_count, p_index = jax.process_count(), jax.process_index()
    for batch_i, batch in enumerate(loader):
        if batch_i % p_count != p_index:
            continue
        t0 = time.time()
        det = eval_fn(
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["image_sizes"]),
        )
        det = jax.tree_util.tree_map(np.asarray, det)
        if det.pop("dcn_escaped", np.False_).any():
            # optimistic DCN: some image's offsets escaped the onehot
            # window — re-run the batch through the exact gather model
            if fallback_fn is None:
                fallback_fn = _gather_fallback_eval_fn(
                    model, variables, logger
                )
            det = jax.tree_util.tree_map(
                np.asarray,
                fallback_fn(
                    jnp.asarray(batch["images"]),
                    jnp.asarray(batch["image_sizes"]),
                ),
            )
        model_time += time.time() - t0

        for i, img_id in enumerate(batch["image_ids"]):
            if img_id < 0:  # padding image in a short batch
                continue
            n_images += 1
            valid = det["valid"][i]
            boxes = det["boxes"][i][valid]
            scores = det["scores"][i][valid]
            labels = det["labels"][i][valid]
            # rescale network-input coords -> original image coords
            oh, ow = batch["orig_sizes"][i]
            rh, rw = batch["image_sizes"][i]
            scale = np.array(
                [ow / rw, oh / rh, ow / rw, oh / rh], dtype=np.float32
            )
            boxes = boxes * scale
            # xyxy -> COCO xywh with the +1 convention (BoxList.convert)
            xywh = np.stack(
                [
                    boxes[:, 0],
                    boxes[:, 1],
                    boxes[:, 2] - boxes[:, 0] + 1.0,
                    boxes[:, 3] - boxes[:, 1] + 1.0,
                ],
                axis=1,
            )
            pred = dict(boxes_xywh=xywh, scores=scores, labels=labels)
            if "kp_heatmaps" in det:
                # heatmaps -> (x, y, score) in network coords, then
                # rescale to original coords (reference
                # heatmaps_to_keypoints + Keypoints.resize)
                from ..structures.keypoints import heatmaps_to_keypoints

                net_boxes = det["boxes"][i][valid]
                kps = heatmaps_to_keypoints(
                    det["kp_heatmaps"][i][valid], net_boxes
                )
                kps[..., 0] *= ow / rw
                kps[..., 1] *= oh / rh
                pred["keypoints"] = kps
            if "masks" in det:
                # paste box-frame mask probs into the original image and
                # RLE-encode (reference Masker + pycocotools encode,
                # coco_eval.py prepare_for_coco_segmentation)
                from ..evaluation import mask_rle
                from ..structures.masks import paste_mask_in_image

                oh_i, ow_i = int(round(float(oh))), int(round(float(ow)))
                pred["masks_rle"] = [
                    mask_rle.encode(
                        paste_mask_in_image(m, b, oh_i, ow_i)
                    )
                    for m, b in zip(det["masks"][i][valid], boxes)
                ]
            predictions[int(img_id)] = pred
    if p_count > 1:
        from ..utils.comm import all_gather_pickled

        merged = {}
        for part in all_gather_pickled(predictions):
            merged.update(part)
        predictions = merged
    return predictions, model_time, n_images


def inference(cfg, model, variables, dataset, output_folder=None,
              logger=None):
    logger = logger or logging.getLogger("paa_tpu.inference")
    if cfg.TEST.BBOX_AUG.ENABLED:
        from .bbox_aug import inference_tta

        return inference_tta(
            cfg, model, variables, dataset, output_folder, logger
        )
    loader = make_data_loader(cfg, dataset, is_train=False)
    pp = model.postprocess_config()

    t_start = time.time()
    predictions, model_time, n_images = compute_on_dataset(
        model, variables, loader, pp, logger
    )
    total = time.time() - t_start
    if n_images:
        logger.info(
            f"Total run time: {total:.1f}s "
            f"({total / n_images:.4f} s/img); model time "
            f"{model_time:.1f}s ({model_time / n_images:.4f} s/img)"
        )

    if getattr(model, "head_type", "") == "rpn":
        # box-proposal AR evaluation (reference coco_eval.py:189-300 +
        # COCOResults 'box_proposal' table) instead of COCO AP
        from ..evaluation.coco_eval import evaluate_box_proposals

        proposals = {}
        for img_id, p in predictions.items():
            xywh = np.asarray(p["boxes_xywh"], np.float64)
            proposals[img_id] = dict(
                boxes=np.stack(
                    [
                        xywh[:, 0],
                        xywh[:, 1],
                        xywh[:, 0] + xywh[:, 2] - 1.0,
                        xywh[:, 1] + xywh[:, 3] - 1.0,
                    ],
                    axis=1,
                ) if len(xywh) else np.zeros((0, 4))
            )
        image_ids = [r.id for r in dataset.records]
        results = {}
        for limit in (100, 1000):
            for aname, akey in (
                ("", "all"), ("s", "small"), ("m", "medium"),
                ("l", "large"),
            ):
                stats = evaluate_box_proposals(
                    proposals, dataset._raw_annotations, image_ids,
                    area=akey, limit=limit,
                )
                results[f"AR{aname}@{limit}"] = stats["ar"]
        logger.info(
            "box_proposal:\n" + "\n".join(
                f"{k}: {v:.4f}" for k, v in results.items()
            )
        )
        if output_folder:
            import json as _json
            import os as _os

            _os.makedirs(output_folder, exist_ok=True)
            with open(
                _os.path.join(output_folder, "box_proposals.json"), "w"
            ) as f:
                _json.dump(results, f, indent=2)
        return results

    # map contiguous labels -> json category ids
    cat_ids = sorted(dataset.contiguous_category_id_to_json_id.values())
    detections: Dict[int, dict] = {}
    for img_id, p in predictions.items():
        detections[img_id] = dict(
            boxes_xywh=p["boxes_xywh"],
            scores=p["scores"],
            category_ids=np.asarray(
                [
                    dataset.contiguous_category_id_to_json_id[int(l)]
                    for l in p["labels"]
                ],
                dtype=np.int64,
            ),
        )

    image_ids = [r.id for r in dataset.records]
    evaluator = COCOEvaluator(
        dataset._raw_annotations, cat_ids, image_ids
    )
    results = evaluator.evaluate(detections)
    logger.info("\n" + format_results(results))

    if any("keypoints" in p for p in predictions.values()):
        for img_id, p in predictions.items():
            detections[img_id]["keypoints"] = p.get(
                "keypoints", np.zeros((0, 17, 3), np.float32)
            )
        kp_evaluator = COCOEvaluator(
            dataset._raw_annotations, cat_ids, image_ids,
            iou_type="keypoints",
        )
        kp_results = kp_evaluator.evaluate(detections)
        logger.info("keypoints:\n" + format_results(kp_results, "keypoints"))
        results = dict(results)
        results.update(
            {f"keypoints/{k}": v for k, v in kp_results.items()}
        )

    segm_results = None
    if any("masks_rle" in p for p in predictions.values()):
        for img_id, p in predictions.items():
            detections[img_id]["masks_rle"] = p["masks_rle"]
        image_sizes = {
            r.id: (r.height, r.width) for r in dataset.records
        }
        segm_evaluator = COCOEvaluator(
            dataset._raw_annotations, cat_ids, image_ids,
            iou_type="segm", image_sizes=image_sizes,
        )
        segm_results = segm_evaluator.evaluate(detections)
        logger.info("segm:\n" + format_results(segm_results))
        results = dict(results)
        results.update(
            {f"segm/{k}": v for k, v in segm_results.items()}
        )

    if cfg.TEST.EXPECTED_RESULTS:
        from ..evaluation.coco_eval import check_expected_results

        check_expected_results(
            results, cfg.TEST.EXPECTED_RESULTS,
            cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL, logger,
        )

    if output_folder:
        import json
        import os

        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "coco_results.json"), "w") as f:
            json.dump(results, f, indent=2)
        bbox_json = []
        for img_id, d in detections.items():
            for b, s, c in zip(
                d["boxes_xywh"], d["scores"], d["category_ids"]
            ):
                bbox_json.append(
                    dict(
                        image_id=int(img_id),
                        category_id=int(c),
                        bbox=[float(x) for x in b],
                        score=float(s),
                    )
                )
        with open(os.path.join(output_folder, "bbox.json"), "w") as f:
            json.dump(bbox_json, f)
    return results

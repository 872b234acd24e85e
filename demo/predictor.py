"""COCODemo-style single-image predictor.

Re-designs reference demo/predictor.py (note: the reference's demo is
broken — it imports the renamed ``atss_core`` package; SURVEY.md flags
this): loads a config + checkpoint, runs the jitted inference pipeline on
one BGR image, and returns/draws detections above a confidence threshold.
"""

from __future__ import annotations

import math

import numpy as np

COCO_CATEGORIES = [
    "__background", "person", "bicycle", "car", "motorcycle", "airplane",
    "bus", "train", "truck", "boat", "traffic light", "fire hydrant",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis",
    "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "wine glass",
    "cup", "fork", "knife", "spoon", "bowl", "banana", "apple",
    "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza",
    "donut", "cake", "chair", "couch", "potted plant", "bed",
    "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]


class COCODemo:
    def __init__(self, cfg, checkpoint_path=None,
                 confidence_threshold=0.7):
        import jax

        from paa_tpu.modeling import build_detection_model

        self.cfg = cfg
        self.confidence_threshold = confidence_threshold
        self.model = build_detection_model(cfg)
        hw = tuple(cfg.TPU.TEST_BUCKETS[0])
        self.variables = self.model.init(jax.random.PRNGKey(0), hw)
        if checkpoint_path:
            from paa_tpu.utils.checkpoint import Checkpointer

            ckpt = Checkpointer(".")
            tree, _ = ckpt.load(
                checkpoint_path,
                {"params": self.variables["params"], "opt_state": None},
            )
            if tree is not None:
                self.variables = {"params": tree["params"]}
        self._eval_fns = {}

    def _eval_fn(self, hw):
        if hw not in self._eval_fns:
            import jax
            import jax.numpy as jnp

            anchors, counts = self.model.anchors_for(hw)
            anchors = jnp.asarray(anchors)

            @jax.jit
            def fn(variables, images, sizes):
                out = self.model.module.apply(variables, images)
                return self.model.postprocess(out, sizes, anchors, counts)

            self._eval_fns[hw] = fn
        return self._eval_fns[hw]

    def compute_prediction(self, image_bgr):
        """image_bgr: HWC uint8. Returns (boxes xyxy in original coords,
        scores, labels) above the confidence threshold."""
        import cv2
        import jax.numpy as jnp

        from paa_tpu.data.transforms import get_resize_size, normalize_image

        h, w = image_bgr.shape[:2]
        oh, ow = get_resize_size(
            (w, h), self.cfg.INPUT.MIN_SIZE_TEST,
            self.cfg.INPUT.MAX_SIZE_TEST,
        )
        resized = cv2.resize(image_bgr, (ow, oh),
                             interpolation=cv2.INTER_LINEAR)
        norm = normalize_image(
            resized, self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD
        )
        bh = int(math.ceil(oh / 32) * 32)
        bw = int(math.ceil(ow / 32) * 32)
        padded = np.zeros((1, bh, bw, 3), np.float32)
        padded[0, :oh, :ow] = norm

        det = self._eval_fn((bh, bw))(
            self.variables, jnp.asarray(padded),
            jnp.asarray([[float(oh), float(ow)]]),
        )
        valid = np.asarray(det["valid"][0])
        boxes = np.asarray(det["boxes"][0])[valid]
        scores = np.asarray(det["scores"][0])[valid]
        labels = np.asarray(det["labels"][0])[valid]
        keep = scores >= self.confidence_threshold
        boxes = boxes[keep] * np.array(
            [w / ow, h / oh, w / ow, h / oh], np.float32
        )
        return boxes, scores[keep], labels[keep]

    def run_on_opencv_image(self, image_bgr):
        """Returns the image with detections drawn."""
        import cv2

        boxes, scores, labels = self.compute_prediction(image_bgr)
        out = image_bgr.copy()
        for box, score, label in zip(boxes, scores, labels):
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(out, (x1, y1), (x2, y2), (0, 255, 0), 2)
            name = (
                COCO_CATEGORIES[int(label)]
                if int(label) < len(COCO_CATEGORIES)
                else str(int(label))
            )
            cv2.putText(
                out, f"{name}: {score:.2f}", (x1, max(y1 - 4, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
            )
        return out

from .boxes import (
    TO_REMOVE,
    box_area,
    box_iou,
    box_iou_aligned,
    clip_to_image,
    xywh_to_xyxy,
    xyxy_to_xywh,
)

__all__ = [
    "TO_REMOVE",
    "box_area",
    "box_iou",
    "box_iou_aligned",
    "clip_to_image",
    "xywh_to_xyxy",
    "xyxy_to_xywh",
]

from .focal_loss import sigmoid_focal_loss
from .gmm import gmm_fit_predict
from .nms import nms, nms_auto

__all__ = ["sigmoid_focal_loss", "gmm_fit_predict", "nms", "nms_auto"]

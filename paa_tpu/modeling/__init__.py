from .detector import DetectionModel, DenseDetector, build_detection_model

__all__ = ["DetectionModel", "DenseDetector", "build_detection_model"]

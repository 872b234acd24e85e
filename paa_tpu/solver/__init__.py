from .build import make_lr_schedule, make_optimizer, param_labels

__all__ = ["make_lr_schedule", "make_optimizer", "param_labels"]

from .train_step import TrainState, jit_train_step, make_train_step

__all__ = ["TrainState", "jit_train_step", "make_train_step"]

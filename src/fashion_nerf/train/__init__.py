from fashion_nerf.train.state import TrainState, create_train_state
from fashion_nerf.train.loop import make_train_step, train, make_fields

__all__ = ["TrainState", "create_train_state", "make_train_step", "train",
           "make_fields"]

from coarse3d_tpu.train.schedule import warmup_cosine_schedule
from coarse3d_tpu.train.state import TrainState, create_train_state

__all__ = ["warmup_cosine_schedule", "TrainState", "create_train_state"]

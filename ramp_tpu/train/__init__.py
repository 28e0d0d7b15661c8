from ramp_tpu.train.losses import diffusion_loss, weighted_l1, weighted_l2, weighted_l2_smooth, LOSSES
from ramp_tpu.train.state import TrainState, TrainConfig, create_train_state
from ramp_tpu.train.trainer import Trainer, make_train_step

from ramp_tpu.core.schedules import DiffusionSchedule, make_schedule, BETA_SCHEDULES
from ramp_tpu.core import diffusion
from ramp_tpu.core import normalization

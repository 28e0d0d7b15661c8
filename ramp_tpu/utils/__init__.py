from ramp_tpu.utils.timer import Timer
from ramp_tpu.utils.seed import fix_random_seed

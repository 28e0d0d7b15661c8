from ramp_tpu.guidance.apf import (
    APFParams, apf_static_batch, apf_windowed, apf_pursuer, nearest_obstacle,
)
from ramp_tpu.guidance.cost import (
    collision_with_pointcloud, path_length, smoothness, select_best_trajectory,
)

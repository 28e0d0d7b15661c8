from ramp_tpu.scenes.primitives import (
    sphere_sdf, box_sdf, rounded_box_sdf, scene_sdf, Scene,
)
from ramp_tpu.scenes.pointclouds import (
    generate_box_points, generate_sphere_points, generate_box_points_np,
    generate_sphere_points_np, scene_obstacle_points_np,
)
from ramp_tpu.scenes.dynamics import PursuitParams, pursuit_step
from ramp_tpu.scenes import envs

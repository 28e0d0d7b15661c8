from ramp_tpu.eval.metrics import (
    compute_collision_intensity, trajectory_success_and_metrics,
    compute_variance_waypoints, compute_path_length, compute_smoothness,
    dynamic_episode_metrics,
)

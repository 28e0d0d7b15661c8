from ramp_tpu.eval.metrics import (
    compute_path_length, compute_smoothness, compute_variance_waypoints,
    compute_collision_intensity, trajectory_success_and_metrics,
    dynamic_episode_metrics,
)
from ramp_tpu.eval.harness import StaticEvalHarness, ContextManager, sample_context
from ramp_tpu.eval.dynamic_harness import DynamicEvalHarness, episode_chains

"""RAMP-TPU: a TPU-native re-design of RAMP (Real-time Adaptive Motion Planning
via point-cloud-guided, energy-based diffusion and potential fields).

This is NOT a port of the reference PyTorch implementation. The compute path is
pure-functional JAX compiled by XLA for TPU:

  * the full reverse-diffusion chain is one `jax.lax.scan` under `jax.jit`
  * classifier-free guidance / energy composition is a folded batch axis
  * the energy-based score eps = grad_x 0.5*||f(x)||^2 is `jax.grad`
  * artificial-potential-field guidance runs on device (no host round-trips)
  * data parallelism is SPMD over a `jax.sharding.Mesh` (psum over ICI),
    not process-per-device NCCL

Reference behavior studied from wondmgezahu/RAMP (file:line citations are in
module docstrings throughout).
"""

__version__ = "0.1.0"

from ramp_tpu.core.schedules import DiffusionSchedule, make_schedule
from ramp_tpu.core import diffusion

# Lazy top-level API: `from ramp_tpu import StaticPlanner` etc. without
# paying the flax/optax import cost for light uses of the core math.
_LAZY = {
    "StaticPlanner": "ramp_tpu.planners.static",
    "StaticPlannerConfig": "ramp_tpu.planners.static",
    "DynamicPlanner": "ramp_tpu.planners.dynamic",
    "DynamicPlannerConfig": "ramp_tpu.planners.dynamic",
    "Planner3D": "ramp_tpu.planners.planner3d",
    "Planner3DConfig": "ramp_tpu.planners.planner3d",
    "PlanningService": "ramp_tpu.serve",
    "ControllerService": "ramp_tpu.serve",
    "Trainer": "ramp_tpu.train.trainer",
    "TrainConfig": "ramp_tpu.train.state",
    "TrajectoryDataset": "ramp_tpu.data.dataset",
    "STATIC_PRESETS": "ramp_tpu.presets",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'ramp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))

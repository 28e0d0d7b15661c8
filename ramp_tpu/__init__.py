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

"""Energy-based score: eps = grad_x 0.5 * ||f(x, t, scene)||^2.

The reference implements this with a custom torch autograd.Function and an
explicit `torch.autograd.grad(..., create_graph=training)` double-backward
(`UnetInference.py:19-37`, `UnetTrain.py:165-178`). In JAX it is literally
`jax.grad` of a scalar energy; grad-of-grad for training falls out of
composing `jax.grad` with the outer loss gradient — XLA differentiates the
whole thing natively, no DDP `find_unused_parameters` workarounds needed.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_energy_fn(apply_fn: Callable) -> Callable:
    """Scalar total energy 0.5*sum(f^2) over the whole (folded) batch.

    Per-sample energies are independent, so grad of the batch sum gives each
    row its own gradient (ref UnetInference.py:26 sums over the batch too).
    """
    def energy(params, x, t, scene_latents):
        out = apply_fn(params, x, t, scene_latents)
        out = out.astype(jnp.float32)
        return 0.5 * jnp.sum(out * out)
    return energy


def make_eps_fn(apply_fn: Callable, energy_mode: bool = True,
                remat: bool = False) -> Callable:
    """eps(params, x, t, scene_latents) -> [B, H, D].

    energy_mode=True is what the reference runs everywhere
    (`diffusion_model_static.py:44`, `UnetInference.py:61`). With
    energy_mode=False the raw network output is the score (kept for parity
    with the reference's `forward_no_energy` path).

    remat=True wraps the energy in `jax.checkpoint`: the backward pass
    recomputes the U-Net forward instead of reading stored activations —
    ~1.5x the FLOPs for ~half the HBM traffic. A tuning knob for the
    round-3 roofline attack (the replan runs at 4.9% of peak FLOPs but 35%
    of peak HBM, so trading compute for bandwidth is the right direction
    iff the live kernels are bandwidth-bound; measure with
    `scripts/profile_static.py`).
    """
    if not energy_mode:
        return apply_fn
    energy = make_energy_fn(apply_fn)
    if remat:
        energy = jax.checkpoint(energy)
    return jax.grad(energy, argnums=1)


def make_eps_and_energy_fn(apply_fn: Callable) -> Callable:
    """(eps, total_energy) — the training-mode return (ref UnetTrain.py:174-176)."""
    energy = make_energy_fn(apply_fn)
    grad_and_val = jax.value_and_grad(energy, argnums=1)

    def eps_and_energy(params, x, t, scene_latents):
        e, g = grad_and_val(params, x, t, scene_latents)
        return g, e
    return eps_and_energy

"""Classifier-free guidance / energy composition as a folded batch axis.

The reference replicates the trajectory batch 2x (CFG) or 3x (compose) per
U-Net call and zeroes scene latents for the unconditional rows
(`diffusion_model_static.py:131-229`, `UnetInference.py:188-197`). Here the
guidance branches are a leading fold axis G: the sampler evaluates the score
on a (G*B) batch where branch g uses `branch_latents[g]`, then combines

    e = sum_g weights[g] * eps_g

which reproduces:
  * CFG   (ref :164-165):  e = (1+w)*cond - w*uncond        -> w = (1+w, -w)
  * compose (ref :216):    e = out2 + w1(out0-out2) + w2(out1-out2)
                                                    -> w = (w1, w2, 1-w1-w2)
  * 3D CFG w=5.75 (ref diffusion_model_3d.py:150-152), compose w1=w2=5 (:163-182)

The unconditional branch's latent is simply zeros — the reference zeroes the
encoder output, so the encoder never needs to run for it.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


class GuidanceFold(NamedTuple):
    """branch_latents: [G, S, C] per-branch scene latents (broadcast over B).
    weights: [G] combine weights."""
    branch_latents: jnp.ndarray
    weights: jnp.ndarray


def guide_weights(config) -> jnp.ndarray:
    """Guidance weight(s) from a planner config as a traced-friendly array:
    [2] composition weights when `config.compose`, else the scalar CFG
    weight. Planners pass this as a jit ARGUMENT (not a closed-over
    constant) so weight sweeps reuse one compilation."""
    if getattr(config, "compose", False):
        return jnp.asarray(config.compose_weights, jnp.float32)
    return jnp.float32(config.cfg_weight)


def cfg_fold(cond_latents: jnp.ndarray, w: float) -> GuidanceFold:
    """cond_latents: [S, C] (or [1, S, C]) scene latents for one scene."""
    cond_latents = cond_latents.reshape(cond_latents.shape[-2], cond_latents.shape[-1])
    branches = jnp.stack([cond_latents, jnp.zeros_like(cond_latents)])
    return GuidanceFold(branches, jnp.asarray([1.0 + w, -w], jnp.float32))


def compose_fold(latents_a: jnp.ndarray, latents_b: jnp.ndarray,
                 w1: float, w2: float) -> GuidanceFold:
    """Two obstacle-set energies composed + unconditional branch."""
    latents_a = latents_a.reshape(latents_a.shape[-2], latents_a.shape[-1])
    latents_b = latents_b.reshape(latents_b.shape[-2], latents_b.shape[-1])
    branches = jnp.stack([latents_a, latents_b, jnp.zeros_like(latents_a)])
    return GuidanceFold(branches, jnp.asarray([w1, w2, 1.0 - w1 - w2], jnp.float32))


def guided_eps(eps_fn: Callable, params, x: jnp.ndarray, t: jnp.ndarray,
               fold: GuidanceFold) -> jnp.ndarray:
    """Evaluate the score on the folded (G*B) batch and combine branches.

    x: [B, H, D]; t: [B]; returns [B, H, D].
    """
    g = fold.branch_latents.shape[0]
    b, h, d = x.shape
    x_rep = jnp.broadcast_to(x[None], (g, b, h, d)).reshape(g * b, h, d)
    t_rep = jnp.broadcast_to(t[None], (g, b)).reshape(g * b)
    s, c = fold.branch_latents.shape[-2:]
    lat = jnp.broadcast_to(fold.branch_latents[:, None], (g, b, s, c)).reshape(g * b, s, c)
    eps = eps_fn(params, x_rep, t_rep, lat).reshape(g, b, h, d)
    return jnp.einsum("g,gbhd->bhd", fold.weights, eps.astype(jnp.float32))

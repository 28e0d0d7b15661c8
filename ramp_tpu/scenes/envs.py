"""Environment families: scene builders and random samplers.

The reference environments (`deps/torch_robotics/.../environments/`) are thin
wrappers binding dataset-provided box geometry to SDF objects:
EnvSimple2dquant (`env_simple2dquant.py:13`), EnvHard2dquant
(`env_hard2dquant.py:13`), EnvPredator / EnvPredatorObstacles
(`EnvPredator.py:12`, `EnvPredatorExtra.py:13`), EnvParameterized3D
(`env_3d.py:7`). All operate on limits [-1, 1]^dim.

Here an environment is just a `Scene` pytree plus a sampler that draws random
scene instances (used by the synthetic dataset generator — the reference repo
ships no dataset, so the framework includes its own generator with matched
layouts).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ramp_tpu.scenes.primitives import Scene

import jax.numpy as jnp


def make_scene_2d(box_centers, box_sizes) -> Scene:
    return Scene(box_centers=jnp.asarray(box_centers, jnp.float32),
                 box_sizes=jnp.asarray(box_sizes, jnp.float32))


def make_scene_3d(box_centers, box_sizes, sphere_centers, sphere_radii) -> Scene:
    return Scene(box_centers=jnp.asarray(box_centers, jnp.float32),
                 box_sizes=jnp.asarray(box_sizes, jnp.float32),
                 sphere_centers=jnp.asarray(sphere_centers, jnp.float32),
                 sphere_radii=jnp.asarray(sphere_radii, jnp.float32))


def _sample_boxes(rng: np.random.Generator, n_boxes: int, size_range: Tuple[float, float],
                  limit: float = 0.85, min_gap: float = 0.05, max_tries: int = 200):
    """Rejection-sample non-overlapping axis-aligned boxes in [-limit, limit]^2."""
    centers, sizes = [], []
    for _ in range(n_boxes):
        for _ in range(max_tries):
            size = rng.uniform(size_range[0], size_range[1], size=2)
            center = rng.uniform(-limit + size / 2, limit - size / 2)
            ok = True
            for c, s in zip(centers, sizes):
                if np.all(np.abs(center - c) < (size + s) / 2 + min_gap):
                    ok = False
                    break
            if ok:
                centers.append(center)
                sizes.append(size)
                break
        else:
            # fall back to whatever fits; scene stays valid
            centers.append(rng.uniform(-limit, limit, size=2))
            sizes.append(np.array(size_range[:1] * 2))
    return np.array(centers, np.float32), np.array(sizes, np.float32)


def sample_env_simple2d(rng: np.random.Generator, n_boxes: int = 6):
    """EnvSimple2dquant-style scene: 6 medium boxes."""
    centers, sizes = _sample_boxes(rng, n_boxes, (0.2, 0.35))
    return centers, sizes


def sample_env_hard2d(rng: np.random.Generator, n_boxes: int = 10):
    """EnvHard2dquant-style scene: 10 boxes (6 + 4 split for composition,
    ref inference_static.py:68-73)."""
    centers, sizes = _sample_boxes(rng, n_boxes, (0.15, 0.3))
    return centers, sizes


def sample_env_predator(rng: np.random.Generator, n_boxes: int = 4):
    """EnvPredator-style scene: 4 static boxes + a pursuer (dynamic state).

    The dynamic model uses the first 4 boxes for APF
    (ref diffusion_model_dynamic.py:516-517 slices [:4]).
    """
    centers, sizes = _sample_boxes(rng, n_boxes, (0.2, 0.35))
    return centers, sizes


def sample_env_3d(rng: np.random.Generator, n_boxes: int = 12, n_spheres: int = 8):
    """EnvParameterized3D-style scene: 20+ obstacles in [-1, 1]^3."""
    box_centers = rng.uniform(-0.8, 0.8, size=(n_boxes, 3)).astype(np.float32)
    box_sizes = rng.uniform(0.1, 0.25, size=(n_boxes, 3)).astype(np.float32)
    sphere_centers = rng.uniform(-0.8, 0.8, size=(n_spheres, 3)).astype(np.float32)
    sphere_radii = rng.uniform(0.05, 0.15, size=(n_spheres,)).astype(np.float32)
    return box_centers, box_sizes, sphere_centers, sphere_radii


ENV_SAMPLERS = {
    "EnvSimple2dquant": sample_env_simple2d,
    "EnvHard2dquant": sample_env_hard2d,
    "EnvPredator": sample_env_predator,
    "EnvSmall3D": sample_env_3d,
}

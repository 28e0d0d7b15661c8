"""Per-field data normalizers as pytrees.

Behavioral parity with `mpd/datasets/normalization.py`:
LimitsNormalizer (:144, maps [min,max]->[-1,1], clips on unnormalize),
GaussianNormalizer (:119), SafeLimitsNormalizer (:170),
FixedLimitsNormalizer (:187), Identity (:111), and the multi-field
DatasetNormalizer (:12) with its flatten rules (:58-78).

Normalizer state is HOST (numpy) arrays so jitted functions may close over a
normalizer safely: numpy constants bake into the HLO as literals, whereas
captured device buffers trigger a pathological per-dispatch cost on some
runtimes (see `ramp_tpu.core.schedules`). fit() runs once at ingest time.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_field(x: np.ndarray) -> np.ndarray:
    """Flatten leading dims so stats are over the last axis.

    ref `normalization.py:58-78` — 2D kept, 3D (b h d)->(bh d),
    4D (e b h d)->(ebh d).
    """
    if x.ndim == 2:
        return x
    if x.ndim in (3, 4):
        return x.reshape(-1, x.shape[-1])
    raise NotImplementedError(f"unsupported ndim {x.ndim}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LimitsNormalizer:
    """Maps [min, max] -> [-1, 1]; clips on unnormalize (ref :144-167)."""
    mins: jax.Array
    maxs: jax.Array

    @classmethod
    def fit(cls, x, safe: bool = False, eps: float = 1.0) -> "LimitsNormalizer":
        x = flatten_field(np.asarray(x))
        mins = x.min(axis=0)
        maxs = x.max(axis=0)
        if safe and np.any(mins == maxs):
            # ref SafeLimitsNormalizer :170-185 (note: the reference shifts
            # ALL dims when any is constant; reproduced here)
            mins = mins - eps
            maxs = maxs + eps
        return cls(np.asarray(mins, np.float32), np.asarray(maxs, np.float32))

    @classmethod
    def fixed(cls, dim: int, vmin: float = -1.0, vmax: float = 1.0) -> "LimitsNormalizer":
        # ref FixedLimitsNormalizer :187-195
        return cls(np.full((dim,), vmin, np.float32), np.full((dim,), vmax, np.float32))

    def normalize(self, x):
        x = (x - self.mins) / (self.maxs - self.mins)
        return 2.0 * x - 1.0

    def unnormalize(self, x, eps: float = 1e-4):
        # ref :152-160: the WHOLE array is clipped only when any element
        # falls outside [-1-eps, 1+eps]; borderline values within the
        # tolerance pass through unclipped
        needs_clip = (jnp.max(x) > 1.0 + eps) | (jnp.min(x) < -1.0 - eps)
        x = jnp.where(needs_clip, jnp.clip(x, -1.0, 1.0), x)
        x = (x + 1.0) / 2.0
        return x * (self.maxs - self.mins) + self.mins


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianNormalizer:
    """Zero-mean unit-variance (ref :119-141)."""
    means: jax.Array
    stds: jax.Array

    @classmethod
    def fit(cls, x) -> "GaussianNormalizer":
        x = flatten_field(np.asarray(x))
        return cls(np.asarray(x.mean(axis=0), np.float32),
                   np.asarray(x.std(axis=0, ddof=1), np.float32))

    def normalize(self, x):
        return (x - self.means) / self.stds

    def unnormalize(self, x):
        return x * self.stds + self.means


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IdentityNormalizer:
    @classmethod
    def fit(cls, x) -> "IdentityNormalizer":
        return cls()

    def normalize(self, x):
        return x

    def unnormalize(self, x):
        return x


class SafeLimitsNormalizer:
    """Factory: LimitsNormalizer with constant dimensions widened by +-eps so
    a degenerate column (e.g. an always-zero velocity) cannot divide by zero
    (ref :170-185). Returns a plain (pytree-registered) LimitsNormalizer."""

    @classmethod
    def fit(cls, x, eps: float = 1.0) -> LimitsNormalizer:
        return LimitsNormalizer.fit(x, safe=True, eps=eps)


class FixedLimitsNormalizer:
    """Factory: fixed [-1, 1] limits regardless of the data (ref :187-195)."""

    @classmethod
    def fit(cls, x) -> LimitsNormalizer:
        dim = flatten_field(np.asarray(x)).shape[-1]
        return LimitsNormalizer.fixed(dim)


NORMALIZERS = {
    "LimitsNormalizer": LimitsNormalizer,
    "SafeLimitsNormalizer": SafeLimitsNormalizer,
    "FixedLimitsNormalizer": FixedLimitsNormalizer,
    "GaussianNormalizer": GaussianNormalizer,
    "Identity": IdentityNormalizer,
}


class DatasetNormalizer:
    """Multi-field normalizer registry (ref `normalization.py:12-44`)."""

    def __init__(self, fields: Dict[str, np.ndarray], normalizer: str = "LimitsNormalizer"):
        cls = NORMALIZERS[normalizer] if isinstance(normalizer, str) else normalizer
        self.normalizers = {k: cls.fit(v) for k, v in fields.items()}

    def normalize(self, x, key: str):
        return self.normalizers[key].normalize(x)

    def unnormalize(self, x, key: str):
        return self.normalizers[key].unnormalize(x)

    def __call__(self, x, key: str):
        return self.normalize(x, key)

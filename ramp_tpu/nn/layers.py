"""Temporal U-Net layer zoo (flax.linen, feature-last [B, H, C] layout).

Topological parity with `mpd/models/layers/layers.py`:
TimeEncoder (:233), SinusoidalPosEmb (:247), Conv1dBlock (:280, conv ->
GroupNorm -> Mish), ResidualTemporalBlock (:327, time-embedding add),
Downsample1d (:262, conv k3 s2 p1), Upsample1d (:271, conv-transpose k4 s2
p1), LinearAttention (:205), group_norm_n_groups (:429).

TPU notes: feature-last keeps channels on the 128-lane axis; 1-D convs lower
onto the MXU via lax.conv_general_dilated; all matmuls carry
preferred_element_type=float32 so bf16 inputs accumulate in f32.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def group_norm_n_groups(n_channels: int, target_n_groups: int = 8) -> int:
    # ref layers.py:429-435
    if n_channels < target_n_groups:
        return 1
    for n_groups in range(target_n_groups, target_n_groups + 10):
        if n_channels % n_groups == 0:
            return n_groups
    return 1


class SinusoidalPosEmb(nn.Module):
    """ref layers.py:247-259."""
    dim: int

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        emb = math.log(10000.0) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimeEncoder(nn.Module):
    """Sinusoidal PE -> Dense(4*dim) -> Mish -> Dense(dim_out). ref :233-244."""
    dim: int = 32
    dim_out: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = SinusoidalPosEmb(self.dim)(t).astype(self.dtype)
        x = nn.Dense(self.dim * 4, dtype=self.dtype)(x)
        x = mish(x)
        return nn.Dense(self.dim_out, dtype=self.dtype)(x)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish. ref layers.py:280-297."""
    out_channels: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(self.out_channels, kernel_size=(self.kernel_size,),
                    padding=((pad, pad),), dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=group_norm_n_groups(self.out_channels),
                         epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32))
        return mish(x).astype(self.dtype)


class ResidualTemporalBlock(nn.Module):
    """Two conv blocks with a time-embedding channel bias and a 1x1 residual.

    ref layers.py:327-361 (Conv1dBlock x2; cond path SiLU -> Dense added per
    channel; residual 1x1 conv when channel counts differ).
    """
    out_channels: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        h = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype)(x)
        cond = nn.Dense(self.out_channels, dtype=self.dtype)(nn.silu(t_emb))
        h = h + cond[:, None, :]
        h = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, kernel_size=(1,), dtype=self.dtype)(x)
        else:
            res = x
        return h + res


class Downsample1d(nn.Module):
    """Strided conv k3 s2 p1 (halves the horizon). ref layers.py:262-268."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, kernel_size=(3,), strides=(2,),
                       padding=((1, 1),), dtype=self.dtype)(x)


class Upsample1d(nn.Module):
    """Transposed conv k4 s2 p1 (doubles the horizon). ref layers.py:271-277.

    torch ConvTranspose1d(k=4, s=2, p=1) corresponds to flax ConvTranspose
    with explicit padding ((2, 2),) (flax counts padding on the dilated
    input; torch's p crops the output) — verified value-exact against torch
    in tests/test_nn.py.
    """
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.dim, kernel_size=(4,), strides=(2,),
                                padding=((2, 2),), transpose_kernel=True,
                                dtype=self.dtype)(x)


class LinearAttention(nn.Module):
    """Efficient linear attention over the horizon axis. ref layers.py:205-224.

    Present for completeness: the reference instantiates it only when
    self_attention=True, which the shipped configs never enable.
    """
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h_len, _ = x.shape
        hidden = self.dim_head * self.heads
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, h_len, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = map(split_heads, (q, k, v))  # [b, heads, dim_head, n]
        q = q * (self.dim_head ** -0.5)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1).astype(self.dtype)
        context = jnp.einsum("bhdn,bhen->bhde", k, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.einsum("bhde,bhdn->bhen", context, q,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(b, h_len, hidden)
        return nn.Dense(self.dim, dtype=self.dtype)(out)

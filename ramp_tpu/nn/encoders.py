"""Obstacle point-cloud scene encoders.

2D: topological parity with `mpd/models/diffusion_models/obstacle_encoder.py`:
per-point MLP embedding + obstacle-center & relative sinusoidal positional
encodings (:52-92), three parallel stacks of 3 SetTransformer blocks over the
O*P token set with mean-pool Dense heads, concatenated to a 64+96+160=320-d
scene latent (:94-152).

3D: parity with `obstacle_encoder3d.py`: PointNet-style per-obstacle encoder
(1x1 convs + norm + SELU + max-pool, :5-20), 2 pre-norm SetTransformer blocks
over obstacles (:22-53), output projection, max-pool, global MLP -> 256-d
scene embedding (:55-94). Divergence (documented): the reference uses
BatchNorm1d inside PointProcessor; we use LayerNorm — batch-statistics layers
carry mutable cross-batch state that breaks pure SPMD training on TPU, and
the model is trained from scratch here (the reference repo vendors no
checkpoints), so no weight-porting constraint applies.

Scene latents are computed ONCE per planning episode and reused across every
denoise step (the reference caches them per batch size,
`UnetInference.py:146-156`; here they're simply an argument to the jitted
sampler, hoisted out of the scan).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def obstacle_positional_encoding(x: jax.Array, d_model: int):
    """Sinusoidal PEs for obstacle centers and intra-obstacle relative points.

    ref obstacle_encoder.py:52-92. x: [B, O, P, 2].
    Returns (pe_obstacles [B, O, d], pe_relative [B, O, P, d]).
    """
    b, o, p, _ = x.shape
    half = d_model // 2
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / d_model))  # [half]

    centers = x.mean(axis=2)  # [B, O, 2]

    def pe_of(coords):  # coords [..., 2] -> [..., d_model]
        sin_part = jnp.sin(coords[..., 0, None] * div_term) + jnp.sin(coords[..., 1, None] * div_term)
        cos_part = jnp.cos(coords[..., 0, None] * div_term) + jnp.cos(coords[..., 1, None] * div_term)
        # interleave: even idx <- sin, odd idx <- cos (ref :73-76)
        return jnp.stack([sin_part, cos_part], axis=-1).reshape(*coords.shape[:-1], d_model)

    pe_obstacles = pe_of(centers)

    rel = x - centers[:, :, None, :]
    max_dist = jnp.max(jnp.abs(rel).reshape(b, o, -1), axis=-1, keepdims=True)  # [B,O,1]
    rel_norm = rel / (max_dist[..., None] + 1e-8)
    pe_relative = pe_of(rel_norm)
    return pe_obstacles, pe_relative


class MultiheadSelfAttention(nn.Module):
    """Biasless fused-qkv MHA (ref obstacle_encoder.py:6-30)."""
    dim: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class SetTransformerBlock2D(nn.Module):
    """Pre-norm-residual block (ref obstacle_encoder.py:32-50)."""
    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        x = x + MultiheadSelfAttention(self.dim, self.num_heads, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class ObstacleEncoderSet2D(nn.Module):
    """2-D point-cloud set encoder -> 320-d scene latent tokens.

    Output shape [B, 1, 320] (a single scene token; the reference passes the
    320-d vector which cross-attention unsqueezes to one token,
    layers_attention_mini.py:106-107).
    """
    input_dim: int = 2
    hidden_dim: int = 64
    output_dims: Sequence[int] = (64, 96, 160)
    num_blocks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, o, p, _ = x.shape
        pe_obstacles, pe_relative = obstacle_positional_encoding(
            x.astype(jnp.float32), self.hidden_dim)

        pt = nn.Dense(self.hidden_dim, dtype=self.dtype)(x.astype(self.dtype))
        pt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(pt.astype(jnp.float32)).astype(self.dtype)
        pt = nn.gelu(pt, approximate=False)  # [B, O, P, hid]

        combined = jnp.concatenate([
            pt,
            jnp.broadcast_to(pe_obstacles[:, :, None, :], (b, o, p, self.hidden_dim)).astype(self.dtype),
            pe_relative.astype(self.dtype),
        ], axis=-1)
        combined = nn.Dense(self.hidden_dim, dtype=self.dtype)(combined)
        combined = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(combined.astype(jnp.float32)).astype(self.dtype)
        combined = nn.gelu(combined, approximate=False)
        tokens = combined.reshape(b, o * p, self.hidden_dim)

        outputs = []
        for dim in self.output_dims:
            h = tokens
            for i in range(self.num_blocks):
                h = SetTransformerBlock2D(self.hidden_dim, dtype=self.dtype,
                                          name=f"stack{dim}_block{i}")(h)
            pooled = h.mean(axis=1)
            pooled = nn.Dense(dim, dtype=self.dtype, name=f"pool{dim}_0")(pooled)
            pooled = nn.gelu(pooled, approximate=False)
            pooled = nn.Dense(dim, dtype=self.dtype, name=f"pool{dim}_1")(pooled)
            outputs.append(pooled)
        latent = jnp.concatenate(outputs, axis=-1)  # [B, 320]
        return latent[:, None, :]


class PointProcessor3D(nn.Module):
    """Per-point MLP + max-pool (PointNet). ref obstacle_encoder3d.py:5-20."""
    output_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N, P, 3]
        h = nn.Dense(64, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.selu(h)
        h = nn.Dense(self.output_dim, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.selu(h)
        return h.max(axis=-2)  # [N, output_dim]


class SetTransformerBlock3D(nn.Module):
    """Pre-norm block with SELU FFN. ref obstacle_encoder3d.py:22-53."""
    dim: int = 256
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, deterministic=True)(h, h)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.dim * 2, dtype=self.dtype)(h)
        h = nn.selu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class ObstacleEncoder3D(nn.Module):
    """3-D scene encoder -> 256-d embedding. ref obstacle_encoder3d.py:55-94."""
    embedding_dim: int = 256
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obstacle_points):  # [B, O, P, 3]
        b, o, p, d = obstacle_points.shape
        x = obstacle_points.reshape(b * o, p, d).astype(self.dtype)
        x = PointProcessor3D(self.embedding_dim, dtype=self.dtype)(x)
        x = x.reshape(b, o, self.embedding_dim)
        for i in range(self.num_layers):
            x = SetTransformerBlock3D(self.embedding_dim, dtype=self.dtype,
                                      name=f"block_{i}")(x)
        feats = nn.Dense(self.embedding_dim, dtype=self.dtype, name="output_proj")(x)
        scene = feats.max(axis=1)
        scene = nn.Dense(self.embedding_dim, dtype=self.dtype)(scene)
        scene = nn.selu(scene)
        scene = nn.Dense(self.embedding_dim, dtype=self.dtype)(scene)
        return scene[:, None, :]  # [B, 1, 256]

"""Cross-attention conditioning blocks (stable-diffusion style).

Topological parity with `mpd/models/layers/layers_attention_mini.py`:
GEGLU (:38), FeedForward (:48, glu=True), CrossAttention (:83, heads=4,
dim_head=64, biasless qkv), BasicTransformerBlock (:130, self-attn ->
cross-attn on scene latents -> GEGLU FF), SpatialTransformer (:152,
GroupNorm(eps 1e-6) -> 1x1 proj_in -> depth blocks -> zero-init 1x1 proj_out
-> residual).

Layout is feature-last [B, H, C]; 1x1 convs are Dense on the channel axis.
Attention softmax runs in f32 regardless of compute dtype.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ramp_tpu.nn.layers import group_norm_n_groups


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = GEGLU(inner, dtype=self.dtype)(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class _ProjKernel(nn.Module):
    """Declares a bias-less Dense kernel WITHOUT forcing a standalone matmul.

    Param path/name/init match `nn.Dense(use_bias=False, name=...)` exactly
    (`<name>/kernel`, lecun-normal), so checkpoints trained with any
    attn_impl load into any other — the fused lowering below concatenates
    these kernels at trace time instead of dispatching three projections.
    """
    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features))


class CrossAttention(nn.Module):
    """Multi-head cross attention; self-attention when context is None.

    `attn_impl` selects the lowering of the same math (identical params):
      * "default": split-heads via transpose to [B,h,N,d] then batched matmuls
        (the torch-parity formulation).
      * "bnhd":    heads stay in place — einsum over [B,N,h,d] with (batch,
        head) as dot batch dims, letting XLA fold the head split into the
        matmul instead of materializing layout copies (the profiler shows
        ~12% of replan time in [B,4,64,64] relayout copies on TPU).
      * "fused":   bnhd einsums + a single QKV projection — the three
        [C,inner] kernels concatenate at trace time into one [C,3*inner]
        matmul (3x wider MXU feed, 2 fewer dispatches per attention call).
        Weight-compatible with the other impls (see _ProjKernel).

    An A/B on the real chip (logs/attn_ab.json) measured 19.48 ms (bnhd) vs
    19.52 ms (default) per 64-traj replan — XLA already hides the relayouts,
    so "default" stays the default. A Pallas flash-attention variant was
    evaluated and rejected: the U-Net's self-attention runs at sequence
    lengths 64/32/16/8, below the TPU flash kernel's 128-lane minimum block,
    so it cannot lower for this model.
    """
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32
    attn_impl: str = "default"

    @nn.compact
    def __call__(self, x, context=None):
        if self.attn_impl not in ("default", "bnhd", "fused"):
            raise ValueError(f"unknown attn_impl {self.attn_impl!r} "
                             "(expected 'default', 'bnhd' or 'fused')")
        inner = self.dim_head * self.heads
        ctx = x if context is None else context
        if ctx.ndim == 2:
            ctx = ctx[:, None, :]
        if self.attn_impl == "fused":
            wq = _ProjKernel(x.shape[-1], inner, name="to_q")()
            wk = _ProjKernel(ctx.shape[-1], inner, name="to_k")()
            wv = _ProjKernel(ctx.shape[-1], inner, name="to_v")()
            if context is None or ctx is x:
                w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
                qkv = jnp.einsum("bnc,cf->bnf", x.astype(self.dtype), w)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = x.astype(self.dtype) @ wq.astype(self.dtype)
                wkv = jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
                k, v = jnp.split(
                    ctx.astype(self.dtype) @ wkv, 2, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(ctx)

        b, n, _ = q.shape
        m = k.shape[1]

        if m == 1:
            # single-token context (the scene latent is one 320/256-d token,
            # ref layers_attention_mini.py:106-107): softmax over one key is
            # identically 1, so attention output == the value token broadcast
            # over every query position. q/k are dead code (DCE'd by XLA;
            # their params still exist and simply receive zero gradient).
            out = jnp.broadcast_to(v, (b, n, inner))
        elif self.attn_impl in ("bnhd", "fused"):
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, m, self.heads, self.dim_head)
            v = v.reshape(b, m, self.heads, self.dim_head)
            sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                             preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            out = out.reshape(b, n, inner)
        else:
            def split(t, length):
                return t.reshape(b, length, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = split(q, n), split(k, m), split(v, m)
            sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                             preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dtype: Any = jnp.float32
    attn_impl: str = "default"

    @nn.compact
    def __call__(self, x, context=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        x = CrossAttention(self.dim, None, self.n_heads, self.d_head, self.dtype,
                           self.attn_impl)(h) + x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        x = CrossAttention(self.dim, self.context_dim, self.n_heads, self.d_head,
                           self.dtype, self.attn_impl)(h, context=context) + x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(self.dtype)
        x = FeedForward(self.dim, dtype=self.dtype)(h) + x
        return x


class SpatialTransformer(nn.Module):
    """Conditioning transformer over the trajectory horizon.

    ref layers_attention_mini.py:152-202. The output projection is
    zero-initialized (ref zero_module :68-74) so the block starts as identity.
    """
    in_channels: int
    n_heads: int = 4
    d_head: int = 64
    depth: int = 2
    context_dim: Optional[int] = None
    dtype: Any = jnp.float32
    attn_impl: str = "default"

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.n_heads * self.d_head
        x_in = x
        h = nn.GroupNorm(num_groups=group_norm_n_groups(self.in_channels),
                         epsilon=1e-6, dtype=jnp.float32)(x.astype(jnp.float32))
        h = h.astype(self.dtype)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(inner, self.n_heads, self.d_head,
                                      self.context_dim, self.dtype,
                                      self.attn_impl,
                                      name=f"block_{i}")(h, context=context)
        h = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
        return h + x_in

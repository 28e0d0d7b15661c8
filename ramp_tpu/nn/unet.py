"""Energy-based temporal 1-D U-Net over trajectories.

Topological parity with `mpd/models/diffusion_models/UnetInference.py:40-224`
and `UnetTrain.py:17-179`: per resolution [ResidualTemporalBlock x2,
SpatialTransformer cross-attn (depth 2) on scene latents, Down/Upsample1d],
mid [res, cross-attn, res], final [Conv1dBlock, 1x1 conv -> state_dim].
UNET_DIM_MULTS {0: (1,2,4), 1: (1,2,4,8)} ref UnetInference.py:13-16.

The module below is the raw score network f(x, t, scene). The energy-based
epsilon eps = grad_x 0.5*||f||^2 (ref EnergyGradFunction, UnetInference.py:
19-37) is taken with `jax.grad` in `ramp_tpu.sampler.energy` — there is no
autograd.Function machinery to port; grad-of-grad in training is native XLA.

Scene-latent CFG masking (zeroing the latent for unconditional branches, ref
UnetInference.py:188-197) happens OUTSIDE this module, on the latents the
caller passes in — that is what makes one compiled forward serve the
cond/uncond/compose folds.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ramp_tpu.nn.layers import (
    Conv1dBlock, Downsample1d, ResidualTemporalBlock, TimeEncoder, Upsample1d,
)
from ramp_tpu.nn.attention import SpatialTransformer

UNET_DIM_MULTS = {
    0: (1, 2, 4),
    1: (1, 2, 4, 8),
}


class TemporalUnet(nn.Module):
    """f(x [B,H,D], t [B], scene_latents [B,S,ctx]) -> [B,H,D]."""
    state_dim: int
    unet_input_dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    time_emb_dim: int = 32
    attention_num_heads: int = 4
    attention_dim_head: int = 64
    depth_attn: int = 2
    context_dim: int = 320
    dtype: Any = jnp.float32
    attn_impl: str = "default"

    @nn.compact
    def __call__(self, x, t, scene_latents):
        dims = [self.state_dim] + [self.unet_input_dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        t_emb = TimeEncoder(32, self.time_emb_dim, dtype=self.dtype)(t)
        x = x.astype(self.dtype)
        scene_latents = scene_latents.astype(self.dtype)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype,
                                      name=f"down{ind}_res0")(x, t_emb)
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype,
                                      name=f"down{ind}_res1")(x, t_emb)
            x = SpatialTransformer(dim_out, self.attention_num_heads,
                                   self.attention_dim_head, depth=self.depth_attn,
                                   context_dim=self.context_dim, dtype=self.dtype,
                                   attn_impl=self.attn_impl,
                                   name=f"down{ind}_attn")(x, context=scene_latents)
            hs.append(x)
            if not is_last:
                x = Downsample1d(dim_out, dtype=self.dtype,
                                 name=f"down{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype, name="mid_res0")(x, t_emb)
        x = SpatialTransformer(mid_dim, self.attention_num_heads,
                               self.attention_dim_head, depth=self.depth_attn,
                               context_dim=self.context_dim, dtype=self.dtype,
                               attn_impl=self.attn_impl,
                               name="mid_attn")(x, context=scene_latents)
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype, name="mid_res1")(x, t_emb)

        for ind, (dim_in, _) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype,
                                      name=f"up{ind}_res0")(x, t_emb)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype,
                                      name=f"up{ind}_res1")(x, t_emb)
            x = SpatialTransformer(dim_in, self.attention_num_heads,
                                   self.attention_dim_head, depth=self.depth_attn,
                                   context_dim=self.context_dim, dtype=self.dtype,
                                   attn_impl=self.attn_impl,
                                   name=f"up{ind}_attn")(x, context=scene_latents)
            x = Upsample1d(dim_in, dtype=self.dtype, name=f"up{ind}_upsample")(x)

        x = Conv1dBlock(self.unet_input_dim, kernel_size=5, dtype=self.dtype,
                        name="final_block")(x)
        x = nn.Dense(self.state_dim, dtype=self.dtype, name="final_proj")(x)
        return x.astype(jnp.float32)

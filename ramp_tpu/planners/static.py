"""Static 2-D planner: the flagship benchmark path.

Behavioral parity with `StaticGaussianDiffusionModel`
(`diffusion_model_static.py:21-463`) + the harness defaults
(`config/base_config.py:75-92`):

  * T=100 exponential schedule, predict_epsilon=True, clip_denoised
  * DDIM with 5 inference steps (8 when compose+APF), eta=0,
    use_clipped_model_output=True
  * CFG w=2 (simple scenes) or 2-branch energy composition w1=w2=2 (hard
    scenes, compose=True) — ref :164-165, :216
  * optional APF refinement of x0-hat from forward step >= 2, 3 passes
    (ref :299-319)
  * endpoint pinning every step; start/goal velocities zero
  * extra no-noise DDPM steps config exists for the DDPM path (simple env
    runs 5, ref base_config.py:88-92)

TPU-native design: ONE jit compilation serves every scene/context — obstacle
point clouds, start and goal are traced arguments, and the scene encoder runs
once per plan (outside the denoise scan). The reference instead re-builds and
re-`torch.compile`s the model per environment (`inference_static.py:42-121`).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import make_schedule
from ramp_tpu.guidance.apf import APFParams
from ramp_tpu.nn.encoders import ObstacleEncoderSet2D
from ramp_tpu.nn.unet import TemporalUnet, UNET_DIM_MULTS
from ramp_tpu.sampler.ddim import ddim_sample_chain
from ramp_tpu.sampler.ddpm import ddpm_sample_chain
from ramp_tpu.sampler.energy import make_eps_fn
from ramp_tpu.sampler.guidance_fold import (GuidanceFold, cfg_fold,
                                             compose_fold, guide_weights)


@dataclasses.dataclass(frozen=True)
class StaticPlannerConfig:
    horizon: int = 64
    state_dim: int = 4
    n_diffusion_steps: int = 100
    variance_schedule: str = "exponential"
    predict_epsilon: bool = True
    unet_input_dim: int = 32
    unet_dim_mults_option: int = 1
    energy_mode: bool = True
    use_ddim: bool = True
    compose: bool = False
    use_apf: bool = False
    cfg_weight: float = 2.0                # ref diffusion_model_static.py:164
    compose_weights: Tuple[float, float] = (2.0, 2.0)  # ref :208
    n_diffusion_steps_without_noise: int = 0
    noise_std_extra: float = 0.5           # ref inference_static.py:143 (DDPM path)
    apf: APFParams = APFParams()           # thr=0.07, strength=0.1, window=7, 3 iters
    dtype: str = "bfloat16"
    attn_impl: str = "default"             # self-attn lowering: default or bnhd
    eps_remat: bool = False                # jax.checkpoint the energy grad
                                           # (FLOPs-for-HBM trade; see
                                           # sampler/energy.py make_eps_fn)
    # Beyond-parity tuning knob: None keeps the reference step counts.
    ddim_steps_override: Optional[int] = None

    @property
    def ddim_steps(self) -> int:
        # ref diffusion_model_static.py:40
        if self.ddim_steps_override is not None:
            return self.ddim_steps_override
        return 8 if (self.compose and self.use_apf) else 5


class StaticPlanner:
    """Owns the U-Net + encoder modules and the jitted plan function."""

    def __init__(self, config: StaticPlannerConfig = StaticPlannerConfig()):
        self.config = config
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.unet = TemporalUnet(
            state_dim=config.state_dim,
            unet_input_dim=config.unet_input_dim,
            dim_mults=UNET_DIM_MULTS[config.unet_dim_mults_option],
            context_dim=320,
            dtype=dtype,
            attn_impl=config.attn_impl,
        )
        self.encoder = ObstacleEncoderSet2D(dtype=dtype)
        self.schedule = make_schedule(config.variance_schedule, config.n_diffusion_steps)
        self._eps_fn = make_eps_fn(self.unet.apply, config.energy_mode,
                                   remat=config.eps_remat)
        self._plan_jit = {}

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array, n_obstacles: int = 6, n_points: int = 64):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.config.horizon, self.config.state_dim))
        t = jnp.zeros((1,), jnp.int32)
        lat = jnp.zeros((1, 1, 320))
        pts = jnp.zeros((1, n_obstacles, n_points, 2))
        return {
            "unet": self.unet.init(k1, x, t, lat),
            "encoder": self.encoder.init(k2, pts),
        }

    # ------------------------------------------------------------------ plan
    def _build_fold(self, params, obstacle_pts: jax.Array,
                    guide_w: jax.Array) -> GuidanceFold:
        """guide_w is a traced argument (scalar CFG weight, or [2] compose
        weights) rather than a baked constant: one compilation — and one
        persistent-cache entry — serves every guidance weight, so weight
        sweeps don't recompile."""
        cfg = self.config
        if cfg.compose:
            # obstacle_pts: [2, O, P, 2] — two obstacle sets
            latents = self.encoder.apply(params["encoder"], obstacle_pts)  # [2,1,320]
            return compose_fold(latents[0], latents[1], guide_w[0], guide_w[1])
        latents = self.encoder.apply(params["encoder"], obstacle_pts[None])  # [1,1,320]
        return cfg_fold(latents[0], guide_w)

    def _guide_w(self):
        return guide_weights(self.config)

    def _plan(self, params, key, obstacle_pts, start, goal, guide_w,
              n_samples: int, return_chain: bool):
        cfg = self.config
        fold = self._build_fold(params, obstacle_pts, guide_w)
        endpoints = dfn.Endpoints(start=start, goal=goal)
        shape = (n_samples, cfg.horizon, cfg.state_dim)
        apf_points = None
        if cfg.use_apf:
            # flatten obstacle clouds for APF; compose concatenates the first
            # set with the first 4 obstacles of the second
            # (ref diffusion_model_static.py:307-313)
            if cfg.compose:
                apf_points = jnp.concatenate(
                    [obstacle_pts[0], obstacle_pts[1][:4]], axis=0).reshape(-1, 2)
            else:
                apf_points = obstacle_pts.reshape(-1, 2)
        if cfg.use_ddim:
            x, chain = ddim_sample_chain(
                self.schedule, self._eps_fn, params["unet"], key, shape,
                endpoints, fold, cfg.ddim_steps,
                predict_epsilon=cfg.predict_epsilon,
                apf=cfg.apf if cfg.use_apf else None,
                apf_points=apf_points,
                return_chain=return_chain)
        else:
            # the reference's ancestral compose branch has NO avoidance hook:
            # p_mean_variance_compose returns the bare posterior (ref
            # diffusion_model_static.py:188-229); only the non-compose
            # p_mean_variance carries the APF block
            ddpm_apf = cfg.apf._replace(apply_from_step=20, window=5) \
                if (cfg.use_apf and not cfg.compose) else None
            x, chain = ddpm_sample_chain(
                self.schedule, self._eps_fn, params["unet"], key, shape,
                endpoints, fold,
                n_diffusion_steps_without_noise=cfg.n_diffusion_steps_without_noise,
                noise_std_fn=lambda t: cfg.noise_std_extra,
                predict_epsilon=cfg.predict_epsilon,
                apf=ddpm_apf, apf_points=apf_points,
                return_chain=return_chain)
        return x, chain

    def plan_fn(self, n_samples: int, return_chain: bool = True):
        """Return the jitted plan callable for a given batch size.

        The guidance weight is injected here as a traced argument, so the
        returned callable keeps the (params, key, pts, start, goal)
        signature while planners configured with different weights share
        one compilation (via the persistent compile cache)."""
        key_sig = (n_samples, return_chain)
        if key_sig not in self._plan_jit:
            self._plan_jit[key_sig] = jax.jit(
                partial(self._plan, n_samples=n_samples, return_chain=return_chain))
        jitted = self._plan_jit[key_sig]
        w = self._guide_w()
        return lambda params, key, pts, start, goal: jitted(
            params, key, pts, start, goal, w)

    def plan(self, params, key, obstacle_pts, start, goal, n_samples: int = 20,
             return_chain: bool = True):
        """Sample trajectories. start/goal: [state_dim] (velocities zeroed by
        the caller, ref core/utils.py:6-26). Returns (x, chain)."""
        return self.plan_fn(n_samples, return_chain)(
            params, key, obstacle_pts, start, goal)

    def warmup(self, params, n_obstacles: int, n_points: int,
               n_samples: int = 20, return_chain: bool = True) -> None:
        """Compile + execute one plan on dummy inputs (ref
        diffusion_model_static.py:405-435, called before timing at
        inference_static.py:114-121). One compilation serves every
        scene/context afterwards."""
        dim = 2
        shape = (2, n_obstacles, n_points, dim) if self.config.compose \
            else (n_obstacles, n_points, dim)
        pts = jnp.zeros(shape, jnp.float32)
        zero = jnp.zeros((self.config.state_dim,), jnp.float32)
        x, _ = self.plan_fn(n_samples, return_chain)(
            params, jax.random.PRNGKey(0), pts, zero, zero)
        jax.block_until_ready(x)

    def plan_fn_sharded(self, n_samples: int, mesh, return_chain: bool = False):
        """Jitted plan with the trajectory population sharded over the mesh's
        `data` axis — the inference-time scaling axis (SURVEY.md §2.3): params
        and scene replicate, the n_samples batch splits across chips, and XLA
        partitions the whole denoise scan (U-Net, APF, CFG fold) with
        collectives over ICI. n_samples must divide by the mesh size.
        """
        from ramp_tpu.parallel.mesh import batch_sharding, replicate

        if n_samples % mesh.devices.size != 0:
            raise ValueError(f"n_samples={n_samples} must divide the mesh "
                             f"size {mesh.devices.size}")
        rep = replicate(mesh)
        out = batch_sharding(mesh)
        # chain has the step axis first: shard its sample axis (dim 1)
        from jax.sharding import NamedSharding, PartitionSpec as P
        chain_out = NamedSharding(mesh, P(None, "data")) if return_chain else None
        jitted = jax.jit(
            partial(self._plan, n_samples=n_samples, return_chain=return_chain),
            in_shardings=(rep, rep, rep, rep, rep, rep),
            out_shardings=(out, chain_out),
        )
        w = self._guide_w()
        return lambda params, key, pts, start, goal: jitted(
            params, key, pts, start, goal, w)

"""3-D planner: DDPM ancestral sampling with CFG / energy composition.

Behavioral parity with `GaussianDiffusionModel3d`
(`diffusion_model_3d.py:19-390`) + `Config3d` (`config/base_config.py:93-103`):
T=25 exponential schedule, DDPM ancestral (ddim=False default), CFG w=5.75
(ref :150-152) or single-compose w1=w2=5 (ref :163-182), n_samples=1,
horizon 64, state_dim 6 (xyz + vel).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import make_schedule
from ramp_tpu.nn.encoders import ObstacleEncoder3D
from ramp_tpu.nn.unet import TemporalUnet, UNET_DIM_MULTS
from ramp_tpu.sampler.ddim import ddim_sample_chain_3d
from ramp_tpu.sampler.ddpm import ddpm_sample_chain
from ramp_tpu.sampler.energy import make_eps_fn
from ramp_tpu.sampler.guidance_fold import (cfg_fold, compose_fold,
                                             guide_weights)


@dataclasses.dataclass(frozen=True)
class Planner3DConfig:
    horizon: int = 64
    state_dim: int = 6
    n_diffusion_steps: int = 25
    variance_schedule: str = "exponential"
    predict_epsilon: bool = True
    unet_input_dim: int = 32
    unet_dim_mults_option: int = 1
    energy_mode: bool = True
    compose: bool = False
    cfg_weight: float = 5.75               # ref diffusion_model_3d.py:150
    compose_weights: Tuple[float, float] = (5.0, 5.0)  # ref :169-170
    n_diffusion_steps_without_noise: int = 0
    use_ddim: bool = False                 # ref :296-300 (ddim=False default)
    ddim_clip_x0: bool = True              # repair of the ref's dormant DDIM
                                           # (see ddim_sample_chain_3d); False
                                           # = the broken reference behavior
    resample_steps: int = 1                # ref :199-210 (ships disabled)
    ddim_steps_override: Optional[int] = None  # None = reference T // 5
    # Beyond-parity: APF guidance on the DDPM posterior mean, the 3-D
    # extension of the static 2-D hook (the reference has no 3-D APF; the
    # force math in guidance/apf.py is dimension-generic). Off by default.
    use_apf: bool = False
    apf: "APFParams" = None  # None -> APFParams(backend="xla") at use
    dtype: str = "bfloat16"
    attn_impl: str = "default"             # self-attn lowering: default or bnhd

    @property
    def ddim_steps(self) -> int:
        # ref diffusion_model_3d.py:234: sampling_timesteps = T // 5
        if self.ddim_steps_override is not None:
            return self.ddim_steps_override
        return max(1, self.n_diffusion_steps // 5)


class Planner3D:
    def __init__(self, config: Planner3DConfig = Planner3DConfig()):
        if config.use_apf and config.use_ddim:
            raise ValueError(
                "3-D APF is wired into the DDPM ancestral chain only; "
                "use_ddim=True would silently drop it")
        self.config = config
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.unet = TemporalUnet(
            state_dim=config.state_dim,
            unet_input_dim=config.unet_input_dim,
            dim_mults=UNET_DIM_MULTS[config.unet_dim_mults_option],
            context_dim=256,
            dtype=dtype,
            attn_impl=config.attn_impl,
        )
        self.encoder = ObstacleEncoder3D(dtype=dtype)
        self.schedule = make_schedule(config.variance_schedule, config.n_diffusion_steps)
        self._eps_fn = make_eps_fn(self.unet.apply, config.energy_mode)
        self._plan_jit = {}

    def init_params(self, key: jax.Array, n_obstacles: int = 20, n_points: int = 128):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.config.horizon, self.config.state_dim))
        t = jnp.zeros((1,), jnp.int32)
        lat = jnp.zeros((1, 1, 256))
        pts = jnp.zeros((1, n_obstacles, n_points, 3))
        return {"unet": self.unet.init(k1, x, t, lat),
                "encoder": self.encoder.init(k2, pts)}

    def _guide_w(self):
        return guide_weights(self.config)

    def _plan(self, params, key, obstacle_pts, start, goal, guide_w,
              n_samples: int, return_chain: bool):
        """guide_w is traced (see `StaticPlanner._build_fold`) so CFG-weight
        sweeps reuse one compilation."""
        cfg = self.config
        if cfg.compose:
            latents = self.encoder.apply(params["encoder"], obstacle_pts)
            fold = compose_fold(latents[0], latents[1], guide_w[0], guide_w[1])
        else:
            latents = self.encoder.apply(params["encoder"], obstacle_pts[None])
            fold = cfg_fold(latents[0], guide_w)
        endpoints = dfn.Endpoints(start=start, goal=goal)
        shape = (n_samples, cfg.horizon, cfg.state_dim)
        if cfg.use_ddim:
            # the 3-D model's own DDIM variant (ref :220-287): truncated-
            # linspace grid incl. t=T-1, final pair returns x0. By default
            # x0-hat is clipped and the direction recomputed from it — a
            # repair of the reference's dormant (and numerically broken)
            # unclipped path; see ddim_sample_chain_3d's docstring.
            return ddim_sample_chain_3d(
                self.schedule, self._eps_fn, params["unet"], key, shape,
                endpoints, fold,
                predict_epsilon=cfg.predict_epsilon,
                clip_x0=cfg.ddim_clip_x0,
                n_ddim=cfg.ddim_steps,
                return_chain=return_chain)
        apf, apf_points = None, None
        if cfg.use_apf:
            from ramp_tpu.guidance.apf import APFParams
            # the Pallas kernel is 2-D; the XLA path fuses the 3-D force.
            # apply_from_step=15: force the mean only once trajectories are
            # mostly formed (last ~9 of the 25 ancestral steps)
            apf = cfg.apf or APFParams(backend="xla", apply_from_step=15)
            # compose: the union of both obstacle sets is the force field
            apf_points = obstacle_pts.reshape(-1, 3)
        return ddpm_sample_chain(
            self.schedule, self._eps_fn, params["unet"], key, shape,
            endpoints, fold,
            n_diffusion_steps_without_noise=cfg.n_diffusion_steps_without_noise,
            predict_epsilon=cfg.predict_epsilon,
            resample_steps=cfg.resample_steps,
            apf=apf, apf_points=apf_points,
            return_chain=return_chain)

    def plan_fn(self, n_samples: int, return_chain: bool = True):
        """Jitted plan callable with the (params, key, pts, start, goal)
        signature; the guidance weight is injected as a traced argument (see
        `StaticPlanner.plan_fn`)."""
        sig = (n_samples, return_chain)
        if sig not in self._plan_jit:
            self._plan_jit[sig] = jax.jit(
                partial(self._plan, n_samples=n_samples, return_chain=return_chain))
        jitted = self._plan_jit[sig]
        w = self._guide_w()
        return lambda params, key, pts, start, goal: jitted(
            params, key, pts, start, goal, w)

    def plan(self, params, key, obstacle_pts, start, goal, n_samples: int = 1,
             return_chain: bool = True):
        return self.plan_fn(n_samples, return_chain)(
            params, key, obstacle_pts, start, goal)

    def plan_fn_sharded(self, n_samples: int, mesh, return_chain: bool = False):
        """Trajectory population sharded over the mesh's `data` axis (see
        `StaticPlanner.plan_fn_sharded`)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ramp_tpu.parallel.mesh import batch_sharding, replicate

        if n_samples % mesh.devices.size != 0:
            raise ValueError(f"n_samples={n_samples} must divide the mesh "
                             f"size {mesh.devices.size}")
        rep = replicate(mesh)
        out = batch_sharding(mesh)
        chain_out = NamedSharding(mesh, P(None, "data")) if return_chain else None
        jitted = jax.jit(
            partial(self._plan, n_samples=n_samples, return_chain=return_chain),
            in_shardings=(rep, rep, rep, rep, rep, rep),
            out_shardings=(out, chain_out),
        )
        w = self._guide_w()
        return lambda params, key, pts, start, goal: jitted(
            params, key, pts, start, goal, w)

"""Closed-loop pursuit-evasion replanner (dynamic model), fully jitted.

Behavioral parity with `DynamicGaussianDiffusionModel.ddim_p_sample_loop`
(`diffusion_model_dynamic.py:495-624`) and its helpers:

  STAGE I   (ref :537-549): 10-step DDIM full-horizon plan, batch of
            n_samples, CFG w=2.5 (ref :157-159), best pick at collision
            threshold 0.02 via `cost.py`.
  STAGE II  (ref :552-621): up to 60 control steps; each step re-noises the
            best plan to DDIM timestep ts[-5] = 40 via q_sample (ref
            :556-561), clamps executed history + goal, runs the last 5 DDIM
            steps (40,30,20,10,0), applies segment smoothing sm() (ref
            :192-214) with window 3 before the final step and window 2
            after, applies APF (static boxes + pursuer with goal blend, ref
            :376-435) at the final step, re-selects the best trajectory with
            a partially-observable pursuer gate (dist < 0.4 adds the pursuer
            cloud to the collision set, ref :592-598), replans from scratch
            when no trajectory is collision-free (ref :461-492, 599-608),
            and terminates when within 0.2 of the goal (ref :620-621).
  Pursuer   updates once per control step via the pursuit dynamics (ref
            `core/utils.py:91-136`, `primitives.py:102-107`), pursuing the
            first sample's current waypoint.

TPU-native design: the whole closed loop is ONE `lax.scan` over control
steps inside ONE jit — no host round-trips for KD-trees, pursuit dynamics,
or cost selection. Data-dependent constructs become bounded equivalents:

  * early goal exit        -> a `done` flag freezing the carried state
  * `while best is None:`  -> one `lax.cond` replan pass + a min-collision
                              fallback pick (the reference loops until a
                              collision-free plan appears; with the replan
                              pass this virtually always succeeds in one try)
  * growing executed history -> a fixed [H, D] buffer + row-count mask
  * per-step KD-tree rebuild -> brute-force nearest-point reduction on device
  * replan batch            -> n_samples (reference uses 30 vs 35; equal
                              shapes keep the cond branches congruent)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import make_schedule, ddim_timesteps
from ramp_tpu.guidance.apf import apf_windowed, apf_pursuer
from ramp_tpu.guidance.cost import collision_counts, select_best_trajectory
from ramp_tpu.nn.encoders import ObstacleEncoderSet2D
from ramp_tpu.nn.unet import TemporalUnet, UNET_DIM_MULTS
from ramp_tpu.sampler.energy import make_eps_fn
from ramp_tpu.sampler.guidance_fold import (cfg_fold, guide_weights,
                                             guided_eps)
from ramp_tpu.scenes.dynamics import (PursuitParams, pursuit_step,
                                      pursuit_sweep_vector)
from ramp_tpu.scenes.pointclouds import (generate_sphere_points,
                                         generate_swept_sphere_points)


@dataclasses.dataclass(frozen=True)
class DynamicPlannerConfig:
    horizon: int = 48
    state_dim: int = 4
    n_diffusion_steps: int = 100
    variance_schedule: str = "exponential"
    predict_epsilon: bool = True
    unet_input_dim: int = 32
    unet_dim_mults_option: int = 1
    energy_mode: bool = True
    cfg_weight: float = 2.5                  # ref diffusion_model_dynamic.py:157
    ddim_steps_high: int = 10                # ref :47
    ddim_steps_low: int = 5                  # ref :48
    max_iterations: int = 60                 # ref :526
    safe_threshold: float = 0.2              # ref :528
    collision_threshold_high: float = 0.02   # ref :532
    collision_threshold_low: float = 0.05    # ref :533
    # APF constants (ref :380-387)
    points_per_obstacle: int = 64
    pursuer_radius: float = 0.1              # obs_radius
    apf_threshold_static: float = 0.2
    apf_threshold_pred: float = 0.5          # 0.4 + obs_radius
    apf_strength_static: float = 0.15
    apf_strength_pred: float = 0.15
    apf_window_static: int = 8
    apf_window_pred: int = 5
    pursuer_cost_gate: float = 0.4           # ref :529 distance_threshold_pred
    # Beyond-parity: condition the score model on the pursuer. The live
    # pursuer sphere cloud is appended as one extra obstacle row to the
    # encoder input each control step (STAGE I uses the initial pursuer
    # position), so the model itself routes around the pursuer instead of
    # leaving all evasion to the closed-loop APF. Requires weights trained
    # on [O+1]-row clouds (`generate_dataset_predator`); the reference has
    # no equivalent (its U-Net sees static boxes only).
    pursuer_conditioned: bool = False
    # Predictive sweep (round 3): when > 0, the conditioning row is a cloud
    # swept along the pursuer's predicted K-step path toward the evader
    # (`pursuit_sweep_vector` — closed-form rollout of the pursuit dynamics
    # under a stationary evader) instead of a cloud at its current position,
    # so the score model anticipates motion. Requires weights trained on
    # swept rows (`generate_dataset_predator(sweep_steps=K)`). APF, cost
    # selection and capture still use the TRUE current-position cloud.
    pursuer_sweep_steps: int = 0
    pursuit: PursuitParams = PursuitParams()
    smoothing_dt: float = 0.1                # ref sm() :192
    smoothing_max_vel: float = 0.8
    use_ddim: bool = True                    # False -> DDPM p_sample_loop variant
    # DDPM-variant constants (ref diffusion_model_dynamic.py:216-331 +
    # sample_functionsdynamic.py:190-199). The DDPM loop has its own schedule
    # structure (stage-I break at forward_t=25, 5-step refine, 20-step
    # replan window) and its own APF constants.
    ddpm_predator_start: int = 25            # ref :240 predator_start_time
    ddpm_high_refine: int = 5                # ref :254 replan_high_level
    ddpm_replan_step: int = 20               # ref :276 replan_step
    ddpm_collision_threshold_high: float = 0.05  # ref :265
    ddpm_collision_threshold_low: float = 0.06   # ref :313
    ddpm_max_iterations: int = 50            # ref :280
    ddpm_safe_threshold: float = 0.25        # ref :277
    ddpm_smooth_window_inner: int = 5        # ref :297
    ddpm_apf_threshold_static: float = 0.1   # ref sample_functionsdynamic.py:192
    ddpm_apf_threshold_pred: float = 0.3     # ref :193 (0.2 + obs_radius)
    ddpm_apf_strength_static: float = 0.1    # ref :194
    ddpm_apf_strength_pred: float = 0.15     # ref :195
    ddpm_apf_window_static: int = 10         # ref :196
    ddpm_apf_window_pred: int = 5            # ref :197
    dtype: str = "bfloat16"
    attn_impl: str = "default"             # self-attn lowering: default or bnhd


class ControllerState(NamedTuple):
    """Carry for the per-step controller API (`begin_episode` /
    `controller_step`): the deployment surface, where the pursuer position
    is OBSERVED by perception each control tick instead of simulated by the
    eval harness's pursuit dynamics."""
    x_best: jax.Array    # [H, D] current best plan
    history: jax.Array   # [H, D] executed-history buffer (row 0 = start)
    h_count: jax.Array   # scalar: number of valid history rows
    key: jax.Array       # threaded PRNG key
    step: jax.Array      # scalar: control-step index
    done: jax.Array      # scalar bool: goal reached


class EpisodeResult(NamedTuple):
    """Per-control-step outputs (fixed length max_iterations)."""
    plans: jax.Array          # [K, H, D] selected plan per step
    pursuer_centers: jax.Array  # [K, 2]
    evader_states: jax.Array  # [K, D] chain_start entries (x[stepp])
    valid: jax.Array          # [K] bool — step executed before termination
    n_steps: jax.Array        # scalar int
    high_plan: jax.Array      # [H, D] STAGE I plan


class VehicleEpisodeResult(NamedTuple):
    """Per-tick outputs of the vehicle-in-the-loop engine (fixed length
    max_iterations + finish_ticks)."""
    plans: jax.Array            # [K, H, D] selected plan per tick
    pursuer_centers: jax.Array  # [K, 2]
    car_states: jax.Array       # [K, 4] bicycle [x, y, theta, v] per tick
    substeps: jax.Array         # [K, S, 2] low-level substep positions
    targets: jax.Array          # [K, 2] waypoint the car tracked this tick
    valid: jax.Array            # [K] bool — tick executed before episode end
    n_steps: jax.Array          # scalar int
    high_plan: jax.Array        # [H, D] STAGE I plan
    captured: jax.Array         # scalar bool (device-side capture exit)
    planner_steps: jax.Array    # scalar int — stage-II replans executed


def _smooth_segment(x: jax.Array, stepp: jax.Array, window: int,
                    dt: float, max_vel: float) -> jax.Array:
    """sm() applied at rows [stepp+1, stepp+window]. ref :192-214, :571-577.

    x: [B, H, D]. The reference indexes rows stepp..stepp+window directly
    (relying on early termination to stay in range); dynamic_update_slice's
    index clamping provides the bounded equivalent.
    """
    b, h, d = x.shape
    s1 = jnp.take_along_axis(x, stepp[None, None, None].repeat(b, 0).repeat(d, 2), axis=1)[:, 0]
    idx2 = jnp.clip(stepp + window, 0, h - 1)
    s2 = jnp.take_along_axis(x, idx2[None, None, None].repeat(b, 0).repeat(d, 2), axis=1)[:, 0]
    delta = s2[:, :2] - s1[:, :2]
    total_time = window * dt
    desired_v = delta / total_time
    vmag = jnp.linalg.norm(desired_v, axis=-1, keepdims=True)
    dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    direction = jnp.where(dist > 1e-6, delta / jnp.where(dist > 1e-6, dist, 1.0), 0.0)
    base_v = jnp.where(vmag > max_vel, direction * max_vel, desired_v)
    ts = (jnp.arange(1, window + 1, dtype=jnp.float32) * dt)[None, :, None]
    smooth_pos = s1[:, None, :2] + ts * base_v[:, None, :]
    smooth_vel = jnp.broadcast_to(base_v[:, None, :], (b, window, 2))
    seg = jnp.concatenate([smooth_pos, smooth_vel], axis=-1)
    return jax.lax.dynamic_update_slice(x, seg.astype(x.dtype),
                                        (0, stepp + 1, 0))


class DynamicPlanner:
    def __init__(self, config: DynamicPlannerConfig = DynamicPlannerConfig()):
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
        self._eps_fn = make_eps_fn(self.unet.apply, config.energy_mode)
        self._run_jit = {}

    def init_params(self, key: jax.Array, n_obstacles: int = 6, n_points: int = 64):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.config.horizon, self.config.state_dim))
        t = jnp.zeros((1,), jnp.int32)
        lat = jnp.zeros((1, 1, 320))
        pts = jnp.zeros((1, n_obstacles, n_points, 2))
        return {"unet": self.unet.init(k1, x, t, lat),
                "encoder": self.encoder.init(k2, pts)}

    def _guide_w(self):
        return guide_weights(self.config)

    def _cond_fold(self, params, obstacle_pts, guide_w, pursuer_pts):
        """CFG fold of the conditioning cloud. With pursuer_conditioned the
        pursuer cloud rides along as one extra obstacle row — the same
        [O+1]-row layout the training data carries. The APF pursuer cloud
        has `points_per_obstacle` (ref constant 64) points; the conditioning
        row must match the dataset's per-obstacle count, so wrap-index to
        the scene's P (golden-angle points stay uniform under a prefix)."""
        pts = obstacle_pts
        if self.config.pursuer_conditioned:
            n_pts = obstacle_pts.shape[1]
            row = jnp.take(pursuer_pts,
                           jnp.arange(n_pts) % pursuer_pts.shape[0], axis=0)
            pts = jnp.concatenate([obstacle_pts, row[None]], axis=0)
        latents = self.encoder.apply(params["encoder"], pts[None])
        return cfg_fold(latents[0], guide_w)

    def _cond_cloud(self, key, pursuer, target):
        """Cloud for the conditioning row: swept along the predicted
        pursuit path toward `target` when pursuer_sweep_steps > 0, else the
        plain current-position cloud (bitwise-identical RNG to the
        pre-sweep code path when the feature is off)."""
        cfg = self.config
        r = jnp.asarray(cfg.pursuer_radius)
        if cfg.pursuer_sweep_steps > 0:
            sweep = pursuit_sweep_vector(pursuer, target,
                                         cfg.pursuer_sweep_steps, cfg.pursuit)
            return generate_swept_sphere_points(key, pursuer, sweep, r,
                                                cfg.points_per_obstacle)
        return generate_sphere_points(key, pursuer, r,
                                      cfg.points_per_obstacle)

    # ------------------------------------------------------------- internals
    def _ddim_step(self, params, fold, x, t_scalar, endpoints):
        """One plain DDIM step (no APF). ref ddim_p_sample :338-373."""
        cfg = self.config
        b = x.shape[0]
        t = jnp.full((b,), t_scalar, jnp.int32)
        e = guided_eps(self._eps_fn, params["unet"], x, t, fold)
        x_recon = jnp.clip(
            dfn.predict_start_from_noise(self.schedule, x, t, e, cfg.predict_epsilon),
            -1.0, 1.0)
        step_ratio = cfg.n_diffusion_steps // cfg.ddim_steps_high
        x = dfn.ddim_step(self.schedule, x, x_recon, t, step_ratio)
        return dfn.apply_hard_conditioning(x, endpoints)

    def _ddim_step_apf(self, params, fold, x, t_scalar, endpoints, stepp,
                       static_apf_pts, pursuer_pts, pursuer_center, goal_state):
        """Final inner DDIM step with APF on x0-hat. ref :374-447."""
        cfg = self.config
        b, h, d = x.shape
        t = jnp.full((b,), t_scalar, jnp.int32)
        e = guided_eps(self._eps_fn, params["unet"], x, t, fold)
        x_recon = jnp.clip(
            dfn.predict_start_from_noise(self.schedule, x, t, e, cfg.predict_epsilon),
            -1.0, 1.0)

        # evader positions at the current control-step row (ref :376 x[:, forward_t])
        row = jnp.clip(stepp, 0, h - 1)
        x_start_rows = jax.lax.dynamic_slice(x, (0, row, 0), (b, 1, d))[:, 0, :2]
        dist_to_pursuer = jnp.linalg.norm(x_start_rows - pursuer_center[None], axis=-1)

        def per_traj(traj, dist):
            traj = apf_windowed(traj, static_apf_pts,
                                cfg.apf_threshold_static, cfg.apf_strength_static,
                                cfg.apf_window_static)
            near = dist < cfg.apf_threshold_pred
            traj = jax.lax.cond(
                near,
                lambda tr: apf_pursuer(tr, pursuer_pts, cfg.apf_threshold_pred,
                                       cfg.apf_strength_pred, goal_state,
                                       decay_threshold=cfg.apf_threshold_static),
                lambda tr: tr, traj)
            return traj

        x_recon = jax.vmap(per_traj)(x_recon, dist_to_pursuer)
        x_recon = x_recon.at[:, -1].set(goal_state)  # ref :435
        step_ratio = cfg.n_diffusion_steps // cfg.ddim_steps_high
        x = dfn.ddim_step(self.schedule, x, x_recon, t, step_ratio)
        return dfn.apply_hard_conditioning(x, endpoints)

    def _clamp_history(self, x, history, h_count):
        """Overwrite rows [0, h_count) with the executed history. ref :563-565."""
        rows = jnp.arange(x.shape[1])
        mask = (rows < h_count)[None, :, None]
        return jnp.where(mask, history[None], x)

    def _select(self, x, obstacle_pts_flat, pursuer_pts, pursuer_center, stepp,
                threshold):
        """Cost selection with the partially-observable pursuer gate.

        ref :592-598: if |x[0, stepp] - pursuer| < 0.4, the pursuer cloud is
        appended to the collision set.
        """
        cfg = self.config
        b, h, d = x.shape
        row = jnp.clip(stepp, 0, h - 1)
        evader = jax.lax.dynamic_slice(x, (0, row, 0), (1, 1, d))[0, 0, :2]
        near = jnp.linalg.norm(evader - pursuer_center) < cfg.pursuer_cost_gate
        # mask the pursuer cloud far away instead of changing shapes
        far_pts = jnp.full_like(pursuer_pts, 1e6)
        extra = jnp.where(near, pursuer_pts, far_pts)
        pts = jnp.concatenate([obstacle_pts_flat, extra], axis=0)
        return select_best_trajectory(x, pts, collision_threshold=threshold)

    def _refine(self, params, fold, x_plan, history, h_count, stepp, key,
                endpoints, static_apf_pts, pursuer_pts, pursuer_center,
                goal_state):
        """One STAGE-II refinement: re-noise + last-5 DDIM steps. ref :554-587."""
        cfg = self.config
        b = fold.branch_latents.shape[0]  # unused; batch from caller
        n = x_plan.shape[0]
        ts_high = ddim_timesteps(cfg.n_diffusion_steps, cfg.ddim_steps_high)
        ts_low = ts_high[-cfg.ddim_steps_low:]
        noise_t = int(ts_low[0])

        k_noise, key = jax.random.split(key)
        noise = jax.random.normal(k_noise, x_plan.shape, jnp.float32)
        t_noise = jnp.full((n,), noise_t, jnp.int32)
        x = dfn.q_sample(self.schedule, x_plan, t_noise, noise)
        x = x.at[:, 0, 2:].set(0.0)
        x = self._clamp_history(x, history, h_count)
        x = x.at[:, -1].set(goal_state)

        for i, t_scalar in enumerate(ts_low):
            is_last = i == len(ts_low) - 1
            if is_last:
                # smoothing window 3 before the final (APF) step, ref :571-577
                x = _smooth_segment(x, stepp, 3, cfg.smoothing_dt, cfg.smoothing_max_vel)
                x = self._ddim_step_apf(params, fold, x, int(t_scalar), endpoints,
                                        stepp, static_apf_pts, pursuer_pts,
                                        pursuer_center, goal_state)
            else:
                x = self._ddim_step(params, fold, x, int(t_scalar), endpoints)
            x = self._clamp_history(x, history, h_count)
            x = x.at[:, -1].set(goal_state)
            x = x.at[:, 0, 2:].set(0.0)
        return x

    def _replan_scratch(self, params, fold, shape, history, h_count, stepp, key,
                        endpoints, static_apf_pts, pursuer_pts, pursuer_center,
                        goal_state):
        """10-step DDIM from fresh noise with history clamping. ref :461-492."""
        cfg = self.config
        ts_high = ddim_timesteps(cfg.n_diffusion_steps, cfg.ddim_steps_high)
        x = jax.random.normal(key, shape, jnp.float32)
        x = dfn.apply_hard_conditioning(x, endpoints)
        x = self._clamp_history(x, history, h_count)
        for i, t_scalar in enumerate(ts_high):
            if i == len(ts_high) - 1:  # use_apf at t == 0, ref :480-481
                x = self._ddim_step_apf(params, fold, x, int(t_scalar), endpoints,
                                        stepp, static_apf_pts, pursuer_pts,
                                        pursuer_center, goal_state)
            else:
                x = self._ddim_step(params, fold, x, int(t_scalar), endpoints)
            x = dfn.apply_hard_conditioning(x, endpoints)
            x = self._clamp_history(x, history, h_count)
        return x

    # -------------------------------------------------- DDPM-variant kernels
    def _ddpm_step(self, params, fold, x, t_scalar, k_noise, endpoints,
                   apf_args=None):
        """One dynamic-path DDPM posterior step with the (t/T)^2 extra noise
        schedule (ref sample_functionsdynamic.py:163-290). `apf_args`
        (static_apf_pts, pursuer_pts, pursuer_center, goal_state) enables the
        replan_guide APF sandwich: static avoidance on every trajectory, plus
        pursuer avoidance bracketed by static passes when the pursuer is near
        (ref :222-265)."""
        cfg = self.config
        b, h, d = x.shape
        t = jnp.full((b,), jnp.maximum(t_scalar, 0), jnp.int32)
        e = guided_eps(self._eps_fn, params["unet"], x, t, fold)
        x_recon = jnp.clip(
            dfn.predict_start_from_noise(self.schedule, x, t, e, cfg.predict_epsilon),
            -1.0, 1.0)
        mean, _, log_var = dfn.q_posterior(self.schedule, x_recon, x, t)
        x = mean
        if apf_args is not None:
            static_apf_pts, pursuer_pts, pursuer_center, goal_state = apf_args
            dist = jnp.linalg.norm(x[:, 0, :2] - pursuer_center[None], axis=-1)

            def per_traj(traj, dd):
                traj = apf_windowed(traj, static_apf_pts,
                                    cfg.ddpm_apf_threshold_static,
                                    cfg.ddpm_apf_strength_static,
                                    cfg.ddpm_apf_window_static)

                def near_fn(tr):
                    # the inline DDPM-path variant decays with the static
                    # threshold AND blends zero goal direction (1*avoid +
                    # 0*goal, ref sample_functionsdynamic.py:148-158)
                    tr = apf_pursuer(tr, pursuer_pts,
                                     cfg.ddpm_apf_threshold_pred,
                                     cfg.ddpm_apf_strength_pred, goal_state,
                                     goal_blend=0.0,
                                     decay_threshold=cfg.ddpm_apf_threshold_static)
                    return apf_windowed(tr, static_apf_pts,
                                        cfg.ddpm_apf_threshold_static,
                                        cfg.ddpm_apf_strength_static,
                                        cfg.ddpm_apf_window_static)

                return jax.lax.cond(dd < cfg.ddpm_apf_threshold_pred,
                                    near_fn, lambda tr: tr, traj)

            x = jax.vmap(per_traj)(x, dist)
            x = x.at[:, -1].set(goal_state)  # ref :267
        std = jnp.exp(0.5 * log_var)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        noise = jnp.where((t == 0)[:, None, None], 0.0, noise)
        noise_std = (jnp.maximum(t_scalar, 0) / cfg.n_diffusion_steps) ** 2  # ref :272
        x = x + std * noise * noise_std
        return dfn.apply_hard_conditioning(x, endpoints)

    def _run_ddpm(self, params, key, obstacle_pts, static_apf_pts, start, goal,
                  pursuer_init, guide_w, n_samples: int):
        """DDPM p_sample_loop closed loop (ref diffusion_model_dynamic.py:
        216-331): STAGE I runs the ancestral chain only down to
        forward_t == predator_start (26 steps), re-noises to t=high_refine and
        refines; STAGE II re-noises the best plan to t=replan_step each
        control step and runs the full DDPM window with APF + smoothing at
        the final inner step."""
        cfg = self.config
        h, d = cfg.horizon, cfg.state_dim
        if cfg.pursuer_conditioned:
            key, k_p0 = jax.random.split(key)
            p_pts0 = self._cond_cloud(k_p0, pursuer_init, start[:2])
            fold = self._cond_fold(params, obstacle_pts, guide_w, p_pts0)
        else:
            latents = self.encoder.apply(params["encoder"], obstacle_pts[None])
            fold = cfg_fold(latents[0], guide_w)
        endpoints = dfn.Endpoints(start=start, goal=goal)
        goal_state = goal
        obstacle_pts_flat = obstacle_pts.reshape(-1, 2)
        T = cfg.n_diffusion_steps

        # ---------------- STAGE I (ref :242-263)
        key, k_init = jax.random.split(key)
        x = jax.random.normal(k_init, (n_samples, h, d), jnp.float32)
        x = dfn.apply_hard_conditioning(x, endpoints)
        # forward_t = 0 .. predator_start  <=>  t = T-1 .. T-1-predator_start
        for t_scalar in range(T - 1, T - cfg.ddpm_predator_start - 2, -1):
            key, k_n = jax.random.split(key)
            x = self._ddpm_step(params, fold, x, t_scalar, k_n, endpoints)
        # re-noise to high_refine and run the last steps (ref :255-263)
        key, k_q = jax.random.split(key)
        t_hr = jnp.full((n_samples,), cfg.ddpm_high_refine, jnp.int32)
        x = dfn.q_sample(self.schedule, x, t_hr,
                         jax.random.normal(k_q, x.shape, jnp.float32))
        x = dfn.apply_hard_conditioning(x, endpoints)
        for t_scalar in range(cfg.ddpm_high_refine - 1, -1, -1):
            key, k_n = jax.random.split(key)
            x = self._ddpm_step(params, fold, x, t_scalar, k_n, endpoints)

        sel = select_best_trajectory(x, obstacle_pts,
                                     cfg.ddpm_collision_threshold_high)
        fallback = jnp.argmin(collision_counts(x, obstacle_pts_flat,
                                               cfg.ddpm_collision_threshold_high))
        best = jnp.where(sel.any_free, sel.best_index, fallback)
        high_plan = x[best]

        history0 = jnp.zeros((h, d)).at[0].set(high_plan[0])

        class Carry(NamedTuple):
            x_best: jax.Array
            history: jax.Array
            h_count: jax.Array
            pursuer: jax.Array
            key: jax.Array
            done: jax.Array

        carry0 = Carry(high_plan, history0, jnp.asarray(1), pursuer_init,
                       key, jnp.asarray(False))

        def control_step(carry: Carry, k_idx):
            stepp = k_idx
            key = carry.key
            key, k_pts, k_q2 = jax.random.split(key, 3)

            row = jnp.clip(stepp, 0, h - 1)
            evader_now = jax.lax.dynamic_slice(carry.x_best, (row, 0), (1, d))[0, :2]
            pursuer = pursuit_step(k_idx, carry.pursuer, evader_now, cfg.pursuit)
            pursuer_pts = generate_sphere_points(
                k_pts, pursuer, jnp.asarray(cfg.pursuer_radius),
                cfg.points_per_obstacle)
            if cfg.pursuer_conditioned and cfg.pursuer_sweep_steps > 0:
                key, k_sw = jax.random.split(key)
                fold_t = self._cond_fold(
                    params, obstacle_pts, guide_w,
                    self._cond_cloud(k_sw, pursuer, evader_now))
            elif cfg.pursuer_conditioned:
                fold_t = self._cond_fold(params, obstacle_pts, guide_w,
                                         pursuer_pts)
            else:
                fold_t = fold

            # re-noise the selected plan to replan_step (ref :283-285)
            x = jnp.broadcast_to(carry.x_best[None], (n_samples, h, d))
            t_rs = jnp.full((n_samples,), cfg.ddpm_replan_step, jnp.int32)
            x = dfn.q_sample(self.schedule, x, t_rs,
                             jax.random.normal(k_q2, x.shape, jnp.float32))
            x = x.at[:, 0, 2:].set(0.0)
            x = self._clamp_history(x, carry.history, carry.h_count)
            x = x.at[:, -1].set(goal_state)

            for j in range(cfg.ddpm_replan_step - 1, -1, -1):
                key, k_n = jax.random.split(key)
                if j == 0:
                    x = _smooth_segment(x, stepp, cfg.ddpm_smooth_window_inner,
                                        cfg.smoothing_dt, cfg.smoothing_max_vel)
                    x = self._ddpm_step(params, fold_t, x, j, k_n, endpoints,
                                        apf_args=(static_apf_pts, pursuer_pts,
                                                  pursuer, goal_state))
                else:
                    x = self._ddpm_step(params, fold_t, x, j, k_n, endpoints)
                x = self._clamp_history(x, carry.history, carry.h_count)
                x = x.at[:, -1].set(goal_state)
                x = x.at[:, 0, 2:].set(0.0)

            x = _smooth_segment(x, stepp, 2, cfg.smoothing_dt,
                                cfg.smoothing_max_vel)
            sel2 = self._select(x, obstacle_pts_flat, pursuer_pts, pursuer,
                                stepp, cfg.ddpm_collision_threshold_low)
            fallback = jnp.argmin(collision_counts(
                x, obstacle_pts_flat, cfg.ddpm_collision_threshold_low))
            pick = jnp.where(sel2.any_free, sel2.best_index, fallback)
            x_sel = x[pick]
            x_sel = x_sel.at[0, 2:].set(0.0)

            next_row = jnp.clip(stepp + 1, 0, h - 1)
            next_state = jax.lax.dynamic_slice(x_sel, (next_row, 0), (1, d))[0]
            new_history = jax.lax.dynamic_update_slice(
                carry.history, next_state[None], (next_row, 0))
            cur_state = jax.lax.dynamic_slice(x_sel, (row, 0), (1, d))[0]
            reached = jnp.linalg.norm(
                cur_state[:2] - goal_state[:2]) < cfg.ddpm_safe_threshold

            was_done = carry.done
            new_carry = Carry(
                x_best=jnp.where(was_done, carry.x_best, x_sel),
                history=jnp.where(was_done, carry.history, new_history),
                h_count=jnp.where(was_done, carry.h_count, carry.h_count + 1),
                pursuer=jnp.where(was_done, carry.pursuer, pursuer),
                key=key,
                done=jnp.logical_or(was_done, reached),
            )
            out = (jnp.where(was_done, carry.x_best, x_sel),
                   jnp.where(was_done, carry.pursuer, pursuer),
                   jnp.where(was_done, carry.x_best[jnp.clip(stepp, 0, h - 1)], cur_state),
                   ~was_done)
            return new_carry, out

        carry_f, (plans, pursuers, evaders, valid) = jax.lax.scan(
            control_step, carry0, jnp.arange(cfg.ddpm_max_iterations))

        return EpisodeResult(
            plans=plans, pursuer_centers=pursuers, evader_states=evaders,
            valid=valid, n_steps=jnp.sum(valid), high_plan=high_plan)

    # ------------------------------------------------------------------ run
    def _stage2_core(self, params, fold, x_best, history, h_count, stepp,
                     k_refine, k_replan, endpoints, static_apf_pts,
                     pursuer_pts, pursuer, goal_state, obstacle_pts_flat,
                     n_samples):
        """One STAGE-II control step given a pursuer position: refine the
        current best plan, select, replan from scratch if nothing is free,
        pick, and advance the executed history. Shared verbatim by the
        jitted episode scan (`_run`) and the per-step controller API
        (`controller_step`) so both execute identical math (ref :552-621)."""
        cfg = self.config
        h, d = cfg.horizon, cfg.state_dim
        x_plan = jnp.broadcast_to(x_best[None], (n_samples, h, d))
        x = self._refine(params, fold, x_plan, history, h_count, stepp,
                         k_refine, endpoints, static_apf_pts, pursuer_pts,
                         pursuer, goal_state)
        # smoothing window 2 after refinement (ref :589-591)
        x = _smooth_segment(x, stepp, 2, cfg.smoothing_dt, cfg.smoothing_max_vel)
        sel = self._select(x, obstacle_pts_flat, pursuer_pts, pursuer,
                           stepp, cfg.collision_threshold_low)

        def do_replan(_):
            xr = self._replan_scratch(params, fold, (n_samples, h, d),
                                      history, h_count, stepp, k_replan,
                                      endpoints, static_apf_pts, pursuer_pts,
                                      pursuer, goal_state)
            return _smooth_segment(xr, stepp, 2, cfg.smoothing_dt,
                                   cfg.smoothing_max_vel)

        x = jax.lax.cond(sel.any_free, lambda _: x, do_replan, None)
        sel2 = self._select(x, obstacle_pts_flat, pursuer_pts, pursuer,
                            stepp, cfg.collision_threshold_low)
        # final pick; if still nothing free, min collision-count fallback
        fallback = jnp.argmin(collision_counts(
            x, obstacle_pts_flat, cfg.collision_threshold_low))
        pick = jnp.where(sel2.any_free, sel2.best_index, fallback)
        x_sel = x[pick]
        x_sel = x_sel.at[0, 2:].set(0.0)  # ref :609

        row = jnp.clip(stepp, 0, h - 1)
        next_row = jnp.clip(stepp + 1, 0, h - 1)
        next_state = jax.lax.dynamic_slice(x_sel, (next_row, 0), (1, d))[0]
        new_history = jax.lax.dynamic_update_slice(
            history, next_state[None], (next_row, 0))
        cur_state = jax.lax.dynamic_slice(x_sel, (row, 0), (1, d))[0]
        # termination: |x[stepp] - goal| < safe_threshold (ref :620-621)
        reached = jnp.linalg.norm(
            cur_state[:2] - goal_state[:2]) < cfg.safe_threshold
        return x_sel, new_history, cur_state, next_state, reached

    def _run(self, params, key, obstacle_pts, static_apf_pts, start, goal,
             pursuer_init, guide_w, n_samples: int):
        cfg = self.config
        h, d = cfg.horizon, cfg.state_dim
        if cfg.pursuer_conditioned:
            key, k_p0 = jax.random.split(key)
            p_pts0 = self._cond_cloud(k_p0, pursuer_init, start[:2])
            fold = self._cond_fold(params, obstacle_pts, guide_w, p_pts0)
        else:
            latents = self.encoder.apply(params["encoder"], obstacle_pts[None])
            fold = cfg_fold(latents[0], guide_w)
        endpoints = dfn.Endpoints(start=start, goal=goal)
        goal_state = goal
        obstacle_pts_flat = obstacle_pts.reshape(-1, 2)
        ts_high = ddim_timesteps(cfg.n_diffusion_steps, cfg.ddim_steps_high)

        # ---------------- STAGE I: high-level plan (ref :537-549)
        key, k_init = jax.random.split(key)
        x = jax.random.normal(k_init, (n_samples, h, d), jnp.float32)
        x = dfn.apply_hard_conditioning(x, endpoints)
        for t_scalar in ts_high:
            x = self._ddim_step(params, fold, x, int(t_scalar), endpoints)
        sel = select_best_trajectory(x, obstacle_pts, cfg.collision_threshold_high)
        # fallback when nothing is collision-free: fewest colliding waypoints
        fallback = jnp.argmin(collision_counts(x, obstacle_pts_flat,
                                               cfg.collision_threshold_high))
        best = jnp.where(sel.any_free, sel.best_index, fallback)
        high_plan = x[best]
        x_best = high_plan

        history0 = jnp.zeros((h, d)).at[0].set(x_best[0])

        class Carry(NamedTuple):
            x_best: jax.Array
            history: jax.Array
            h_count: jax.Array
            pursuer: jax.Array
            key: jax.Array
            done: jax.Array

        carry0 = Carry(x_best, history0, jnp.asarray(1), pursuer_init,
                       key, jnp.asarray(False))

        def control_step(carry: Carry, k_idx):
            cfgc = cfg
            stepp = k_idx  # == reference stepp at loop start
            key = carry.key
            key, k_pts, k_refine, k_replan = jax.random.split(key, 4)

            # pursuer update: once per control step, pursuing the first
            # sample's current waypoint (ref dynamics use robot_position[0])
            row = jnp.clip(stepp, 0, h - 1)
            evader_now = jax.lax.dynamic_slice(carry.x_best, (row, 0), (1, d))[0, :2]
            pursuer = pursuit_step(k_idx, carry.pursuer, evader_now, cfgc.pursuit)
            pursuer_pts = generate_sphere_points(
                k_pts, pursuer, jnp.asarray(cfgc.pursuer_radius),
                cfgc.points_per_obstacle)
            if cfgc.pursuer_conditioned and cfgc.pursuer_sweep_steps > 0:
                key, k_sw = jax.random.split(key)
                fold_t = self._cond_fold(
                    params, obstacle_pts, guide_w,
                    self._cond_cloud(k_sw, pursuer, evader_now))
            elif cfgc.pursuer_conditioned:
                fold_t = self._cond_fold(params, obstacle_pts, guide_w,
                                         pursuer_pts)
            else:
                fold_t = fold

            x_sel, new_history, cur_state, next_state, reached = \
                self._stage2_core(params, fold_t, carry.x_best, carry.history,
                                  carry.h_count, stepp, k_refine, k_replan,
                                  endpoints, static_apf_pts, pursuer_pts,
                                  pursuer, goal_state, obstacle_pts_flat,
                                  n_samples)

            was_done = carry.done
            new_carry = Carry(
                x_best=jnp.where(was_done, carry.x_best, x_sel),
                history=jnp.where(was_done, carry.history, new_history),
                h_count=jnp.where(was_done, carry.h_count, carry.h_count + 1),
                pursuer=jnp.where(was_done, carry.pursuer, pursuer),
                key=key,
                done=jnp.logical_or(was_done, reached),
            )
            out = (jnp.where(was_done, carry.x_best, x_sel),
                   jnp.where(was_done, carry.pursuer, pursuer),
                   jnp.where(was_done, carry.x_best[jnp.clip(stepp, 0, h - 1)], cur_state),
                   ~was_done)
            return new_carry, out

        carry_f, (plans, pursuers, evaders, valid) = jax.lax.scan(
            control_step, carry0, jnp.arange(cfg.max_iterations))

        return EpisodeResult(
            plans=plans, pursuer_centers=pursuers, evader_states=evaders,
            valid=valid, n_steps=jnp.sum(valid), high_plan=high_plan)

    def run_episodes_batch(self, params, keys, obstacle_pts, static_apf_pts,
                           starts, goals, pursuer_inits,
                           n_samples: int = 35) -> EpisodeResult:
        """Run a BATCH of closed-loop episodes in one dispatch by vmapping the
        whole episode (contexts are independent). Leading axis K on every
        argument except params. One compilation, K episodes resident on
        device simultaneously — the eval-throughput analog of the sharded
        trajectory population.
        """
        sig = ("batch", n_samples)
        if sig not in self._run_jit:
            run = self._run if self.config.use_ddim else self._run_ddpm
            self._run_jit[sig] = jax.jit(jax.vmap(
                partial(run, n_samples=n_samples),
                in_axes=(None, 0, 0, 0, 0, 0, 0, None)))
        return self._run_jit[sig](params, keys, obstacle_pts, static_apf_pts,
                                  starts, goals, pursuer_inits,
                                  self._guide_w())

    def run_episode(self, params, key, obstacle_pts, static_apf_pts, start, goal,
                    pursuer_init, n_samples: int = 35) -> EpisodeResult:
        """Run one closed-loop episode under jit.

        obstacle_pts: [O, P, 2] dataset obstacle clouds (collision checks);
        static_apf_pts: [M, 2] box-surface points for APF (the reference
        generates these from the first 4 boxes' centers/sizes at episode
        setup, ref :516-517 + APFhelper_dynamic.py:82-87);
        pursuer_init: [2] initial pursuer position.
        """
        if n_samples not in self._run_jit:
            run = self._run if self.config.use_ddim else self._run_ddpm
            self._run_jit[n_samples] = jax.jit(
                partial(run, n_samples=n_samples))
        return self._run_jit[n_samples](params, key, obstacle_pts, static_apf_pts,
                                        start, goal, pursuer_init,
                                        self._guide_w())

    # ------------------------------------------ vehicle-in-the-loop engine
    # `eval.qcar.run_qcar_episode` drives the non-holonomic car from the
    # host: one `controller_step` dispatch per tick, which on the real chip
    # pays tunnel RTT per replan. This engine folds the WHOLE closed loop —
    # stage-II replan, pure-pursuit tracking substeps, pursuer update,
    # capture/goal exits and the landing phase — into one jitted scan, the
    # same design as `_run` but with the kinematic bicycle in the carry
    # (the car's ACTUAL pose feeds the pursuer and the exits). RNG splits
    # mirror `begin_episode`/`controller_step` exactly, so the two engines
    # produce identical chains for the same key (tested).

    def _run_vehicle(self, params, key, obstacle_pts, static_apf_pts, start,
                     goal, pursuer_init, guide_w, n_samples, qcar,
                     n_substeps, finish_ticks, goal_safe_threshold):
        from ramp_tpu.scenes.vehicles import QCarState, track_waypoint

        cfg = self.config
        h, d = cfg.horizon, cfg.state_dim
        if cfg.pursuer_conditioned:
            key, k_p0 = jax.random.split(key)
            p_pts0 = self._cond_cloud(k_p0, pursuer_init, start[:2])
            fold = self._cond_fold(params, obstacle_pts, guide_w, p_pts0)
        else:
            latents = self.encoder.apply(params["encoder"], obstacle_pts[None])
            fold = cfg_fold(latents[0], guide_w)
        endpoints = dfn.Endpoints(start=start, goal=goal)
        goal_state = goal
        obstacle_pts_flat = obstacle_pts.reshape(-1, 2)
        ts_high = ddim_timesteps(cfg.n_diffusion_steps, cfg.ddim_steps_high)

        # STAGE I (identical to `begin_episode`, same key schedule)
        key, k_init = jax.random.split(key)
        x = jax.random.normal(k_init, (n_samples, h, d), jnp.float32)
        x = dfn.apply_hard_conditioning(x, endpoints)
        for t_scalar in ts_high:
            x = self._ddim_step(params, fold, x, int(t_scalar), endpoints)
        sel = select_best_trajectory(x, obstacle_pts,
                                     cfg.collision_threshold_high)
        fallback = jnp.argmin(collision_counts(x, obstacle_pts_flat,
                                               cfg.collision_threshold_high))
        best = jnp.where(sel.any_free, sel.best_index, fallback)
        high_plan = x[best]
        history0 = jnp.zeros((h, d)).at[0].set(high_plan[0])

        # car placed at the start pose facing the plan's first leg
        first_leg = high_plan[1, :2] - start[:2]
        car0 = QCarState(start[0], start[1],
                         jnp.arctan2(first_leg[1], first_leg[0]),
                         jnp.asarray(0.0, jnp.float32))
        capture_threshold = cfg.pursuer_radius + 0.02

        class Carry(NamedTuple):
            x_best: jax.Array
            history: jax.Array
            h_count: jax.Array
            pursuer: jax.Array
            key: jax.Array
            car: QCarState
            step: jax.Array          # stage-II replans executed so far
            fin: jax.Array           # landing-phase ticks consumed
            planner_done: jax.Array  # goal exit fired; car still landing
            done: jax.Array          # episode over (frozen thereafter)
            captured: jax.Array

        carry0 = Carry(high_plan, history0, jnp.asarray(1), pursuer_init,
                       key, car0, jnp.asarray(0), jnp.asarray(0),
                       jnp.asarray(False), jnp.asarray(False),
                       jnp.asarray(False))

        def control_step(carry: Carry, k_idx):
            key, k_pts, k_refine, k_replan = jax.random.split(carry.key, 4)
            pursuer_obs = carry.pursuer
            pursuer_pts = generate_sphere_points(
                k_pts, pursuer_obs, jnp.asarray(cfg.pursuer_radius),
                cfg.points_per_obstacle)
            if cfg.pursuer_conditioned and cfg.pursuer_sweep_steps > 0:
                key, k_sw = jax.random.split(key)
                fold_t = self._cond_fold(
                    params, obstacle_pts, guide_w,
                    self._cond_cloud(k_sw, pursuer_obs, carry.car.pose))
            elif cfg.pursuer_conditioned:
                fold_t = self._cond_fold(params, obstacle_pts, guide_w,
                                         pursuer_pts)
            else:
                fold_t = fold
            x_sel, new_history, _cur, next_state, reached = \
                self._stage2_core(params, fold_t, carry.x_best, carry.history,
                                  carry.h_count, carry.step, k_refine,
                                  k_replan, endpoints, static_apf_pts,
                                  pursuer_pts, pursuer_obs, goal_state,
                                  obstacle_pts_flat, n_samples)

            # planner state only advances while it is live and in budget
            plan_upd = jnp.logical_and(
                ~jnp.logical_or(carry.planner_done, carry.done),
                carry.step < cfg.max_iterations)
            x_best = jnp.where(plan_upd, x_sel, carry.x_best)
            history = jnp.where(plan_upd, new_history, carry.history)
            h_count = carry.h_count + plan_upd
            step = carry.step + plan_upd

            # the car tracks the next waypoint — or, while landing, the goal
            target = jnp.where(carry.planner_done, goal_state[:2],
                               next_state[:2])
            car_new, subpath = track_waypoint(carry.car, target, qcar,
                                              n_substeps)
            car = jax.tree_util.tree_map(
                lambda old, new: jnp.where(carry.done, old, new),
                carry.car, car_new)
            subpath = jnp.where(carry.done,
                                jnp.broadcast_to(carry.car.pose,
                                                 subpath.shape), subpath)
            pursuer = jnp.where(carry.done, carry.pursuer,
                                pursuit_step(k_idx, carry.pursuer, car.pose,
                                             cfg.pursuit))

            dist_goal = jnp.linalg.norm(car.pose - goal_state[:2])
            # capture exit == the METRIC's condition (pose at tick t vs the
            # pursuer at t-1, first checked at t=2 — dynamic_episode_metrics
            # offsets the chains this way), so termination and scoring agree
            captured_now = (
                ~carry.done & (k_idx >= 1)
                & (jnp.linalg.norm(car.pose - carry.pursuer)
                   <= capture_threshold))
            # goal exit (ref :620-621): the PLAN reached the goal, or the
            # car itself is inside the safe radius
            planner_done = jnp.logical_or(
                carry.planner_done,
                jnp.logical_or(jnp.logical_and(reached, plan_upd),
                               dist_goal < cfg.safe_threshold))
            fin = carry.fin + jnp.logical_and(planner_done, ~carry.done)
            landed = jnp.logical_and(planner_done,
                                     dist_goal <= 0.8 * goal_safe_threshold)
            budget_out = jnp.logical_and(step >= cfg.max_iterations,
                                         ~planner_done)
            done = (carry.done | captured_now | landed | budget_out
                    | (fin > finish_ticks))
            captured = jnp.logical_or(carry.captured, captured_now)

            new_carry = Carry(x_best, history, h_count, pursuer, key, car,
                              step, fin, planner_done, done, captured)
            out = (jnp.where(plan_upd, x_sel, carry.x_best), pursuer,
                   jnp.stack([car.x, car.y, car.theta, car.v]), subpath,
                   target, ~carry.done)
            return new_carry, out

        n_ticks = cfg.max_iterations + finish_ticks
        carry_f, (plans, pursuers, cars, subpaths, targets, valid) = \
            jax.lax.scan(control_step, carry0, jnp.arange(n_ticks))
        return VehicleEpisodeResult(
            plans=plans, pursuer_centers=pursuers, car_states=cars,
            substeps=subpaths, targets=targets, valid=valid,
            n_steps=jnp.sum(valid), high_plan=high_plan,
            captured=carry_f.captured, planner_steps=carry_f.step)

    def run_vehicle_episode(self, params, key, obstacle_pts, static_apf_pts,
                            start, goal, pursuer_init, n_samples: int = 35,
                            qcar=None, n_substeps: int = 5,
                            finish_ticks: int = 15,
                            goal_safe_threshold: float = 0.25,
                            ) -> "VehicleEpisodeResult":
        """One non-holonomic closed-loop episode in ONE device dispatch."""
        if not self.config.use_ddim:
            raise NotImplementedError("vehicle engine requires use_ddim=True")
        from ramp_tpu.scenes.vehicles import QCarParams
        qcar = QCarParams() if qcar is None else qcar
        sig = ("vehicle", n_samples, n_substeps, finish_ticks,
               tuple(qcar), goal_safe_threshold)
        if sig not in self._run_jit:
            self._run_jit[sig] = jax.jit(partial(
                self._run_vehicle, n_samples=n_samples, qcar=qcar,
                n_substeps=n_substeps, finish_ticks=finish_ticks,
                goal_safe_threshold=goal_safe_threshold))
        return self._run_jit[sig](params, key, obstacle_pts, static_apf_pts,
                                  start, goal, pursuer_init, self._guide_w())

    def run_vehicle_episodes_batch(self, params, keys, obstacle_pts,
                                   static_apf_pts, starts, goals,
                                   pursuer_inits, n_samples: int = 35,
                                   qcar=None, n_substeps: int = 5,
                                   finish_ticks: int = 15,
                                   goal_safe_threshold: float = 0.25,
                                   ) -> "VehicleEpisodeResult":
        """A BATCH of vehicle episodes in one dispatch (vmapped episodes,
        leading axis K on everything but params — the `run_episodes_batch`
        analog for the non-holonomic loop)."""
        if not self.config.use_ddim:
            raise NotImplementedError("vehicle engine requires use_ddim=True")
        from ramp_tpu.scenes.vehicles import QCarParams
        qcar = QCarParams() if qcar is None else qcar
        sig = ("vehicle_batch", n_samples, n_substeps, finish_ticks,
               tuple(qcar), goal_safe_threshold)
        if sig not in self._run_jit:
            self._run_jit[sig] = jax.jit(jax.vmap(
                partial(self._run_vehicle, n_samples=n_samples, qcar=qcar,
                        n_substeps=n_substeps, finish_ticks=finish_ticks,
                        goal_safe_threshold=goal_safe_threshold),
                in_axes=(None, 0, 0, 0, 0, 0, 0, None)))
        return self._run_jit[sig](params, keys, obstacle_pts, static_apf_pts,
                                  starts, goals, pursuer_inits,
                                  self._guide_w())

    # --------------------------------------------- per-step controller API
    # The eval engine above simulates the pursuer inside one jitted episode
    # scan. On a real robot the loop belongs to the controller: each tick,
    # perception OBSERVES the pursuer and the planner must produce the next
    # plan. `begin_episode` runs STAGE I once; `controller_step` runs one
    # STAGE-II replan against the observed pursuer position. Both share the
    # episode engine's kernels (`_stage2_core`), so given the same pursuer
    # trajectory they reproduce `run_episode` exactly (tested bitwise).

    def begin_episode(self, params, key, obstacle_pts, start, goal,
                      n_samples: int = 35, pursuer_init=None):
        """STAGE I high-level plan (ref :537-549). Returns
        (ControllerState, high_plan [H, D]).

        pursuer_init: [2] initial observed pursuer position — required when
        pursuer_conditioned (STAGE I conditions on it)."""
        if not self.config.use_ddim:
            raise NotImplementedError("controller API requires use_ddim=True")
        if self.config.pursuer_conditioned and pursuer_init is None:
            raise ValueError("pursuer_conditioned requires pursuer_init")
        if pursuer_init is None:
            pursuer_init = jnp.zeros((2,), jnp.float32)  # unused
        sig = ("begin", n_samples)
        if sig not in self._run_jit:
            def begin(params, key, obstacle_pts, start, goal, guide_w,
                      pursuer_init):
                cfg = self.config
                h, d = cfg.horizon, cfg.state_dim
                if cfg.pursuer_conditioned:
                    key, k_p0 = jax.random.split(key)
                    p_pts0 = self._cond_cloud(k_p0, pursuer_init, start[:2])
                    fold = self._cond_fold(params, obstacle_pts, guide_w,
                                           p_pts0)
                else:
                    latents = self.encoder.apply(params["encoder"],
                                                 obstacle_pts[None])
                    fold = cfg_fold(latents[0], guide_w)
                endpoints = dfn.Endpoints(start=start, goal=goal)
                obstacle_pts_flat = obstacle_pts.reshape(-1, 2)
                ts_high = ddim_timesteps(cfg.n_diffusion_steps, cfg.ddim_steps_high)
                key, k_init = jax.random.split(key)
                x = jax.random.normal(k_init, (n_samples, h, d), jnp.float32)
                x = dfn.apply_hard_conditioning(x, endpoints)
                for t_scalar in ts_high:
                    x = self._ddim_step(params, fold, x, int(t_scalar), endpoints)
                sel = select_best_trajectory(x, obstacle_pts,
                                             cfg.collision_threshold_high)
                fallback = jnp.argmin(collision_counts(
                    x, obstacle_pts_flat, cfg.collision_threshold_high))
                best = jnp.where(sel.any_free, sel.best_index, fallback)
                high_plan = x[best]
                history0 = jnp.zeros((h, d)).at[0].set(high_plan[0])
                state = ControllerState(
                    x_best=high_plan, history=history0, h_count=jnp.asarray(1),
                    key=key, step=jnp.asarray(0), done=jnp.asarray(False))
                return state, high_plan
            self._run_jit[sig] = jax.jit(begin)
        return self._run_jit[sig](params, key, obstacle_pts, start, goal,
                                  self._guide_w(), pursuer_init)

    def encode_scene(self, params, obstacle_pts):
        """Scene latents for a fixed obstacle cloud ([tokens, 320]): compute
        once per episode and pass to `controller_step` to skip the per-tick
        encoder forward (the episode engine hoists it the same way)."""
        sig = ("encode",)
        if sig not in self._run_jit:
            self._run_jit[sig] = jax.jit(
                lambda params, pts: self.encoder.apply(
                    params["encoder"], pts[None])[0])
        return self._run_jit[sig](params, obstacle_pts)

    def controller_step(self, params, state: ControllerState, pursuer_center,
                        obstacle_pts, static_apf_pts, goal,
                        n_samples: int = 35, scene_latents=None):
        """One closed-loop control tick against an observed pursuer.

        pursuer_center: [2] observed pursuer position this tick, in the same
        frame as the obstacle clouds (the engine compares trajectory rows to
        it directly, ref :376; the reference never normalizes either).
        scene_latents: optional [tokens, 320] from `encode_scene`, skipping
        the per-tick encoder forward for a fixed scene.
        Returns (new_state, plan [H, D], next_state [D], reached bool):
        execute toward `next_state` (= plan row step+1), then call again
        with the next observation. ref :552-621 with the harness's simulated
        pursuer replaced by the observation.
        """
        if not self.config.use_ddim:
            raise NotImplementedError("controller API requires use_ddim=True")
        sig = ("ctrl", n_samples, scene_latents is not None)
        if sig not in self._run_jit:
            def step_fn(params, state, pursuer_center, obstacle_pts,
                        static_apf_pts, goal, guide_w, scene_latents=None):
                cfg = self.config
                # history row 0 is the episode start (set by begin_episode)
                endpoints = dfn.Endpoints(start=state.history[0], goal=goal)
                obstacle_pts_flat = obstacle_pts.reshape(-1, 2)
                stepp = state.step
                key, k_pts, k_refine, k_replan = jax.random.split(state.key, 4)
                pursuer_pts = generate_sphere_points(
                    k_pts, pursuer_center, jnp.asarray(cfg.pursuer_radius),
                    cfg.points_per_obstacle)
                if cfg.pursuer_conditioned and cfg.pursuer_sweep_steps > 0:
                    key, k_sw = jax.random.split(key)
                    row = jnp.clip(stepp, 0, cfg.horizon - 1)
                    evader_now = jax.lax.dynamic_slice(
                        state.x_best, (row, 0), (1, cfg.state_dim))[0, :2]
                    fold = self._cond_fold(
                        params, obstacle_pts, guide_w,
                        self._cond_cloud(k_sw, pursuer_center, evader_now))
                elif cfg.pursuer_conditioned:
                    # the conditioning cloud changes with the observation, so
                    # a hoisted scene latent cannot be used
                    fold = self._cond_fold(params, obstacle_pts, guide_w,
                                           pursuer_pts)
                else:
                    if scene_latents is None:
                        scene_latents = self.encoder.apply(
                            params["encoder"], obstacle_pts[None])[0]
                    fold = cfg_fold(scene_latents, guide_w)
                x_sel, new_history, _cur, next_state, reached = \
                    self._stage2_core(params, fold, state.x_best,
                                      state.history, state.h_count, stepp,
                                      k_refine, k_replan, endpoints,
                                      static_apf_pts, pursuer_pts,
                                      pursuer_center, goal,
                                      obstacle_pts_flat, n_samples)
                new_state = ControllerState(
                    x_best=x_sel, history=new_history,
                    h_count=state.h_count + 1, key=key, step=stepp + 1,
                    done=jnp.logical_or(state.done, reached))
                return new_state, x_sel, next_state, reached
            self._run_jit[sig] = jax.jit(step_fn)
        args = (params, state, pursuer_center, obstacle_pts, static_apf_pts,
                goal, self._guide_w())
        if scene_latents is not None:
            if self.config.pursuer_conditioned:
                raise ValueError(
                    "pursuer_conditioned recomputes the scene encoding with "
                    "the live pursuer row each tick; encode_scene latents "
                    "cannot be used")
            return self._run_jit[sig](*args, scene_latents=scene_latents)
        return self._run_jit[sig](*args)

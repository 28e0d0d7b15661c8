#!/usr/bin/env python
"""One-off probe: raw vs stride-decimated ("macro") path length for plain and
APF static sampling — distinguishes per-waypoint APF jitter (raw length
inflates, macro stays near the route length) from actual wandering (both
inflate). Calibrates the round-3 path-sanity gate in eval/metrics.py."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
set_platform("cpu")
enable_compilation_cache()
from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
from ramp_tpu.guidance.apf import APFParams
from ramp_tpu.utils.checkpoints import load_planner_params

ds = TrajectoryDataset("dataset/EnvSimple2dquant_v2", include_velocity=True)
n_obs, n_pts = ds.obstacle_points.shape[1:3]
for use_apf in [False, True]:
    cfg = StaticPlannerConfig(horizon=ds.horizon, state_dim=ds.state_dim,
                              use_apf=use_apf, apf=APFParams())
    pl_ = StaticPlanner(cfg)
    params = load_planner_params(pl_, "artifacts/weights/simple2d_v2.npz",
                                 n_obs, n_pts, seed=0)
    for env in range(3):
        idx = int(ds.map_task_id_to_trajectories_id[env][0])
        hc = ds.hard_conds(idx)
        x, _ = pl_.plan(params, jax.random.PRNGKey(env),
                        jnp.asarray(ds.obstacle_points[idx]),
                        jnp.asarray(hc["start"], jnp.float32),
                        jnp.asarray(hc["goal"], jnp.float32),
                        n_samples=20, return_chain=False)
        t = np.asarray(ds.normalizer.unnormalize(x))[:, :, :2]
        raw = np.sqrt(((t[:, 1:] - t[:, :-1]) ** 2).sum(-1)).sum(-1)
        st = np.linalg.norm(t[:, -1] - t[:, 0], axis=-1)
        for s in (4, 8):
            dec = np.concatenate([t[:, ::s], t[:, -1:]], axis=1)
            mac = np.sqrt(((dec[:, 1:] - dec[:, :-1]) ** 2).sum(-1)).sum(-1)
            print(f"apf={use_apf} env={env} stride={s}: "
                  f"raw mean {raw.mean():.2f} max {raw.max():.2f} | "
                  f"macro mean {mac.mean():.2f} max {mac.max():.2f} | "
                  f"straight {st.mean():.2f}", flush=True)

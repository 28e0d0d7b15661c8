"""Checkpoint param loading for inference scripts.

The reference loads `{ema_,}model_current_state_dict.pth` per harness
(`inference_static.py:107-111`, `config/base_config.py:70-73`); here orbax
restores the full TrainState and inference picks EMA or raw params.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def load_planner_params(planner, checkpoint_dir: Optional[str], n_obstacles: int,
                        n_points: int, use_ema: bool = True, seed: int = 0):
    """Restore params from the latest orbax checkpoint, or random-init."""
    from ramp_tpu.train.state import TrainConfig, create_train_state

    params = planner.init_params(jax.random.PRNGKey(seed), n_obstacles, n_points)
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        import orbax.checkpoint as ocp
        mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
        step = mgr.latest_step()
        if step is not None:
            template = create_train_state(params, TrainConfig())
            state = mgr.restore(step, args=ocp.args.StandardRestore(template))
            print(f"loaded checkpoint step {step}")
            return state.ema_params if use_ema else state.params
    print("WARNING: no checkpoint found; using random init")
    return params

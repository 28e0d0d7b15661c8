"""Checkpoint param loading for inference scripts.

The reference loads `{ema_,}model_current_state_dict.pth` per harness
(`inference_static.py:107-111`, `config/base_config.py:70-73`); here orbax
restores the full TrainState and inference picks EMA or raw params.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", None))
        parts.append(str(key))
    return "/".join(parts)


def export_params_npz(params: Dict, path: str, dtype=np.float16) -> str:
    """Flatten a param pytree into a compressed npz (f16 by default — the
    planners compute in bf16, so half-precision storage is lossless enough
    and keeps trained weights small enough to live in-repo)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for p, leaf in leaves:
        a = np.asarray(jax.device_get(leaf))
        arrays[_path_str(p)] = a.astype(dtype) if np.issubdtype(a.dtype, np.floating) else a
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_params_npz(path: str, template_params: Dict) -> Dict:
    """Inverse of `export_params_npz`: restore into the template's structure
    and dtypes. Raises if any leaf is missing or shape-mismatched."""
    data = np.load(path)
    leaves = jax.tree_util.tree_flatten_with_path(template_params)[0]
    out = []
    for p, leaf in leaves:
        name = _path_str(p)
        if name not in data.files:
            raise KeyError(f"missing param {name!r} in {path}")
        a = data[name]
        if a.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name!r}: "
                             f"{a.shape} vs template {leaf.shape}")
        out.append(jnp.asarray(a, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_params), out)


def load_planner_params(planner, checkpoint_dir: Optional[str], n_obstacles: int,
                        n_points: int, use_ema: bool = True, seed: int = 0):
    """Restore params from the latest orbax checkpoint, a `.npz` weight file
    (see `export_params_npz`), or random-init."""
    from ramp_tpu.train.state import TrainConfig, create_train_state

    params = planner.init_params(jax.random.PRNGKey(seed), n_obstacles, n_points)
    if checkpoint_dir and checkpoint_dir.endswith(".pth") and os.path.isfile(checkpoint_dir):
        # a reference (PyTorch) checkpoint — convert it in place so reference
        # users can point --checkpoints at their GPU-trained state_dicts
        from ramp_tpu.utils.torch_import import import_reference_checkpoint
        restored = import_reference_checkpoint(
            checkpoint_dir, n_resolutions=len(planner.unet.dim_mults))
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, restored)
        our_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        if ref_shapes != our_shapes:
            raise ValueError(
                f"{checkpoint_dir} does not match this planner's architecture "
                "(check --unet-dim / --dim-mults-option / encoder sizes)")
        print(f"imported reference torch checkpoint {checkpoint_dir}")
        return restored
    if checkpoint_dir and checkpoint_dir.endswith(".npz") and os.path.isfile(checkpoint_dir):
        restored = load_params_npz(checkpoint_dir, params)
        print(f"loaded weights from {checkpoint_dir}")
        return restored
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

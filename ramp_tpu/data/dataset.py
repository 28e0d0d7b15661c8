"""Trajectory dataset: MPD directory-layout reader + batch iterator.

Layout parity with `mpd/datasets/trajectories.py:114-175` — the dataset root
contains one subdirectory per task (scene), each holding:

  static layout (2-D static / 3-D):
    trajs-free.pt        [n, H, D]   collision-free demonstration trajs
    obstacle_points.pt   [O, P, dim] per-obstacle surface point clouds
    box_centers.npy      [O, dim]
    metadata.yaml        env_id / robot_id / box_sizes (+ sphere geometry 3-D)
  dynamic layout:
    trajs-free.pt, obstacle_pointsORG.pt, obstacle_config.npy (list of
    {'type': 'box'|'sphere', 'center', 'size'} dicts)

`.pt` files are read with torch (CPU) and converted to numpy once at ingest —
nothing torch survives past loading. `.npy` twins of the `.pt` names are
accepted transparently so freshly-generated datasets skip torch entirely.

Normalization parity: LimitsNormalizer over the whole traj field to [-1, 1]
(`trajectories.py:109-112`); `task` = (start_pos, goal_pos) concat
(`:186-187`); hard conds pin row 0/H-1 with zero velocity (`:286-309`).

The batch iterator replaces torch DataLoader + DistributedSampler: numpy
gather into pinned host arrays, per-process strided sharding for multi-host
(`ramp_tpu.parallel.process_shard_indices`), device placement by the trainer.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ramp_tpu.core.normalization import LimitsNormalizer
from ramp_tpu.parallel.mesh import process_shard_indices

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


def _load_tensor(path_pt: str) -> np.ndarray:
    """Load `<name>.pt` (torch) or `<name>.npy` (numpy), whichever exists."""
    path_npy = path_pt[:-3] + ".npy" if path_pt.endswith(".pt") else path_pt + ".npy"
    if os.path.exists(path_npy):
        return np.asarray(np.load(path_npy), dtype=np.float32)
    import torch  # local import: torch is only ever touched for .pt ingest
    t = torch.load(path_pt, map_location="cpu", weights_only=False)
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def load_task_dir(task_dir: str, static: bool = True) -> Optional[Dict]:
    """Load one task directory; returns None when required files are absent."""
    files = set(os.listdir(task_dir))
    def has(name):
        return name in files or (name[:-3] + ".npy") in files

    if static:
        required = ["trajs-free.pt", "obstacle_points.pt"]
        if not all(has(r) for r in required) or "box_centers.npy" not in files:
            return None
        trajs = _load_tensor(os.path.join(task_dir, "trajs-free.pt"))
        obstacle_points = _load_tensor(os.path.join(task_dir, "obstacle_points.pt"))
        box_centers = np.load(os.path.join(task_dir, "box_centers.npy")).astype(np.float32)
        metadata = _load_yaml(os.path.join(task_dir, "metadata.yaml"))
        box_sizes = np.asarray(metadata["box_sizes"], dtype=np.float32)
        return {"trajs": trajs, "obstacle_points": obstacle_points,
                "box_centers": box_centers, "box_sizes": box_sizes,
                "metadata": metadata}

    required = ["trajs-free.pt", "obstacle_pointsORG.pt"]
    if not all(has(r) for r in required) or "obstacle_config.npy" not in files:
        return None
    trajs = _load_tensor(os.path.join(task_dir, "trajs-free.pt"))
    obstacle_points = _load_tensor(os.path.join(task_dir, "obstacle_pointsORG.pt"))
    config = np.load(os.path.join(task_dir, "obstacle_config.npy"), allow_pickle=True)
    box_centers = np.asarray([o["center"] for o in config if o["type"] == "box"],
                             dtype=np.float32)
    box_sizes = np.asarray([o["size"] for o in config if o["type"] == "box"],
                           dtype=np.float32)
    meta_path = os.path.join(task_dir, "metadata.yaml")
    metadata = _load_yaml(meta_path) if os.path.exists(meta_path) else {}
    return {"trajs": trajs, "obstacle_points": obstacle_points,
            "box_centers": box_centers, "box_sizes": box_sizes,
            "metadata": metadata}


class TrajectoryDataset:
    """In-memory trajectory dataset over an MPD-layout directory tree.

    Covers both reference loaders: `TrajectoryDataset` (training over every
    task subdir) and `ExpDirectoryDataset` (single-task eval,
    `trajectories.py:312-351`) — pass `task_ids=[i]` for the latter.
    """

    def __init__(self, base_dir, include_velocity: bool = True,
                 static: bool = True, task_ids: Optional[List[int]] = None,
                 normalizer: str = "LimitsNormalizer",
                 normalizer_from: Optional[str] = None):
        # `base_dir` may be one directory, a comma-separated list, or a list
        # of directories — extra roots concatenate their tasks (scene-set
        # augmentation for training; the normalizer fits the union). The
        # reference's loader is single-root (`trajectories.py:114`).
        if isinstance(base_dir, str):
            base_dirs = [d for d in base_dir.split(",") if d]
        else:
            base_dirs = list(base_dir)
        self.base_dir = base_dirs[0]
        self.static = static
        self.include_velocity = include_velocity

        subdirs = []
        for root in base_dirs:
            subdirs.extend(
                (root, d) for d in sorted(
                    (d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d))),
                    key=lambda d: (len(d), d)))
        if task_ids is not None:
            subdirs = [subdirs[i] for i in task_ids]

        trajs_l, obs_l, bc_l, bs_l = [], [], [], []
        self.map_task_id_to_trajectories_id: Dict[int, np.ndarray] = {}
        self.task_dirs: List[str] = []
        # per-task metadata (sphere geometry etc.) aligned with task ids —
        # tasks in one family can carry different sphere_centers/radii, so a
        # single dataset-level dict would silently mix scenes
        self.task_metadata: List[dict] = []
        n = 0
        metadata = {}
        for tid, (root, sub) in enumerate(subdirs):
            task = load_task_dir(os.path.join(root, sub), static=static)
            if task is None:
                continue
            k = task["trajs"].shape[0]
            self.map_task_id_to_trajectories_id[len(self.task_dirs)] = n + np.arange(k)
            # joined path keeps task identity unambiguous across multiple roots
            self.task_dirs.append(os.path.join(root, sub))
            trajs_l.append(task["trajs"])
            obs_l.append(np.broadcast_to(task["obstacle_points"][None],
                                         (k,) + task["obstacle_points"].shape))
            bc_l.append(np.broadcast_to(task["box_centers"][None],
                                        (k,) + task["box_centers"].shape))
            bs_l.append(np.broadcast_to(task["box_sizes"][None],
                                        (k,) + task["box_sizes"].shape))
            self.task_metadata.append(task["metadata"] or {})
            metadata = task["metadata"] or metadata
            n += k
        if n == 0:
            raise FileNotFoundError(f"no task directories with data under {base_dir}")

        trajs = np.concatenate(trajs_l)
        if not include_velocity:
            pos_dim = trajs.shape[-1] // 2
            trajs = trajs[..., :pos_dim]
        self.trajs = trajs
        self.obstacle_points = np.concatenate(obs_l)
        self.box_centers = np.concatenate(bc_l)
        self.box_sizes = np.concatenate(bs_l)
        # last task's metadata (legacy aggregate view — fields that vary per
        # task, e.g. sphere geometry, must come from self.task_metadata)
        self.metadata = metadata
        self.n_trajs, self.horizon, self.state_dim = trajs.shape

        if normalizer_from is not None:
            # Fit normalization limits on a REFERENCE dataset root instead of
            # this dataset's union — keeps the training/eval normalization
            # spaces identical when training data is augmented with extra
            # scene roots while evaluation stays on the original root.
            ref = TrajectoryDataset(normalizer_from,
                                    include_velocity=include_velocity,
                                    static=static)
            self.normalizer = ref.normalizer
        else:
            self.normalizer = LimitsNormalizer.fit(trajs)
        self.trajs_normalized = np.asarray(self.normalizer.normalize(trajs))
        pos_dim = self.state_dim // 2 if include_velocity else self.state_dim
        # task field = (start_pos, goal_pos) concat (ref trajectories.py:186)
        self.tasks = np.concatenate(
            [trajs[:, 0, :pos_dim], trajs[:, -1, :pos_dim]], axis=-1)

    def __len__(self) -> int:
        return self.n_trajs

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return {
            "traj": self.trajs_normalized[index],
            "obstacle_points": self.obstacle_points[index],
            "box_centers": self.box_centers[index],
            "box_sizes": self.box_sizes[index],
        }

    def hard_conds(self, index: int) -> Dict[str, np.ndarray]:
        """Endpoint pins with zero velocity, normalized space
        (ref trajectories.py:286-309)."""
        traj = self.trajs_normalized[index]
        start = traj[0].copy()
        goal = traj[-1].copy()
        if self.include_velocity:
            pos_dim = self.state_dim // 2
            start[pos_dim:] = 0.0
            goal[pos_dim:] = 0.0
        return {"start": start, "goal": goal}


def batch_iterator(dataset: TrajectoryDataset, batch_size: int,
                   seed: int = 0, shuffle: bool = True,
                   process_sharded: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite epoch-shuffled batch stream of {"traj", "obstacle_points"}.

    Multi-host: each process draws only its stride of every epoch's
    permutation (the DistributedSampler analog); `sampler.set_epoch` parity
    comes from reseeding the permutation with the epoch index.
    """
    epoch = 0
    while True:
        rng = np.random.default_rng(seed + epoch)
        if process_sharded:
            idx = process_shard_indices(len(dataset), rng if shuffle else None)
        else:
            idx = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
        for lo in range(0, len(idx) - batch_size + 1, batch_size):
            sel = idx[lo:lo + batch_size]
            yield {
                "traj": dataset.trajs_normalized[sel],
                "obstacle_points": dataset.obstacle_points[sel],
            }
        epoch += 1

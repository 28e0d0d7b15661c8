"""Host-side plotting — parity with `scripts/inference/core/visualization.py`
(BaseVisualizer :9-87 static PNG; DynamicVisualizer :89-236 pursuit GIF).

Plotting stays on the host (matplotlib), fed by numpy arrays pulled once per
episode; nothing here touches the jitted compute path.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Circle, Rectangle


def _draw_scene(ax, box_centers, box_sizes, obstacle_points=None):
    sizes = np.asarray(box_sizes)
    if sizes.ndim == 1:
        sizes = np.repeat(sizes[:, None], 2, axis=-1)
    for c, s in zip(np.asarray(box_centers), sizes):
        ax.add_patch(Rectangle((c[0] - s[0] / 2, c[1] - s[1] / 2), s[0], s[1],
                               facecolor="#b0b0b0", edgecolor="k", alpha=0.8))
    if obstacle_points is not None:
        pts = np.asarray(obstacle_points).reshape(-1, 2)
        ax.scatter(pts[:, 0], pts[:, 1], s=1, c="tab:red", alpha=0.4)
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.set_aspect("equal")


def save_static_plot(path: str, trajs: np.ndarray, box_centers, box_sizes,
                     obstacle_points=None, start=None, goal=None,
                     collision_free: Optional[np.ndarray] = None) -> None:
    """Static PNG: boxes, point clouds, trajectories (ref :9-87)."""
    fig, ax = plt.subplots(figsize=(6, 6))
    _draw_scene(ax, box_centers, box_sizes, obstacle_points)
    trajs = np.asarray(trajs)
    for i, tr in enumerate(trajs):
        free = collision_free[i] if collision_free is not None else True
        ax.plot(tr[:, 0], tr[:, 1], lw=1,
                color="tab:blue" if free else "tab:orange",
                alpha=0.7 if free else 0.35)
    if start is not None:
        ax.plot(start[0], start[1], "go", ms=10, label="start")
    if goal is not None:
        ax.plot(goal[0], goal[1], "r*", ms=14, label="goal")
    ax.legend(loc="upper right")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_dynamic_gif(path: str, chains: Dict[str, np.ndarray], box_centers,
                     box_sizes, goal, pursuer_radius: float = 0.1,
                     pf_threshold: float = 0.3, fps: int = 8) -> None:
    """Pursuit-evasion episode GIF: executed path, pursuer circle + history,
    and the potential-field heat overlay per control step (ref :89-236).
    `chains` from `dynamic_harness.episode_chains`."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    chain_start = np.asarray(chains["chain_start"])
    chain_obs = np.asarray(chains["chain_obs"])
    plans = chains.get("plans")
    n = len(chain_start)
    fig, ax = plt.subplots(figsize=(6, 6))

    def frame(k):
        ax.clear()
        _draw_scene(ax, box_centers, box_sizes)
        ax.plot(goal[0], goal[1], "r*", ms=14)
        ax.plot(chain_start[:k + 1, 0], chain_start[:k + 1, 1], "b.-", lw=1.5)
        if plans is not None and k < len(plans):
            ax.plot(plans[k][:, 0], plans[k][:, 1], "c--", lw=0.8, alpha=0.6)
        # pursuer history + potential-field heat overlay (ref :176-236:
        # exp(-d/thr) masked to d <= thr around the pursuer)
        ax.plot(chain_obs[:k, 0], chain_obs[:k, 1], "o", ms=3,
                color="peachpuff")
        cx, cy = chain_obs[k]
        thr = pf_threshold
        gx = np.linspace(cx - thr, cx + thr, 60)
        gy = np.linspace(cy - thr, cy + thr, 60)
        gxx, gyy = np.meshgrid(gx, gy)
        dist = np.sqrt((gxx - cx) ** 2 + (gyy - cy) ** 2)
        z = np.ma.masked_where(dist > thr, np.exp(-dist / thr))
        ax.pcolormesh(gxx, gyy, z, cmap="YlOrRd", alpha=0.15, shading="auto")
        ax.add_patch(Circle((cx, cy), thr, fill=False, color="peachpuff",
                            linestyle="--"))
        ax.add_patch(Circle(chain_obs[k], pursuer_radius, color="tab:red",
                            alpha=0.6))
        ax.set_title(f"step {k + 1}/{n}")

    anim = FuncAnimation(fig, frame, frames=n, interval=1000 // fps)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)


def _draw_3d_scene(ax, trajs, box_centers, box_sizes,
                   sphere_centers=None, sphere_radii=None,
                   start=None, goal=None) -> None:
    import itertools
    for c, s in zip(np.asarray(box_centers), np.asarray(box_sizes)):
        # wireframe box
        r = [[-1, 1]] * 3
        corners = np.array(list(itertools.product(*r))) * np.asarray(s) / 2 + c
        for i, j in itertools.combinations(range(8), 2):
            if np.sum(np.abs(corners[i] - corners[j]) > 1e-9) == 1:
                ax.plot(*zip(corners[i], corners[j]), color="gray", lw=0.5)
    if sphere_centers is not None:
        ax.scatter(*np.asarray(sphere_centers).T, s=np.asarray(sphere_radii) * 2000,
                   c="tab:red", alpha=0.3)
    for tr in np.asarray(trajs):
        ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], lw=1.5)
    if start is not None:
        ax.scatter(*start[:3], c="g", s=60)
    if goal is not None:
        ax.scatter(*goal[:3], c="r", s=80, marker="*")
    ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(-1, 1)


def save_3d_plot(path: str, trajs: np.ndarray, box_centers, box_sizes,
                 sphere_centers=None, sphere_radii=None,
                 start=None, goal=None) -> None:
    """3-D scene render (ref inference3d.py:158-381, still frame)."""
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    _draw_3d_scene(ax, trajs, box_centers, box_sizes, sphere_centers,
                   sphere_radii, start, goal)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_3d_gif(path: str, trajs: np.ndarray, box_centers, box_sizes,
                sphere_centers=None, sphere_radii=None,
                start=None, goal=None, n_frames: int = 36,
                fps: int = 9, elev: float = 25.0) -> None:
    """Rotating 3-D render — parity with the reference's azimuth-sweep GIF
    (ref inference3d.py:339-369: elev=25, azimuth swept over 360 deg,
    PillowWriter; the reference uses 201 frames at 20 fps — fewer frames here
    by default to keep the artifact small, override `n_frames`/`fps` for the
    exact look)."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    _draw_3d_scene(ax, trajs, box_centers, box_sizes, sphere_centers,
                   sphere_radii, start, goal)

    def frame(k):
        ax.view_init(elev=elev, azim=360.0 * k / n_frames)
        return []

    anim = FuncAnimation(fig, frame, frames=n_frames, interval=1000 // fps)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)

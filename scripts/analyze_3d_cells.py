#!/usr/bin/env python
"""Failure-cell analysis for the 3-D scenes×contexts grid (VERDICT round-3
item: attribute compose failures to "free space absent" vs "model failed").

For every failing cell in a results JSON (needs per-row start/goal — rows
written by scripts/inference3d.py from round 3 on), rasterize the scene
(union of both obstacle sets under --compose-dataset) to an occupancy grid
and run BFS: if no grid path exists the cell is IMPOSSIBLE (the metric is
measuring the scene, not the model); if one exists the model failed a
plannable cell.

  python scripts/analyze_3d_cells.py --results eval_results_3d_grid_compose.json \
      --dataset dataset/EnvSmall3D_v2 --compose-dataset dataset/EnvSmall3D_v2b
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.data.generator import _occupancy_grid_3d


def grid_path_exists(occ: np.ndarray, start, goal) -> bool:
    """6-connected BFS on the free cells of `occ` ([-1,1]^3 raster)."""
    n = occ.shape[0]

    def cell(p):
        return tuple(np.clip(((np.asarray(p) + 1) / 2 * (n - 1)).round()
                             .astype(int), 0, n - 1))

    s, g = cell(start), cell(goal)
    free = ~occ
    # endpoints sampled in free space can rasterize into an occupied cell at
    # coarse resolution; snap to the nearest free cell within a 1-cell shell
    def snap(c):
        if free[c]:
            return c
        for d in np.ndindex(3, 3, 3):
            cc = tuple(np.clip(np.asarray(c) + np.asarray(d) - 1, 0, n - 1))
            if free[cc]:
                return cc
        return None

    s, g = snap(s), snap(g)
    if s is None or g is None:
        return False
    seen = np.zeros_like(free)
    seen[s] = True
    dq = collections.deque([s])
    while dq:
        c = dq.popleft()
        if c == g:
            return True
        for ax in range(3):
            for dd in (-1, 1):
                nc = list(c)
                nc[ax] += dd
                if 0 <= nc[ax] < n:
                    nc = tuple(nc)
                    if free[nc] and not seen[nc]:
                        seen[nc] = True
                        dq.append(nc)
    return False


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--compose-dataset", default=None)
    p.add_argument("--n-cells", type=int, default=48)
    p.add_argument("--margin", type=float, default=0.0,
                   help="obstacle inflation for the raster (0 = the metric's "
                        "own geometry)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    d = json.load(open(args.results))
    if "per_env" not in d:
        raise SystemExit(
            f"{args.results} has no per_env section — this analysis needs a "
            "scenes×contexts grid JSON (inference3d.py --max-envs/"
            "--n-contexts), not the single-demo eval")
    ds = TrajectoryDataset(args.dataset, include_velocity=True)
    other = (TrajectoryDataset(args.compose_dataset, include_velocity=True)
             if args.compose_dataset else None)

    rows = []
    for tid, env in d["per_env"].items():
        meta = ds.task_metadata[int(tid)]
        idx = int(ds.map_task_id_to_trajectories_id[int(tid)][0])
        bc = np.asarray(ds.box_centers[idx])
        bs = np.asarray(ds.box_sizes[idx])
        sc = np.asarray(meta.get("sphere_centers") or np.zeros((0, 3)))
        sr = np.asarray(meta.get("sphere_radii") or np.zeros((0,))).reshape(-1)
        if other is not None:
            om = other.task_metadata[0]
            bc = np.concatenate([bc, np.asarray(other.box_centers[0])])
            bs = np.concatenate([bs, np.asarray(other.box_sizes[0])])
            if om.get("sphere_centers") is not None:
                sc = np.concatenate([sc, np.asarray(om["sphere_centers"])])
                sr = np.concatenate([sr,
                                     np.asarray(om["sphere_radii"]).reshape(-1)])
        occ = _occupancy_grid_3d(bc, bs, sc, sr, n_cells=args.n_cells,
                                 margin=args.margin)
        free_frac = float((~occ).mean())
        for ci, row in enumerate(env["contexts"]):
            if row["success"]:
                continue
            if "start" not in row:
                print(f"env {tid} ctx {ci}: FAILING but no start/goal in the "
                      f"JSON (pre-round-3 results file) — rerun the eval")
                continue
            plannable = grid_path_exists(occ, row["start"], row["goal"])
            rows.append({"env": tid, "context": ci, "plannable": plannable,
                         "free_fraction": free_frac,
                         "collision_intensity_pct":
                             row["collision_intensity_pct"]})
            print(f"env {tid} ctx {ci}: plannable={plannable} "
                  f"free_frac={free_frac:.3f} "
                  f"ci={row['collision_intensity_pct']:.1f}%")
    n_pl = sum(r["plannable"] for r in rows)
    summary = {"n_failing": len(rows), "n_plannable": n_pl,
               "n_impossible": len(rows) - n_pl, "rows": rows}
    print(f"\n{len(rows)} failing cells analyzed: {n_pl} plannable "
          f"(model failures), {len(rows) - n_pl} impossible (no free path)")
    if args.out:
        json.dump(summary, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

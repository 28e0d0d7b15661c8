#!/usr/bin/env python
"""Serving-path latency benchmark (VERDICT round-3 item 7).

Starts the real HTTP planning service in-process (static /plan + dynamic
/episode) and measures what a caller actually pays:

  * /plan sequential p50      — cold-call latency (compute + host-sync RTT)
  * /plan 2-deep pipelined    — marginal latency with two concurrent callers
                                (dispatch under lock, sync outside: request
                                k's RTT overlaps request k+1's dispatch)
  * /episode/step p50         — closed-loop replan tick end to end

  python scripts/bench_serve.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v2.npz \
      --dynamic-dataset dataset/EnvPredator_v2 \
      --dynamic-checkpoints artifacts/weights/predator_v2_60k.npz
"""
import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _http_post(port, path, payload, timeout=120):
    # timed calls keep a tight timeout; compile-bearing warm calls (first
    # /plan, /episode/begin + first step) pass 30 min — the dynamic episode
    # path's first compile exceeds 120 s on the tunneled chip (measured
    # round 4: bench_serve died here with the flat default)
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    body = json.dumps(payload)
    conn.request("POST", path, body,
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    if r.status != 200:
        raise RuntimeError(f"{path} -> {r.status}: {out}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="dataset/EnvSimple2dquant_v2")
    p.add_argument("--checkpoints",
                   default="artifacts/weights/simple2d_v2.npz")
    p.add_argument("--dynamic-dataset", default="dataset/EnvPredator_v2")
    p.add_argument("--dynamic-checkpoints",
                   default="artifacts/weights/predator_v2_60k.npz")
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--port", type=int, default=8561)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.guidance.apf import APFParams
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    from ramp_tpu.serve import (ControllerService, PlanningService,
                                make_http_server)
    from ramp_tpu.utils.checkpoints import load_planner_params

    ds = TrajectoryDataset(args.dataset, include_velocity=True)
    n_obs, n_pts = ds.obstacle_points.shape[1:3]
    cfg = StaticPlannerConfig(horizon=ds.horizon, state_dim=ds.state_dim,
                              use_apf=True, apf=APFParams())
    planner = StaticPlanner(cfg)
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=0)
    service = PlanningService(planner, params, ds.normalizer,
                              default_n_samples=args.n_samples)

    dds = TrajectoryDataset(args.dynamic_dataset, include_velocity=True)
    dn_obs, dn_pts = dds.obstacle_points.shape[1:3]
    dcfg = DynamicPlannerConfig(horizon=dds.horizon, state_dim=dds.state_dim)
    dplanner = DynamicPlanner(dcfg)
    dparams = load_planner_params(dplanner, args.dynamic_checkpoints,
                                  dn_obs, dn_pts, seed=0)
    controller = ControllerService(dplanner, dparams, dds.normalizer)

    server = make_http_server(service, port=args.port, controller=controller)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    idx = int(ds.map_task_id_to_trajectories_id[0][0])
    hc = ds.hard_conds(idx)
    req = {"obstacle_points": np.asarray(ds.obstacle_points[idx]).tolist(),
           "start": np.asarray(
               ds.normalizer.unnormalize(hc["start"])).tolist(),
           "goal": np.asarray(ds.normalizer.unnormalize(hc["goal"])).tolist(),
           "n_samples": args.n_samples}

    # warm the jit before timing
    _http_post(args.port, "/plan", req, timeout=1800)

    # ------------------------------------------------- sequential /plan p50
    seq, phases = [], {k: [] for k in ("t_plan_ms", "t_dispatch_ms",
                                       "t_fetch_ms", "t_serialize_ms",
                                       "t_queue_ms")}
    for i in range(args.iters):
        t0 = time.perf_counter()
        r = _http_post(args.port, "/plan", dict(req, seed=i))
        seq.append(time.perf_counter() - t0)
        for k in phases:
            if k in r:
                phases[k].append(r[k])
    seq_p50 = float(np.median(seq) * 1e3)
    phase_p50 = {k: round(float(np.median(v)), 2)
                 for k, v in phases.items() if v}

    # --------------------------------------- sequential /plan p50, b64 body
    seq_b64 = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        _http_post(args.port, "/plan",
                   dict(req, seed=i, response_format="b64"))
        seq_b64.append(time.perf_counter() - t0)
    seq_b64_p50 = float(np.median(seq_b64) * 1e3)

    # --------------------------------------- 2-deep pipelined /plan marginal
    n_workers, per_worker = 2, args.iters
    lat, errs = [], []

    def worker(wid):
        try:
            for i in range(per_worker):
                t0 = time.perf_counter()
                _http_post(args.port, "/plan", dict(req, seed=100 + wid * 50 + i))
                lat.append(time.perf_counter() - t0)
        except Exception as e:  # surface failures instead of hanging silently
            errs.append(str(e))

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker, args=(w,)) for w in range(n_workers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError(errs[0])
    pipe_marginal = float(wall / (n_workers * per_worker) * 1e3)
    pipe_p50 = float(np.median(lat) * 1e3)

    # ------------------------------------------------- /episode/step p50
    didx = 0
    dhc = dds.hard_conds(didx)
    ep = _http_post(args.port, "/episode/begin", {
        "obstacle_points": np.asarray(dds.obstacle_points[didx]).tolist(),
        "start": np.asarray(
            dds.normalizer.unnormalize(dhc["start"])).tolist(),
        "goal": np.asarray(dds.normalizer.unnormalize(dhc["goal"])).tolist(),
        "seed": 0}, timeout=1800)
    eid = ep["episode_id"]
    pursuer = np.asarray([0.0, 0.8])
    _http_post(args.port, "/episode/step", {"episode_id": eid,
                                            "pursuer": pursuer.tolist()},
               timeout=1800)
    steps = []
    for k in range(30):
        pursuer = pursuer + np.asarray([0.0, -0.01])
        t0 = time.perf_counter()
        _http_post(args.port, "/episode/step", {"episode_id": eid,
                                                "pursuer": pursuer.tolist()})
        steps.append(time.perf_counter() - t0)
    step_p50 = float(np.median(steps) * 1e3)
    _http_post(args.port, "/episode/end", {"episode_id": eid})

    out = {"plan_sequential_p50_ms": round(seq_p50, 2),
           "plan_sequential_b64_p50_ms": round(seq_b64_p50, 2),
           "plan_phase_p50_ms": phase_p50,
           "plan_pipelined2_marginal_ms": round(pipe_marginal, 2),
           "plan_pipelined2_p50_ms": round(pipe_p50, 2),
           "episode_step_p50_ms": round(step_p50, 2),
           "n_samples": args.n_samples,
           "device": str(jax.devices()[0])}
    print(json.dumps(out))
    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)
    server.shutdown()


if __name__ == "__main__":
    main()

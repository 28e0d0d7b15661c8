#!/usr/bin/env python
"""Train the energy-based diffusion planner (SPMD data-parallel).

Replaces `scripts/train/trainddp.py`: no process spawn, no NCCL — one program
sharded over every visible device via the mesh. Multi-host: launch the same
script per host with --coordinator/--num-processes/--process-id.

  python scripts/train.py --dataset dataset/EnvSimple2dquant \
      --checkpoints checkpoints/simple2d --steps 100000
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging

import jax

from ramp_tpu.core.schedules import make_schedule
from ramp_tpu.data.dataset import TrajectoryDataset, batch_iterator
from ramp_tpu.parallel.mesh import initialize_distributed, make_mesh
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
from ramp_tpu.train.state import TrainConfig
from ramp_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch (default: 16 per device, ref trainddp.py:225)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=101)
    p.add_argument("--threed", action="store_true", help="train the 3-D model")
    p.add_argument("--family", default=None,
                   choices=["static", "dynamic", "3d"],
                   help="planner family (mirrors the reference's '3d' "
                        "switch, trainddp.py:112-114). 'dynamic' trains the "
                        "same score model as 'static' — the closed-loop "
                        "machinery is inference-time only — over a "
                        "predator dataset (horizon 48; pursuer-aware "
                        "[O+1]-row clouds train the pursuer-conditioned "
                        "variant). '3d' is equivalent to --threed.")
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--n-diffusion-steps", type=int, default=None)
    p.add_argument("--unet-dim", type=int, default=32,
                   help="unet_input_dim (ref trainddp.py:222)")
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1],
                   help="UNET_DIM_MULTS key (ref UnetInference.py:13)")
    p.add_argument("--log-file", default=None)
    p.add_argument("--tensorboard-dir", default=None,
                   help="mirror summary scalars to TensorBoard event files "
                        "(ref rank-0 tensorboardX, trainerddp/trainer.py:"
                        "168-197); JSONL --log-file stays the primary log")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--init-weights", default=None,
                   help="initialize model params from an exported .npz weight "
                        "file, a reference .pth state_dict, or another orbax "
                        "checkpoint dir (fine-tuning). Only used when the "
                        "--checkpoints dir has no checkpoint to resume from — "
                        "a true resume always wins.")
    p.add_argument("--normalizer-dataset", default=None,
                   help="fit the trajectory normalizer on this dataset root "
                        "instead of the (possibly multi-root) training set — "
                        "keeps train/eval normalization spaces identical when "
                        "augmenting training data with extra scene roots")
    p.add_argument("--host-pipeline", action="store_true",
                   help="stream batches from the host instead of the "
                        "device-resident multi-step path")
    p.add_argument("--steps-per-dispatch", type=int, default=100)
    # multi-host
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="override the JAX backend (e.g. cpu for debugging)")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    logging.basicConfig(level=logging.INFO)
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = make_mesh()
    n_dev = mesh.devices.size

    dataset = TrajectoryDataset(args.dataset, include_velocity=True,
                                normalizer_from=args.normalizer_dataset)
    horizon = args.horizon or dataset.horizon

    if args.family == "3d":
        args.threed = True
    if args.family == "dynamic" and dataset.state_dim != 4:
        p.error("--family dynamic expects a 2-D predator dataset "
                "(state_dim 4)")
    if args.threed:
        cfg3 = Planner3DConfig(horizon=horizon, state_dim=dataset.state_dim,
                               n_diffusion_steps=args.n_diffusion_steps or 25,
                               unet_input_dim=args.unet_dim,
                               unet_dim_mults_option=args.dim_mults_option)
        planner = Planner3D(cfg3)
    else:
        cfg = StaticPlannerConfig(horizon=horizon, state_dim=dataset.state_dim,
                                  n_diffusion_steps=args.n_diffusion_steps or 100,
                                  unet_input_dim=args.unet_dim,
                                  unet_dim_mults_option=args.dim_mults_option)
        planner = StaticPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    schedule = planner.schedule

    def _has_resumable_checkpoint() -> bool:
        d = args.checkpoints
        if args.no_resume or not d or not os.path.isdir(d):
            return False
        return any(s.isdigit() for s in os.listdir(d))

    if args.init_weights and not _has_resumable_checkpoint():
        from ramp_tpu.utils.checkpoints import load_planner_params
        params = load_planner_params(planner, args.init_weights, n_obs, n_pts,
                                     seed=args.seed)
        print(f"initialized params from {args.init_weights}")
    else:
        if args.init_weights:
            print(f"--init-weights {args.init_weights} skipped: "
                  f"{args.checkpoints} has a checkpoint to resume from")
        params = planner.init_params(jax.random.PRNGKey(args.seed), n_obs, n_pts)

    batch_size = args.batch_size or 16 * n_dev
    tcfg = TrainConfig(lr=args.lr, batch_size=batch_size, seed=args.seed)
    trainer = Trainer(planner.unet.apply, planner.encoder.apply, schedule,
                      tcfg, checkpoint_dir=args.checkpoints, mesh=mesh,
                      tensorboard_dir=args.tensorboard_dir)
    if args.host_pipeline:
        data = batch_iterator(dataset, batch_size, seed=args.seed)
        state = trainer.fit(params, data, num_steps=args.steps,
                            log_file=args.log_file, resume=not args.no_resume)
    else:
        state = trainer.fit_device_resident(
            params, dataset, num_steps=args.steps,
            steps_per_dispatch=args.steps_per_dispatch,
            log_file=args.log_file, resume=not args.no_resume)
    print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
    main()

from ramp_tpu.data.dataset import TrajectoryDataset, batch_iterator, load_task_dir
from ramp_tpu.data.generator import generate_dataset, plan_trajectories_for_scene

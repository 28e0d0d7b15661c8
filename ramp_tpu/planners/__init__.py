from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig

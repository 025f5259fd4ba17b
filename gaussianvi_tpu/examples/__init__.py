from .barfoot_1d import barfoot_cost, build_barfoot_1d, run_barfoot_1d
from .chain_estimation import build_chain_estimation, run_chain_estimation
from .ltv_estimation import build_ltv_estimation, run_ltv_estimation
from .planar_planning import build_planar_planning, run_planar_planning
from .arm_planning import build_arm_planning, run_arm_planning
from .quadrotor_planning import build_quadrotor_planning, run_quadrotor_planning

__all__ = [
    "barfoot_cost", "build_barfoot_1d", "run_barfoot_1d",
    "build_chain_estimation", "run_chain_estimation",
    "build_ltv_estimation", "run_ltv_estimation",
    "build_planar_planning", "run_planar_planning",
    "build_arm_planning", "run_arm_planning",
    "build_quadrotor_planning", "run_quadrotor_planning",
]

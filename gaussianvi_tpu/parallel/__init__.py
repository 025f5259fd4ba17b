from .restarts import optimize_restarts, perturb_inits
from .sharding import (
    make_mesh,
    sharded_ngd_step,
    stack_problems,
)

__all__ = [
    "make_mesh", "sharded_ngd_step", "stack_problems",
    "optimize_restarts", "perturb_inits",
]

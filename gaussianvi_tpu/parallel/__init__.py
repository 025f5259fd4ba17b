from .sharding import (
    make_mesh,
    sharded_ngd_step,
    stack_problems,
)

__all__ = ["make_mesh", "sharded_ngd_step", "stack_problems"]

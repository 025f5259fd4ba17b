from .checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    load_loop_state,
    save_checkpoint,
    save_checkpoint_orbax,
)
from .profiling import Timer, time_fn, trace
from .recorder import (
    cost_map_1d,
    history_to_arrays,
    save_costmap,
    save_factor_expectations,
    save_history_csv,
)

__all__ = [
    "save_checkpoint", "load_checkpoint", "load_loop_state",
    "save_checkpoint_orbax", "load_checkpoint_orbax",
    "Timer", "time_fn", "trace",
    "history_to_arrays", "save_history_csv", "cost_map_1d", "save_costmap",
    "save_factor_expectations",
]

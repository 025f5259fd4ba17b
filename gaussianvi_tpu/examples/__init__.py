from .barfoot_1d import barfoot_cost, build_barfoot_1d, run_barfoot_1d

__all__ = ["barfoot_cost", "build_barfoot_1d", "run_barfoot_1d"]

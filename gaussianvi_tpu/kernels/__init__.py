from .fused_moments import fused_moments, make_batched_cost

__all__ = ["fused_moments", "make_batched_cost"]

"""Kernel VMEM budget scaling.

The fused-kernel row budgets (``fused_trials._trials_budget``,
``fused_gradient._MAX_ROW_ELEMS_GRAD``) are calibrated against v5e's
PHYSICAL ~128MB VMEM (PERF.md sections 20/27) — well above the 16MB
default scoped-vmem cap some devices/runtimes enforce.  On such a target a
shape the static eligibility check admits would fail at Pallas compile time
instead of declining the fused path.  ``GVI_KERNEL_VMEM_SCALE`` (a float,
default 1.0) scales every physical-calibrated budget: e.g. ``0.18`` brings
the 90k gradient budget back to the old 16MB-scoped calibration (~16k),
restoring the conservative decline-to-separate-path behavior.
"""

from __future__ import annotations

import functools
import os


@functools.cache
def vmem_scale() -> float:
    """Budget multiplier from ``GVI_KERNEL_VMEM_SCALE`` (cached: budgets
    feed static kernel layouts, so mid-process changes must not reshuffle
    already-traced programs)."""
    try:
        return float(os.environ.get("GVI_KERNEL_VMEM_SCALE", "1.0"))
    except ValueError:
        return 1.0


def scaled(budget: int) -> int:
    return max(int(budget * vmem_scale()), 1)

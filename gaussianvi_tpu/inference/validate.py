"""Factor-graph input validation.

The reference fails obscurely on malformed factor wiring (raw Eigen asserts
or silent block overwrites); here `validate_graph` checks structure up front
with actionable errors.  Pure host-side — call before jitting.
"""

from __future__ import annotations

import jax
import numpy as np

from .graph import FactorGraph, GaussianState


def validate_graph(graph: FactorGraph, state: GaussianState | None = None):
    """Raise ValueError on inconsistent factor wiring."""
    n, s = graph.num_states, graph.state_dim
    for kind, batches in (("nonlinear", graph.nonlinear),
                          ("linear", graph.linear)):
        for idx, fb in enumerate(batches):
            name = f"{kind}[{idx}]"
            starts = np.asarray(fb.start)
            if starts.ndim != 1:
                raise ValueError(f"{name}: start must be 1-D, got {starts.shape}")
            if starts.size and (starts.min() < 0 or starts.max() > n - fb.nb):
                raise ValueError(
                    f"{name}: start indices must lie in [0, {n - fb.nb}] "
                    f"for nb={fb.nb}, got range "
                    f"[{starts.min()}, {starts.max()}]"
                )
            if fb.slice_offset is not None:
                # gather/scatter ignore `start` entirely when slice_offset is
                # set (inference/graph.py lowers to static slices), so an
                # inconsistent hand-built batch would silently touch the
                # wrong state blocks
                expect = fb.slice_offset + np.arange(starts.size)
                if not np.array_equal(starts, expect):
                    raise ValueError(
                        f"{name}: slice_offset={fb.slice_offset} requires "
                        f"start == slice_offset + arange(K); got {starts}"
                    )
                if starts.size and (
                    fb.slice_offset < 0
                    or fb.slice_offset + starts.size - 1 > n - fb.nb
                ):
                    raise ValueError(
                        f"{name}: slice_offset range "
                        f"[{fb.slice_offset}, "
                        f"{fb.slice_offset + starts.size - 1}] exceeds "
                        f"[0, {n - fb.nb}] for nb={fb.nb}"
                    )
            d = fb.nb * s
            if kind == "nonlinear":
                if fb.nodes.shape[-1] != d:
                    raise ValueError(
                        f"{name}: quadrature dim {fb.nodes.shape[-1]} != "
                        f"nb*state_dim = {d}"
                    )
                if fb.nodes.shape[0] != fb.weights.shape[0]:
                    raise ValueError(
                        f"{name}: nodes/weights length mismatch "
                        f"{fb.nodes.shape[0]} vs {fb.weights.shape[0]}"
                    )
                k = starts.shape[0]
                for leaf in jax.tree.leaves(fb.params):
                    if leaf.shape[:1] != (k,):
                        raise ValueError(
                            f"{name}: param leaf leading axis "
                            f"{leaf.shape[:1]} != num factors ({k},)"
                        )
            else:
                if fb.lam.shape[-1] != d:
                    raise ValueError(
                        f"{name}: Lam trailing dim {fb.lam.shape[-1]} != "
                        f"nb*state_dim = {d}"
                    )
    if state is not None:
        if state.mu.shape != (n, s):
            raise ValueError(
                f"state.mu shape {state.mu.shape} != (num_states, state_dim)"
                f" = ({n}, {s})"
            )
        if state.precision.diag.shape != (n, s, s):
            raise ValueError(
                f"precision.diag shape {state.precision.diag.shape} != "
                f"({n}, {s}, {s})"
            )
        if state.precision.off.shape != (max(n - 1, 0), s, s):
            raise ValueError(
                f"precision.off shape {state.precision.off.shape} != "
                f"({max(n - 1, 0)}, {s}, {s})"
            )

"""The two line-search strategies must select identical iterates.

``linesearch="batched"`` evaluates every trial of the schedule as one
vmapped computation; ``linesearch="seq"`` is the reference's sequential
shrink loop (gvibase/GVI-GH-impl.h:76-118) as a ``lax.while_loop`` that
stops at the first decreasing trial.  Both walk the same schedule and
accept the same trial, so full trajectories must agree.
"""

import numpy as np
import pytest

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.optimize import optimize


def _run(method, **cfg):
    graph, init, _ = build_chain_estimation(
        num_states=8, dim_x=1, gh_degree=4, seed=3
    )
    final, hist = optimize(graph, init, GVIConfig(**cfg), method=method)
    return final, hist


@pytest.mark.parametrize("method", ["ngd", "prox"])
def test_seq_matches_batched(method):
    kw = dict(niters=8, niters_lowtemp=8, step_size_base=0.9)
    f_b, h_b = _run(method, linesearch="batched", **kw)
    f_s, h_s = _run(method, linesearch="seq", **kw)
    np.testing.assert_array_equal(
        np.asarray(h_b.accepted_step), np.asarray(h_s.accepted_step)
    )
    np.testing.assert_allclose(
        np.asarray(h_b.cost), np.asarray(h_s.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f_b.mu), np.asarray(f_s.mu), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f_b.precision.diag), np.asarray(f_s.precision.diag),
        rtol=1e-12, atol=1e-12,
    )


def test_seq_matches_batched_exhausted_search():
    # a hopeless step size exhausts the search: NGD escalates temperature
    # then freezes — the strategies must agree on that trajectory too
    kw = dict(niters=6, niters_lowtemp=2, step_size_base=1e6,
              niters_backtrack=3)
    f_b, h_b = _run("ngd", linesearch="batched", **kw)
    f_s, h_s = _run("ngd", linesearch="seq", **kw)
    np.testing.assert_array_equal(
        np.asarray(h_b.accepted_step), np.asarray(h_s.accepted_step)
    )
    np.testing.assert_allclose(
        np.asarray(h_b.cost), np.asarray(h_s.cost), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f_b.mu), np.asarray(f_s.mu), rtol=1e-12, atol=1e-12
    )


def test_unknown_linesearch_rejected():
    with pytest.raises(ValueError, match="linesearch"):
        _run("ngd", niters=1, linesearch="nope")

"""Graph validation diagnostics."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.examples import build_barfoot_1d, build_chain_estimation
from gaussianvi_tpu.factors import make_nonlinear_batch
from gaussianvi_tpu.inference import FactorGraph
from gaussianvi_tpu.inference.validate import validate_graph


class TestValidateGraph:
    def test_valid_graphs_pass(self):
        for builder in (build_barfoot_1d, build_chain_estimation):
            out = builder()
            graph, state = out[0], out[1]
            validate_graph(graph, state)

    def test_bad_start_index(self):
        fb = make_nonlinear_batch(
            lambda x, p: jnp.sum(x**2), [5], state_dim=1, gh_degree=3
        )
        graph = FactorGraph(num_states=3, state_dim=1, nonlinear=(fb,))
        with pytest.raises(ValueError, match="start indices"):
            validate_graph(graph)

    def test_bad_param_axis(self):
        fb = make_nonlinear_batch(
            lambda x, p: jnp.sum(x**2) * p, [0, 1], state_dim=1,
            gh_degree=3, params=jnp.ones(3),
        )
        graph = FactorGraph(num_states=2, state_dim=1, nonlinear=(fb,))
        with pytest.raises(ValueError, match="param leaf leading axis"):
            validate_graph(graph)

    def test_quadrature_dim_mismatch(self):
        fb = make_nonlinear_batch(
            lambda x, p: jnp.sum(x**2), [0], state_dim=2, nb=1, gh_degree=3
        )
        graph = FactorGraph(num_states=2, state_dim=4, nonlinear=(fb,))
        with pytest.raises(ValueError, match="quadrature dim"):
            validate_graph(graph)

    def test_inconsistent_slice_offset(self):
        from dataclasses import replace

        fb = make_nonlinear_batch(
            lambda x, p: jnp.sum(x**2), [0, 1, 2], state_dim=1, gh_degree=3
        )
        assert fb.slice_offset == 0
        # start says [0,1,2] but slice_offset claims the batch begins at 1:
        # gather/scatter would silently read/write the wrong state blocks
        bad = replace(fb, slice_offset=1)
        graph = FactorGraph(num_states=4, state_dim=1, nonlinear=(bad,))
        with pytest.raises(ValueError, match="slice_offset"):
            validate_graph(graph)

    def test_slice_offset_out_of_range(self):
        from dataclasses import replace

        fb = make_nonlinear_batch(
            lambda x, p: jnp.sum(x**2), [2, 3, 4], state_dim=1, gh_degree=3
        )
        bad = replace(fb, slice_offset=2)
        graph = FactorGraph(num_states=4, state_dim=1, nonlinear=(bad,))
        with pytest.raises(ValueError, match="start indices|slice_offset"):
            validate_graph(graph)

"""Planar motion planning end-to-end: the VIMP-style application workload."""

import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.examples.planar_planning import run_planar_planning


class TestPlanarPlanning:
    def test_trajectory_avoids_obstacle(self):
        final, hist, sdf = run_planar_planning(num_states=20)
        pos = np.asarray(final.mu[:, :2])
        sd = np.asarray(sdf.signed_distance(jnp.asarray(pos)))
        # straight-line init collides (sd < 0); converged plan must clear
        assert sd.min() > 0.0
        # endpoints anchored
        np.testing.assert_allclose(pos[0], [1.0, 1.0], atol=0.05)
        np.testing.assert_allclose(pos[-1], [8.5, 8.5], atol=0.05)
        # cost strictly improved
        cost = np.asarray(hist.cost)
        assert cost[-1] < cost[0] / 10

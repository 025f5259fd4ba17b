"""Planar quadrotor planning (CudaOperation_Quad model) end-to-end."""

import jax
import numpy as np

from gaussianvi_tpu.examples.quadrotor_planning import run_quadrotor_planning
from gaussianvi_tpu.factors.robots import planar_quad_balls


class TestQuadrotorPlanning:
    def test_body_clears_obstacle(self):
        final, hist, sdf = run_quadrotor_planning(num_states=12)
        cost = np.asarray(hist.cost)
        assert np.isfinite(cost).all()
        assert cost[-1] < cost[0] / 10
        balls = jax.vmap(
            lambda x: planar_quad_balls(x, 5, 5.0, 1.0)
        )(final.mu)
        sd = np.asarray(sdf.signed_distance(balls.reshape(-1, 2)))
        assert sd.min() > 0.0

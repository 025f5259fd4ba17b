"""7-DOF arm planning end-to-end (CudaOperation_3dArm equivalent).

Obstacle avoidance here is a soft cost (hinge loss with clearance margin
epsilon), so the converged trajectory trades clearance against the GP prior
— the check is strong cost reduction and near-clearance, not a hard
constraint (same semantics as the reference's planner).
"""

import jax
import numpy as np

from gaussianvi_tpu.examples.arm_planning import run_arm_planning


class TestArmPlanning:
    def test_plans_and_clears(self):
        final, hist, (fk, sdf) = run_arm_planning(
            num_states=8, cost_sigma=200.0
        )
        cost = np.asarray(hist.cost)
        assert np.isfinite(cost).all()
        assert cost[-1] < cost[0] / 5
        centers = jax.vmap(lambda q: fk.sphere_centers(q[:7]))(final.mu)
        sd = np.asarray(sdf.signed_distance(centers.reshape(-1, 3)))
        # sphere radius 0.05, margin epsilon 0.1: converged plan must at
        # worst graze (soft constraint), starting from deep penetration
        assert sd.min() > -0.05

    def test_fk_shapes(self):
        from gaussianvi_tpu.examples.arm_planning import wam_fk
        import jax.numpy as jnp

        fk = wam_fk()
        centers = fk.sphere_centers(jnp.zeros(7))
        assert centers.shape == (7, 3)
        assert np.isfinite(np.asarray(centers)).all()

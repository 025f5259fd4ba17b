"""Patch-based SDF lanes path (factors/robots.py make_patch_*).

The lanes quadrature kernel cannot gather per-lane from an HBM field
(Mosaic has no per-lane dynamic gather), so the planning factors pre-gather
a local window around each factor's marginal mean (``lanes_prep``, XLA
side) and interpolate in-kernel with separable hat sums.  These tests pin
the exactness claim: for points whose interpolation corners lie inside the
window, the hat sum equals the reference bilinear/trilinear lookup.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from gaussianvi_tpu.examples.planar_planning import (
    block_obstacle_sdf,
    build_planar_planning,
)
from gaussianvi_tpu.factors import moments as mm
from gaussianvi_tpu.factors.robots import (
    make_patch_cost_2d,
    make_patch_cost_3d,
    make_patch_prep_2d,
    make_patch_prep_3d,
    make_planar_obstacle_factor,
    make_point3d_obstacle_factor,
)
from gaussianvi_tpu.factors.sdf import SDF3D, hinge_obstacle_cost
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.optimize import optimize


@pytest.fixture(scope="module")
def sdf():
    return block_obstacle_sdf()


def _sdf3d():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((12, 14, 16)) * 0.3 + 1.0
    return SDF3D(
        jnp.asarray(data), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.5)
    )


class TestPatchInterpolation:
    def test_2d_hat_sum_matches_bilinear(self, sdf):
        patch = 8
        rng = np.random.default_rng(0)
        k = 6
        centers = jnp.asarray(rng.uniform(1.0, 9.0, (k, 2)))
        mu_k = jnp.concatenate(
            [centers, jnp.zeros((k, 2))], axis=-1
        )
        prep = make_patch_prep_2d(sdf, patch)
        patches, r0, c0 = prep(mu_k)
        cost = make_patch_cost_2d(sdf, patch, 0.4, 0.2, 5.0)
        # sample points well inside the window (<= 2 cells off center)
        for i in range(k):
            pts = centers[i] + jnp.asarray(
                rng.uniform(-2, 2, (20, 2))
            ) * float(sdf.cell_size)
            got = cost(
                (pts[:, 0], pts[:, 1], jnp.zeros(20), jnp.zeros(20)),
                patches[i], r0[i], c0[i],
            )
            sd = sdf.signed_distance(pts)
            want = hinge_obstacle_cost(sd[:, None], 0.4, 0.2, 5.0)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_3d_hat_sum_matches_trilinear(self):
        sdf3 = _sdf3d()
        patch = 6
        rng = np.random.default_rng(1)
        k = 5
        centers = jnp.asarray(rng.uniform(1.5, 4.5, (k, 3)))
        mu_k = jnp.concatenate([centers, jnp.zeros((k, 3))], axis=-1)
        prep = make_patch_prep_3d(sdf3, patch)
        patches, z0, r0, c0 = prep(mu_k)
        cost = make_patch_cost_3d(sdf3, patch, 0.4, 0.2, 5.0)
        for i in range(k):
            pts = centers[i] + jnp.asarray(
                rng.uniform(-0.8, 0.8, (15, 3))
            )
            got = cost(
                (pts[:, 0], pts[:, 1], pts[:, 2],
                 jnp.zeros(15), jnp.zeros(15), jnp.zeros(15)),
                patches[i], z0[i], r0[i], c0[i],
            )
            sd = sdf3.signed_distance(pts)
            want = hinge_obstacle_cost(sd[:, None], 0.4, 0.2, 5.0)
            np.testing.assert_allclose(got, want, atol=1e-12)


class TestBatchDispatch:
    def test_batch_phi_lanes_matches_xla(self, sdf):
        fb = make_planar_obstacle_factor(
            sdf, np.arange(10), state_dim=4, cost_sigma=5.0, epsilon=0.4,
            radius=0.2, gh_degree=3, patch_size=16,
        )
        assert fb.lanes_cost is not None and fb.lanes_prep is not None
        rng = np.random.default_rng(2)
        mu_k = jnp.asarray(
            np.concatenate(
                [rng.uniform(2.0, 8.0, (10, 2)), rng.standard_normal((10, 2))],
                axis=1,
            )
        )
        # tight marginals: sigma points stay inside the 16-cell window
        cov_k = jnp.broadcast_to(0.005 * jnp.eye(4), (10, 4, 4))
        ref = mm.batch_phi(fb, mu_k, cov_k, None, "xla")
        got = mm.batch_phi(fb, mu_k, cov_k, None, "lanes")
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)

    def test_batch_moments_lanes_matches_xla_3d(self):
        sdf3 = _sdf3d()
        fb = make_point3d_obstacle_factor(
            sdf3, np.arange(6), state_dim=6, cost_sigma=5.0, epsilon=0.4,
            radius=0.2, gh_degree=3, patch_size=6,
        )
        rng = np.random.default_rng(4)
        mu_k = jnp.asarray(
            np.concatenate(
                [rng.uniform(1.5, 4.0, (6, 3)), rng.standard_normal((6, 3))],
                axis=1,
            )
        )
        cov_k = jnp.broadcast_to(0.01 * jnp.eye(6), (6, 6, 6))
        ref = mm.batch_moments(fb, mu_k, cov_k, quad_impl="xla")
        got = mm.batch_moments(fb, mu_k, cov_k, quad_impl="lanes")
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-12)


class TestPlannerEndToEnd:
    def test_planar_planner_lanes_path(self):
        """The patch mode is an explicit-opt-in APPROXIMATION on the full
        planner (marginal spread grows past any feasible window —
        measured: sigma-point spread reaches ~15 cells by iteration 9, vs
        a 16-cell window's +-7.5); the contract is cost-trajectory
        closeness and an equally valid plan, not iterate equality."""
        graph, init, config, sdf = build_planar_planning(
            num_states=12, gh_degree=3, patch_size=16
        )
        assert graph.nonlinear[0].lanes_prep is not None
        config = replace(
            config, niters=10, chain_impl="lanes", quad_impl="lanes"
        )
        config_ref = replace(config, chain_impl="seq", quad_impl="xla")
        st_l, hist_l = optimize(graph, init, config, method="ngd")
        st_r, hist_r = optimize(graph, init, config_ref, method="ngd")
        np.testing.assert_allclose(
            hist_l.cost, hist_r.cost, rtol=2e-2, atol=1e-6
        )
        assert float(hist_l.cost[-1]) < float(hist_l.cost[0])
        # both plans must clear the obstacle comparably and hit the anchors
        sd_l = np.asarray(sdf.signed_distance(st_l.mu[:, :2]))
        sd_r = np.asarray(sdf.signed_distance(st_r.mu[:, :2]))
        assert sd_l.min() > sd_r.min() - 0.1
        np.testing.assert_allclose(st_l.mu[0], st_r.mu[0], atol=0.02)
        np.testing.assert_allclose(st_l.mu[-1], st_r.mu[-1], atol=0.02)

    def test_planner_default_is_exact_path(self):
        graph, _, _, _ = build_planar_planning(num_states=8, gh_degree=3)
        assert graph.nonlinear[0].lanes_prep is None  # opt-in only

"""7-DOF arm motion planning through a 3-D SDF.

End-to-end equivalent of the reference's largest model family
(CudaOperation_3dArm, helpers/CudaOperation.h:683-793: DH forward
kinematics -> sphere centers -> 3-D SDF -> hinge obstacle cost), with
WAM-like DH parameters.  State per time step = [theta(7); theta_dot(7)]
(s = 14), minimum-acceleration GP prior in joint space, anchors at start
and goal configurations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..factors.priors import fixed_prior, minimum_acc_prior
from ..factors.robots import DHForwardKinematics, make_arm_obstacle_factor
from ..factors.sdf import SDF3D
from ..inference import FactorGraph, GaussianState, GVIConfig, optimize
from ..ops import BlockTridiag


def wam_fk(dtype=None) -> DHForwardKinematics:
    """7-DOF WAM arm DH parameters (the model used by the reference's parent
    project via gpmp2) with one collision sphere per link frame."""
    dtype = dtype or jnp.zeros(0).dtype
    a = jnp.asarray([0.0, 0.0, 0.045, -0.045, 0.0, 0.0, 0.0], dtype)
    alpha = jnp.asarray(
        [-np.pi / 2, np.pi / 2, -np.pi / 2, np.pi / 2,
         -np.pi / 2, np.pi / 2, 0.0], dtype,
    )
    d = jnp.asarray([0.0, 0.0, 0.55, 0.0, 0.3, 0.0, 0.06], dtype)
    theta_bias = jnp.zeros(7, dtype)
    frames = jnp.asarray([2, 2, 3, 4, 5, 6, 6], jnp.int32)
    centers = jnp.asarray(
        [[0.0, 0.0, -0.4], [0.0, 0.0, -0.2], [0.0, 0.0, 0.0],
         [0.0, 0.0, -0.15], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
         [0.0, 0.0, 0.05]], dtype,
    )
    return DHForwardKinematics(a, alpha, d, theta_bias, frames, centers)


def sphere_obstacle_sdf3d(
    center=(0.45, 0.0, 0.6), radius=0.2, extent=2.0, n_cells=40, dtype=None
) -> SDF3D:
    """Euclidean SDF of one sphere obstacle, grid centered at the origin."""
    dtype = dtype or jnp.zeros(0).dtype
    cell = extent / (n_cells - 1)
    xs = np.linspace(-extent / 2, extent / 2, n_cells)
    zz, yy, xx = np.meshgrid(xs, xs, xs, indexing="ij")
    sd = (
        np.sqrt(
            (xx - center[0]) ** 2 + (yy - center[1]) ** 2 + (zz - center[2]) ** 2
        )
        - radius
    )
    return SDF3D(
        jnp.asarray(sd, dtype),
        jnp.asarray([-extent / 2, -extent / 2, -extent / 2], dtype),
        jnp.asarray(cell, dtype),
    )


def build_arm_planning(
    num_states: int = 10,
    total_time: float = 2.0,
    cost_sigma: float = 20.0,
    epsilon: float = 0.1,
    gh_degree: int = 2,
    dtype=None,
):
    dtype = dtype or jnp.zeros(0).dtype
    n_joints = 7
    state_dim = 2 * n_joints
    dt = total_time / (num_states - 1)
    fk = wam_fk(dtype)
    sdf = sphere_obstacle_sdf3d(dtype=dtype)
    radii = np.full(7, 0.05)

    start_q = np.zeros(n_joints)
    goal_q = np.array([0.8, 0.6, 0.0, -0.4, 0.0, 0.3, 0.0])
    vel = (goal_q - start_q) / total_time

    obstacle = make_arm_obstacle_factor(
        sdf, fk, radii,
        np.arange(num_states),
        state_dim=state_dim,
        cost_sigma=cost_sigma,
        epsilon=epsilon,
        gh_degree=gh_degree,
        n_joints=n_joints,
        dtype=dtype,
    )
    anchors = [
        fixed_prior(
            0, np.concatenate([start_q, vel]), 0.01 * np.eye(state_dim),
            dtype=dtype,
        ),
        fixed_prior(
            num_states - 1, np.concatenate([goal_q, vel]),
            0.01 * np.eye(state_dim), dtype=dtype,
        ),
    ]
    gp = minimum_acc_prior(np.eye(n_joints), dt, num_states, dtype=dtype)
    graph = FactorGraph(
        num_states=num_states, state_dim=state_dim,
        nonlinear=(obstacle,), linear=(*anchors, gp),
    )

    ts = np.linspace(0.0, 1.0, num_states)[:, None]
    qs = start_q[None, :] + ts * (goal_q - start_q)[None, :]
    init_mu = np.concatenate([qs, np.tile(vel, (num_states, 1))], axis=1)
    init = GaussianState(
        jnp.asarray(init_mu, dtype),
        BlockTridiag.identity(num_states, state_dim, 10.0, dtype),
    )
    config = GVIConfig(niters=15, niters_lowtemp=15, step_size_base=0.9)
    return graph, init, config, (fk, sdf)


def run_arm_planning(method: str = "ngd", **kwargs):
    graph, init, config, aux = build_arm_planning(**kwargs)
    final, hist = optimize(graph, init, config, method=method)
    return final, hist, aux

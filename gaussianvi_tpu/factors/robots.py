"""Robot collision models: check-ball placement + DH forward kinematics.

TPU ports of the reference's device-side robot classes
(helpers/CudaOperation.h: CudaOperation_PlanarPR 454-530, _Quad 533-610,
_3dpR 612-680, _3dArm 683-793, ForwardKinematics 325-410).  Each model maps
a robot state to a set of collision-check sphere centers; the obstacle factor
composes this with an SDF lookup and the hinge loss.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .base import NonlinearFactorBatch, detect_slice_offset, marginal_rule
from .sdf import PlanarSDF, SDF3D, hinge_obstacle_cost
from ..quadrature import get_rule
from ..ops.precision import einsum, matmul


def planar_point_balls(pose: jnp.ndarray) -> jnp.ndarray:
    """Planar point robot: one ball at (x, y) (CudaOperation_PlanarPR)."""
    return pose[None, :2]


def planar_quad_balls(
    pose: jnp.ndarray, n_balls: int = 5, length: float = 5.0, radius: float = 1.0
) -> jnp.ndarray:
    """Planar quadrotor: n balls along the body axis
    (CudaOperation_Quad::vec_balls, CudaOperation.h:585-604).
    pose = (x, z, phi, ...)."""
    x, z, phi = pose[0], pose[1], pose[2]
    l_x = x - (length - radius * 1.5) * jnp.cos(phi) / 2.0
    l_z = z - (length - radius * 1.5) * jnp.sin(phi) / 2.0
    i = jnp.arange(n_balls, dtype=pose.dtype)
    pt_x = l_x + length * jnp.cos(phi) / n_balls * i
    pt_z = l_z + length * jnp.sin(phi) / n_balls * i
    return jnp.stack([pt_x, pt_z], axis=-1)


def point3d_balls(pose: jnp.ndarray) -> jnp.ndarray:
    """3-D point robot: one ball at (x, y, z) (CudaOperation_3dpR)."""
    return pose[None, :3]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DHForwardKinematics:
    """Denavit-Hartenberg chain with attached collision spheres
    (ForwardKinematics, CudaOperation.h:325-410)."""

    a: jnp.ndarray           # [J]
    alpha: jnp.ndarray       # [J]
    d: jnp.ndarray           # [J]
    theta_bias: jnp.ndarray  # [J]
    frames: jnp.ndarray      # [S] int: sphere -> joint frame
    centers: jnp.ndarray     # [S, 3] sphere center in its frame

    def _dh_matrix(self, i, theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        ca, sa = jnp.cos(self.alpha[i]), jnp.sin(self.alpha[i])
        a_i, d_i = self.a[i], self.d[i]
        return jnp.array(
            [
                [ct, -st * ca, st * sa, a_i * ct],
                [st, ct * ca, -ct * sa, a_i * st],
                [0.0, sa, ca, d_i],
                [0.0, 0.0, 0.0, 1.0],
            ],
            theta.dtype,
        )

    def joint_transforms(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Cumulative base->frame transforms T_0..T_{J-1}, [J, 4, 4],
        via a scan of 4x4 matmuls."""
        j = self.a.shape[0]
        mats = jax.vmap(self._dh_matrix)(jnp.arange(j), theta + self.theta_bias)

        def step(t, m):
            t_new = matmul(t, m)
            return t_new, t_new

        _, ts = jax.lax.scan(step, jnp.eye(4, dtype=theta.dtype), mats)
        return ts

    def sphere_centers(self, theta: jnp.ndarray) -> jnp.ndarray:
        """World positions of all collision spheres, [S, 3]
        (compute_transformed_sphere_centers)."""
        ts = self.joint_transforms(theta)
        t_s = ts[self.frames]                       # [S, 4, 4]
        rot = t_s[:, :3, :3]
        pos = t_s[:, :3, 3]
        return pos + einsum("sij,sj->si", rot, self.centers)




def _resolve_interp(interp: str) -> str:
    """``interp="auto"``: one-hot hat-function matmul interpolation on
    TPU (gather-free — the planar planner measured 15x the gather path,
    PERF.md section 31), direct gathers elsewhere (a dense field-wide
    contraction per query has no payoff on CPU).  Resolved at build time
    against the process default backend, like resolve_chain_impl."""
    if interp != "auto":
        return interp
    import jax

    return "matmul" if jax.default_backend() == "tpu" else "gather"


def _hinge(sd, epsilon, radius, sigma, slope):
    err = jnp.maximum(0.0, epsilon + radius - sd) * slope
    return err * err * sigma


def make_patch_prep_2d(sdf: PlanarSDF, patch: int):
    """Marginal-dependent lanes param prep for a planar point-robot SDF
    factor: gathers a ``patch x patch`` cell window of the field around
    each factor's marginal-mean ball center (XLA dynamic_slice — gathers
    are legal OUTSIDE the kernel), so the in-kernel lookup is pure
    arithmetic.  Returns ``(patches [K, P, P], r0 [K], c0 [K])`` (window
    origin in cell units)."""

    def prep(mu_k):
        rows, cols = sdf.data.shape
        c = (mu_k[:, 0] - sdf.origin[0]) / sdf.cell_size
        r = (mu_k[:, 1] - sdf.origin[1]) / sdf.cell_size
        r0 = jnp.clip(
            jnp.floor(r).astype(jnp.int32) - patch // 2 + 1, 0, rows - patch
        )
        c0 = jnp.clip(
            jnp.floor(c).astype(jnp.int32) - patch // 2 + 1, 0, cols - patch
        )
        patches = jax.vmap(
            lambda rr, cc: jax.lax.dynamic_slice(
                sdf.data, (rr, cc), (patch, patch)
            )
        )(r0, c0)
        return patches, r0.astype(mu_k.dtype), c0.astype(mu_k.dtype)

    return prep


def make_patch_cost_2d(sdf: PlanarSDF, patch: int, epsilon, radius, sigma,
                       slope=1.0):
    """Component-form (lanes) planar point-robot obstacle cost consuming
    the pre-gathered patch: bilinear interpolation as a separable
    hat-function sum ``sd = sum_ij relu(1-|r-i|) relu(1-|c-j|) patch[i,j]``
    — exactly the 4-corner bilinear blend for in-window points, all
    elementwise VPU ops (the per-lane dynamic gather Mosaic lacks is gone).
    Points outside the window clamp to its edge (the window tracks the
    marginal mean, so this only bites when the sigma-point spread exceeds
    ``patch/2`` cells — pick ``patch`` from the expected marginal scale).

    Reference analog: the device-side bilinear lookup of
    helpers/CudaOperation.h:21-131 inside the batched cost kernels."""
    # Python scalars (not captured arrays — Pallas kernels cannot close
    # over array constants); factor builders run host-side on concrete SDFs
    ox, oy = float(sdf.origin[0]), float(sdf.origin[1])
    cell = float(sdf.cell_size)

    def lanes_cost(x, patches, r0, c0):
        c_rel = jnp.clip((x[0] - ox) / cell - c0, 0.0, patch - 1.0)
        r_rel = jnp.clip((x[1] - oy) / cell - r0, 0.0, patch - 1.0)
        wc = [
            jnp.maximum(0.0, 1.0 - jnp.abs(c_rel - j)) for j in range(patch)
        ]
        sd = None
        for i in range(patch):
            row = None
            for j in range(patch):
                term = wc[j] * patches[i, j]
                row = term if row is None else row + term
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(r_rel - i))
            contrib = wr * row
            sd = contrib if sd is None else sd + contrib
        return _hinge(sd, epsilon, radius, sigma, slope)

    return lanes_cost


def make_planar_obstacle_factor(
    sdf: PlanarSDF,
    start_indices,
    state_dim: int,
    cost_sigma: float = 15.5,
    epsilon: float = 0.5,
    radius: float = 1.0,
    slope: float = 1.0,
    balls_fn=planar_point_balls,
    gh_degree: int = 3,
    patch_size: int | None = None,
    interp: str = "auto",
    marginal_quad: bool = True,
    dtype=None,
) -> NonlinearFactorBatch:
    """Per-state planar collision factor psi(x) = hinge(sd(balls(x)))
    (cost_obstacle_planar).  The SDF arrays are captured in the cost closure
    and live in HBM once, shared by all factors.

    ``patch_size`` (point-robot ``balls_fn`` only): attach the
    lanes-kernel fast path — pre-gathered SDF windows + in-kernel hat-sum
    bilinear interpolation (:func:`make_patch_cost_2d`); None disables.
    ``interp``: "auto" (matmul on TPU, gather elsewhere — see
    :func:`_resolve_interp`), "gather" (direct 4-corner lookup) or
    "matmul" (one-hot hat-function MXU contraction against the whole
    field — identical values, no gathers; measured 15x on the planar
    planner, PERF.md section 31)."""
    lookup = (
        sdf.signed_distance_matmul
        if _resolve_interp(interp) == "matmul"
        else sdf.signed_distance
    )

    def cost_fn(x, params):
        del params
        balls = balls_fn(x)
        sd = lookup(balls)
        return hinge_obstacle_cost(sd, epsilon, radius, cost_sigma, slope)

    lanes_cost = lanes_prep = None
    if patch_size is not None and balls_fn is planar_point_balls:
        lanes_prep = make_patch_prep_2d(sdf, patch_size)
        lanes_cost = make_patch_cost_2d(
            sdf, patch_size, epsilon, radius, cost_sigma, slope
        )

    # configuration-marginal quadrature (see marginal_rule): the known
    # balls_fns read pose[:2] / pose[:3]; custom balls_fns keep the
    # full-state rule.  Patch (lanes) mode keeps it too — the kernels
    # don't implement the e_xxt lift.
    rdim = None
    if marginal_quad and lanes_cost is None:
        rdim = (2 if balls_fn is planar_point_balls
                else 3 if balls_fn is planar_quad_balls else None)
    if rdim is not None:
        nodes, weights = marginal_rule(state_dim, rdim, gh_degree)
    else:
        nodes, weights = get_rule(state_dim, gh_degree)
    dtype = dtype or jnp.zeros(0).dtype
    start_np = np.asarray(start_indices, np.int32)
    return NonlinearFactorBatch(
        start=jnp.asarray(start_np),
        slice_offset=detect_slice_offset(start_np),
        nodes=jnp.asarray(nodes, dtype),
        weights=jnp.asarray(weights, dtype),
        params=None,
        cost_fn=cost_fn,
        nb=1,
        lanes_cost=lanes_cost,
        lanes_prep=lanes_prep,
        nonneg_cost=True,   # hinge loss: phi >= 0 everywhere
        quad_rdim=rdim,
    )


def make_patch_prep_3d(sdf: SDF3D, patch: int):
    """3-D analog of :func:`make_patch_prep_2d`: gathers a P^3 voxel window
    around each factor's marginal-mean ball center.  Returns
    ``(patches [K, P, P, P], z0 [K], r0 [K], c0 [K])``."""

    def prep(mu_k):
        nz, rows, cols = sdf.data.shape
        c = (mu_k[:, 0] - sdf.origin[0]) / sdf.cell_size
        r = (mu_k[:, 1] - sdf.origin[1]) / sdf.cell_size
        z = (mu_k[:, 2] - sdf.origin[2]) / sdf.cell_size
        h = patch // 2 - 1
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32) - h, 0, nz - patch)
        r0 = jnp.clip(jnp.floor(r).astype(jnp.int32) - h, 0, rows - patch)
        c0 = jnp.clip(jnp.floor(c).astype(jnp.int32) - h, 0, cols - patch)
        patches = jax.vmap(
            lambda zz, rr, cc: jax.lax.dynamic_slice(
                sdf.data, (zz, rr, cc), (patch, patch, patch)
            )
        )(z0, r0, c0)
        return (
            patches, z0.astype(mu_k.dtype), r0.astype(mu_k.dtype),
            c0.astype(mu_k.dtype),
        )

    return prep


def make_patch_cost_3d(sdf: SDF3D, patch: int, epsilon, radius, sigma,
                       slope=1.0):
    """Component-form (lanes) 3-D point-robot obstacle cost: trilinear
    interpolation as a separable hat-function sum over the pre-gathered
    P^3 window (see :func:`make_patch_cost_2d` for the contract and the
    window-edge clamping caveat)."""
    ox, oy, oz = (
        float(sdf.origin[0]), float(sdf.origin[1]), float(sdf.origin[2])
    )
    cell = float(sdf.cell_size)

    def lanes_cost(x, patches, z0, r0, c0):
        c_rel = jnp.clip((x[0] - ox) / cell - c0, 0.0, patch - 1.0)
        r_rel = jnp.clip((x[1] - oy) / cell - r0, 0.0, patch - 1.0)
        z_rel = jnp.clip((x[2] - oz) / cell - z0, 0.0, patch - 1.0)
        wc = [
            jnp.maximum(0.0, 1.0 - jnp.abs(c_rel - j)) for j in range(patch)
        ]
        wr = [
            jnp.maximum(0.0, 1.0 - jnp.abs(r_rel - i)) for i in range(patch)
        ]
        sd = None
        for kz in range(patch):
            plane = None
            for i in range(patch):
                row = None
                for j in range(patch):
                    term = wc[j] * patches[kz, i, j]
                    row = term if row is None else row + term
                t = wr[i] * row
                plane = t if plane is None else plane + t
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_rel - kz))
            contrib = wz * plane
            sd = contrib if sd is None else sd + contrib
        return _hinge(sd, epsilon, radius, sigma, slope)

    return lanes_cost


def make_point3d_obstacle_factor(
    sdf: SDF3D,
    start_indices,
    state_dim: int,
    cost_sigma: float = 15.5,
    epsilon: float = 0.5,
    radius: float = 1.0,
    slope: float = 1.0,
    gh_degree: int = 3,
    patch_size: int | None = None,
    interp: str = "auto",
    marginal_quad: bool = True,
    dtype=None,
) -> NonlinearFactorBatch:
    """3-D point-robot collision factor: one ball at (x, y, z) -> trilinear
    SDF lookup -> hinge loss (CudaOperation_3dpR::cost_obstacle_planar +
    vec_balls, helpers/CudaOperation.h:612-680; state = [pos3; vel3]).

    ``patch_size``: lanes fast path via P^3 pre-gathered windows (None
    disables; the P^3 VMEM footprint makes small windows the default).
    ``interp``: "auto" (matmul on TPU, gather elsewhere), "gather" or
    "matmul" (one-hot hat contraction; mind the [Q, nz, rows] operand
    scaling — sdf.SDF3D.signed_distance_matmul)."""
    lookup = (
        sdf.signed_distance_matmul
        if _resolve_interp(interp) == "matmul"
        else sdf.signed_distance
    )

    def cost_fn(x, params):
        del params
        balls = point3d_balls(x)
        sd = lookup(balls)
        return hinge_obstacle_cost(sd, epsilon, radius, cost_sigma, slope)

    lanes_cost = lanes_prep = None
    if patch_size is not None:
        lanes_prep = make_patch_prep_3d(sdf, patch_size)
        lanes_cost = make_patch_cost_3d(
            sdf, patch_size, epsilon, radius, cost_sigma, slope
        )

    # position-marginal quadrature (see marginal_rule); the patch (lanes)
    # mode keeps the full-state rule — no in-kernel e_xxt lift
    rdim = 3 if (marginal_quad and lanes_cost is None) else None
    if rdim is not None:
        nodes, weights = marginal_rule(state_dim, rdim, gh_degree)
    else:
        nodes, weights = get_rule(state_dim, gh_degree)
    dtype = dtype or jnp.zeros(0).dtype
    start_np = np.asarray(start_indices, np.int32)
    return NonlinearFactorBatch(
        start=jnp.asarray(start_np),
        slice_offset=detect_slice_offset(start_np),
        nodes=jnp.asarray(nodes, dtype),
        weights=jnp.asarray(weights, dtype),
        params=None,
        cost_fn=cost_fn,
        nb=1,
        lanes_cost=lanes_cost,
        lanes_prep=lanes_prep,
        nonneg_cost=True,   # hinge loss: phi >= 0 everywhere
        quad_rdim=rdim,
    )


def make_arm_obstacle_factor(
    sdf: SDF3D,
    fk: DHForwardKinematics,
    radii,
    start_indices,
    state_dim: int,
    cost_sigma: float = 15.5,
    epsilon: float = 0.5,
    slope: float = 1.0,
    gh_degree: int = 3,
    n_joints: int | None = None,
    interp: str = "auto",
    marginal_quad: bool = True,
    dtype=None,
) -> NonlinearFactorBatch:
    """Arm collision factor: DH FK -> sphere centers -> 3-D SDF -> hinge
    (CudaOperation_3dArm::cost_obstacle; state = [theta; theta_dot], the
    first n_joints entries are joint angles).  ``interp``: see
    :func:`_resolve_interp`; ``marginal_quad``: joint-angle-marginal
    quadrature (see :func:`marginal_rule`)."""
    radii = jnp.asarray(radii)
    nj = n_joints if n_joints is not None else state_dim // 2
    lookup = (
        sdf.signed_distance_matmul
        if _resolve_interp(interp) == "matmul"
        else sdf.signed_distance
    )

    def cost_fn(x, params):
        del params
        theta = x[:nj]
        centers = fk.sphere_centers(theta)
        sd = lookup(centers)
        return hinge_obstacle_cost(sd, epsilon, radii, cost_sigma, slope)

    rdim = nj if (marginal_quad and nj < state_dim) else None
    if rdim is not None:
        nodes, weights = marginal_rule(state_dim, rdim, gh_degree)
    else:
        nodes, weights = get_rule(state_dim, gh_degree)
    dtype = dtype or jnp.zeros(0).dtype
    start_np = np.asarray(start_indices, np.int32)
    return NonlinearFactorBatch(
        start=jnp.asarray(start_np),
        slice_offset=detect_slice_offset(start_np),
        nodes=jnp.asarray(nodes, dtype),
        weights=jnp.asarray(weights, dtype),
        params=None,
        cost_fn=cost_fn,
        nb=1,
        nonneg_cost=True,   # hinge loss: phi >= 0 everywhere
        quad_rdim=rdim,
    )

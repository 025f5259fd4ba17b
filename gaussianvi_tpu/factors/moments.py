"""Fused sigma-point moment computation and per-factor gradient math.

The hot loop of the whole framework.  For a batch of K factors with marginals
``(mu [K,d], cov [K,d,d])`` and an M-point rule, computes in ONE pass over
the sigma points:

    E[phi], E[(x-mu) phi], E[(x-mu)(x-mu)^T phi]

The reference evaluates the cost function three times — once per moment —
in three separate ``Integrate`` calls (ngd/NGDFactorizedBaseGH.h:53-74 calls
quadrature/SparseGaussHermite.h:197-221 thrice); here ``phi`` is evaluated
once and the three weighted reductions are einsums that XLA fuses (and the
Pallas kernel in :mod:`gaussianvi_tpu.kernels` fuses fully).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops.blocktridiag import spd_inv
from ..ops.psd import psd_sqrtm
from ..ops.smallmat import chol_small
from ..ops.precision import einsum


def sigma_points(
    nodes: jnp.ndarray, mu: jnp.ndarray, cov: jnp.ndarray,
    method: str = "cholesky",
) -> jnp.ndarray:
    """Place zero-mean nodes at N(mu_k, cov_k): ``nodes @ L.T + mu`` for any
    factor L with L L^T = P.

    ``method='cholesky'`` (default) matches the reference's full-GH
    placement (quadrature/GaussHermite-impl.h:100, LLT) and is ~4x cheaper
    on TPU than eigh; ``method='eigh'`` matches the sparse-GH placement
    (quadrature/SparseGaussHermite.h:231-243, operatorSqrt).  For symmetric
    rules both give identical results on polynomials up to the rule's
    exactness order; estimates differ only within quadrature error.
    Shapes: nodes [M,d], mu [K,d], cov [K,d,d] -> [K,M,d].
    """
    if method == "cholesky":
        sqrt_p = chol_small(cov)  # unrolled for small d; loop-free on TPU
    else:
        sqrt_p = psd_sqrtm(cov)  # symmetric
    # x = L xi per point: out[k,m,:] = L_k @ nodes[m]  (nodes @ L^T)
    return einsum("md,ked->kme", nodes, sqrt_p) + mu[:, None, :]


def eval_phi(
    cost_fn: Callable[..., jnp.ndarray], pts: jnp.ndarray, params: Any
) -> jnp.ndarray:
    """phi over the sigma batch: pts [K,M,d] -> [K,M]."""
    per_factor = jax.vmap(cost_fn, in_axes=(0, None))  # over M points
    if params is None:
        return jax.vmap(lambda p: per_factor(p, None))(pts)
    return jax.vmap(per_factor, in_axes=(0, 0))(pts, params)


def _lanes_leaves(fb, mu_k):
    """Param leaves for the lanes kernel: either the batch's flattened
    params, or the output of its marginal-dependent ``lanes_prep`` (e.g.
    SDF patches gathered around the trial marginal means)."""
    if fb.lanes_prep is not None:
        return tuple(fb.lanes_prep(mu_k))
    return tuple(jax.tree.leaves(fb.params)) if fb.params is not None else ()


def _lanes_param_elems(fb) -> int:
    """Per-lane VMEM element count of the lanes param leaves (static):
    the FULL per-problem size, K axis included — this must match what
    quad_lanes derives from the batched [B, K, *leaf] operands (it was
    once computed without the K axis, under-counting SDF patches K-fold
    and green-lighting shapes the kernel then rejected)."""
    import math

    if fb.lanes_prep is not None:
        k, d = fb.start.shape[-1], fb.dim
        dtype = fb.nodes.dtype
        out = jax.eval_shape(
            fb.lanes_prep, jax.ShapeDtypeStruct((k, d), dtype)
        )
        return sum(math.prod(l.shape) for l in jax.tree.leaves(out))
    leaves = jax.tree.leaves(fb.params) if fb.params is not None else []
    return sum(math.prod(l.shape) for l in leaves)


def _lanes_eligible(fb, eval_dtype, with_moments: bool) -> bool:
    """Static decision for the batch-on-lanes quadrature kernel: the batch
    must carry a component-form cost, the (K, d, M) shape — including the
    param/patch leaves — must fit the kernel's VMEM budget, and any
    centered-quantization dtype must be bfloat16 (quantized in-kernel;
    float16 has no native TPU cast and keeps the XLA path)."""
    if fb.lanes_cost is None:
        return False
    if eval_dtype is not None and jnp.dtype(eval_dtype) != jnp.dtype(
        jnp.bfloat16
    ):
        return False
    from ..kernels.quad_lanes import quad_fits_lanes

    return quad_fits_lanes(
        fb.start.shape[-1], fb.dim, fb.nodes.shape[-2], with_moments,
        _lanes_param_elems(fb),
    )


def batch_phi(fb, mu_k, cov_k, eval_dtype=None, quad_impl: str = "xla"):
    """E[phi] for a NonlinearFactorBatch (the line-search cost path),
    dispatching to the batch-on-lanes Pallas kernel when enabled and
    eligible (see :mod:`gaussianvi_tpu.kernels.quad_lanes`)."""
    if quad_impl == "lanes" and _lanes_eligible(fb, eval_dtype, False):
        from ..kernels.quad_lanes import quad_lanes_vmappable

        return quad_lanes_vmappable(
            fb.nodes, fb.weights, mu_k, cov_k, fb.lanes_cost,
            _lanes_leaves(fb, mu_k), eval_dtype=eval_dtype,
        )
    return expectation_phi(
        fb.nodes, fb.weights, mu_k, cov_k, fb.cost_fn, fb.params, eval_dtype
    )


def batch_moments(fb, mu_k, cov_k, use_pallas: bool = False,
                  eval_dtype=None, quad_impl: str = "xla"):
    """Moments for a NonlinearFactorBatch, dispatching to the fused Pallas
    kernel when the batch carries a block-form cost and the caller opted in
    (GVIConfig.use_pallas), or to the batch-on-lanes kernel when
    ``quad_impl='lanes'`` and the batch carries a component-form cost.
    ``eval_dtype='bfloat16'`` composes with the lanes kernel (offsets
    quantized in-kernel); float16 forces the XLA path.

    Limitation: the block-form (use_pallas) kernel does not compose with an
    outer ``jax.vmap`` over problems efficiently; the lanes kernel is built
    for exactly that case (batch axes land on the 128 lanes).
    """
    if use_pallas and fb.block_cost is not None:
        from ..kernels.fused_moments import fused_moments_vmappable

        leaves = jax.tree.leaves(fb.params) if fb.params is not None else []
        return fused_moments_vmappable(
            fb.nodes, fb.weights, mu_k, cov_k,
            cost_fn=fb.block_cost, params=tuple(leaves),
        )
    if quad_impl == "lanes" and _lanes_eligible(fb, eval_dtype, True):
        from ..kernels.quad_lanes import quad_lanes_vmappable

        return quad_lanes_vmappable(
            fb.nodes, fb.weights, mu_k, cov_k, fb.lanes_cost,
            _lanes_leaves(fb, mu_k), with_moments=True,
            eval_dtype=eval_dtype,
        )
    return gh_moments(
        fb.nodes, fb.weights, mu_k, cov_k, fb.cost_fn, fb.params, eval_dtype
    )


def _sigma_diffs(nodes, cov, eval_dtype=None):
    """Zero-mean sigma offsets ``nodes @ L^T`` [K, M, d], optionally
    QUANTIZED to ``eval_dtype`` (round-tripped back to the working dtype).

    Centered quantization is the bf16 mode that survives residual-style
    costs: rounding the OFFSET from the marginal mean keeps the error
    relative to the (small) offset, whereas rounding the absolute sigma
    point x = mu + offset loses the offset entirely once |mu| >> |offset|
    (the round-1 study measured up to 10% E[phi] error from exactly that
    catastrophic cancellation).  phi itself is always evaluated in the
    working precision; the quantization only compresses the [K, M, d]
    sigma-offset tensor — the largest intermediate of the hot loop.
    """
    sqrt_p = chol_small(cov)
    diff = einsum("md,ked->kme", nodes, sqrt_p)
    if eval_dtype is not None:
        diff = diff.astype(eval_dtype).astype(cov.dtype)
    return diff


def gh_moments(
    nodes: jnp.ndarray,
    weights: jnp.ndarray,
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    cost_fn: Callable[..., jnp.ndarray],
    params: Any,
    eval_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (E[phi] [K], E[(x-mu)phi] [K,d], E[(x-mu)(x-mu)^T phi] [K,d,d]).

    ``eval_dtype`` (e.g. ``jnp.bfloat16``): centered sigma-offset
    quantization (see :func:`_sigma_diffs`); the weighted reductions always
    accumulate in the input dtype (sparse-grid weights are signed).
    """
    diff = _sigma_diffs(nodes, cov, eval_dtype)   # [K,M,d]
    pts = diff + mu[:, None, :]
    phi = eval_phi(cost_fn, pts, params)          # [K,M]
    wphi = phi * weights[None, :]                 # [K,M]
    e_phi = jnp.sum(wphi, axis=-1)
    e_xmu = einsum("km,kmd->kd", wphi, diff)
    e_xxt = einsum("km,kmd,kme->kde", wphi, diff, diff)
    return e_phi, e_xmu, e_xxt


def expectation_phi(
    nodes: jnp.ndarray,
    weights: jnp.ndarray,
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    cost_fn: Callable[..., jnp.ndarray],
    params: Any,
    eval_dtype=None,
) -> jnp.ndarray:
    """E[phi] only (the line-search cost path needs no moments).

    Cancellation-trust guarded: sparse-GH weights are signed
    (quadrature/SparseGaussHermite.h:197-221), and a huge-spread marginal
    can cancel the sum below the working precision's resolution — the f32
    residue then carries an arbitrary (often hugely negative) value that
    the line search would accept where f64 rejects (PERF.md sections
    14/27).  When |sum w phi| falls under ~64 ulps of sum |w phi| the
    estimate is poisoned to NaN, rejecting the trial (the same philosophy
    as the chain kernels' pivot-trust guard; see
    kernels/quad_lanes._cancel_tol)."""
    diff = _sigma_diffs(nodes, cov, eval_dtype)
    phi = eval_phi(cost_fn, diff + mu[:, None, :], params)
    wphi = phi * weights[None, :]
    tot = jnp.sum(wphi, axis=-1)
    absum = jnp.sum(jnp.abs(wphi), axis=-1)
    tol = 64.0 * float(jnp.finfo(tot.dtype).eps)
    return jnp.where(jnp.abs(tot) < tol * absum, jnp.nan, tot)


def ngd_local_gradients(
    e_phi: jnp.ndarray,
    e_xmu: jnp.ndarray,
    e_xxt: jnp.ndarray,
    cov: jnp.ndarray,
    temperature,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-factor natural-gradient pieces (reference NGDFactorizedBaseGH.h:53-74):

        Vdmu_k  = Prec_k E[(x-mu)phi] / T
        Vddmu_k = (Prec_k E[(x-mu)(x-mu)^T phi] Prec_k - Prec_k E[phi]) / T
    """
    prec = spd_inv(cov)                                        # [K,d,d]
    vdmu = einsum("kde,ke->kd", prec, e_xmu) / temperature
    vddmu = (
        einsum("kab,kbc,kcd->kad", prec, e_xxt, prec)
        - prec * e_phi[:, None, None]
    ) / temperature
    vddmu = 0.5 * (vddmu + jnp.swapaxes(vddmu, -1, -2))
    return vdmu, vddmu


def bw_local_gradients(
    e_phi: jnp.ndarray,
    e_xmu: jnp.ndarray,
    e_xxt: jnp.ndarray,
    cov: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bures-Wasserstein gradients (proxgd/ProxGVIFactorizedBaseGH.h:153-161):

        b_k = Prec_k E[(x-mu)phi]
        S_k = Prec_k E[(x-mu)(x-mu)^T phi] Prec_k - Prec_k E[phi]
    """
    prec = spd_inv(cov)
    b_k = einsum("kde,ke->kd", prec, e_xmu)
    s_k = (
        einsum("kab,kbc,kcd->kad", prec, e_xxt, prec)
        - prec * e_phi[:, None, None]
    )
    s_k = 0.5 * (s_k + jnp.swapaxes(s_k, -1, -2))
    return b_k, s_k


def linear_local_gradients(
    lam: jnp.ndarray,
    psi: jnp.ndarray,
    target_mu: jnp.ndarray,
    target_prec: jnp.ndarray,
    constant: jnp.ndarray,
    mu: jnp.ndarray,
    temperature,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form NGD gradients for linear-Gaussian factors.

    Vdmu follows ngd/NGDFactorizedLinear.h:104-106.  The reference's O(d^4)
    Isserlis quadruple loop (ibid.:108-119) collapses algebraically: with
    A = Lam^T prec_t Lam and Prec = Cov^{-1},

        Prec (Cov tr(A Cov) + 2 Cov A Cov) Prec - Prec tr(A Cov) = 2 A,

    so Vddmu = 2 A C / T exactly — no moments, no covariance dependence.
    (Verified against the loop in tests/test_linear_factors.py.)
    """
    resid = einsum("krd,kd->kr", lam, mu) - einsum(
        "krt,kt->kr", psi, target_mu
    )
    vdmu = (
        2.0
        * einsum("krd,krs,ks->kd", lam, target_prec, resid)
        * constant[:, None]
        / temperature
    )
    a = einsum("kra,krs,ksb->kab", lam, target_prec, lam)
    vddmu = 2.0 * a * constant[:, None, None] / temperature
    return vdmu, vddmu


def batch_linear_cost(lb, mu, cov_diag, cov_off, blockwise: bool = True):
    """E[psi] for a LinearFactorBatch from the chain blocks.

    nb == 2 edge factors use the blockwise form (:func:`linear_cost_chain`)
    — same value as assembling the [K, 2s, 2s] edge marginal, without
    materializing it (measured -22% on the full NGD iteration, PERF.md).
    """
    from ..inference.graph import gather_chain_edges, gather_marginals

    if lb.nb == 2 and blockwise:
        return linear_cost_chain(
            lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
            *gather_chain_edges(
                lb.start, mu, cov_diag, cov_off, lb.slice_offset
            ),
        )
    mu_k, cov_k = gather_marginals(
        lb.start, lb.nb, mu, cov_diag, cov_off, lb.slice_offset
    )
    return linear_cost(
        lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
        mu_k, cov_k,
    )


def linear_cost_chain(
    lam: jnp.ndarray,
    psi: jnp.ndarray,
    target_mu: jnp.ndarray,
    target_prec: jnp.ndarray,
    constant: jnp.ndarray,
    mu_i: jnp.ndarray,
    mu_ip1: jnp.ndarray,
    cd_i: jnp.ndarray,
    cd_ip1: jnp.ndarray,
    co_i: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form E[psi] for nb==2 (edge) linear factors computed from the
    chain blocks directly — same value as :func:`linear_cost` on the
    assembled edge marginal, WITHOUT materializing the [K, 2s, 2s]
    edge-covariance tensor (at the line-search trial batch that tensor plus
    the gathers behind it are pure HBM traffic).  With A = Lam^T prec_t Lam
    partitioned into s x s blocks and Sigma_e symmetric:

        tr(A Sigma_e) = sum(A11 . Sig_ii) + sum(A22 . Sig_i+1,i+1)
                        + 2 sum(A12 . Sig_i,i+1)
    """
    s = cd_i.shape[-1]
    a = einsum("kra,krs,ksb->kab", lam, target_prec, lam)
    # the 2*sum(A12 . Sig_i,i+1) folding below needs A symmetric; with Sig
    # symmetric tr(A Sig) = tr(sym(A) Sig), so symmetrizing keeps this path
    # equal to linear_cost even for an asymmetric target_prec
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    tr_term = (
        jnp.sum(a[:, :s, :s] * cd_i, axis=(-2, -1))
        + jnp.sum(a[:, s:, s:] * cd_ip1, axis=(-2, -1))
        + 2.0 * jnp.sum(a[:, :s, s:] * co_i, axis=(-2, -1))
    )
    mu_k = jnp.concatenate([mu_i, mu_ip1], axis=-1)
    resid = einsum("krd,kd->kr", lam, mu_k) - einsum(
        "krt,kt->kr", psi, target_mu
    )
    quad = einsum("kr,krs,ks->k", resid, target_prec, resid)
    return (tr_term + quad) * constant


def linear_cost(
    lam: jnp.ndarray,
    psi: jnp.ndarray,
    target_mu: jnp.ndarray,
    target_prec: jnp.ndarray,
    constant: jnp.ndarray,
    mu: jnp.ndarray,
    cov: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form E[psi] (ngd/NGDFactorizedLinear.h:122-129):

        (tr(Lam^T prec_t Lam Cov) + ||Lam mu - Psi mu_t||^2_{prec_t}) * C
    """
    a = einsum("kra,krs,ksb->kab", lam, target_prec, lam)
    tr_term = jnp.trace(einsum("kab,kbc->kac", a, cov), axis1=-2, axis2=-1)
    resid = einsum("krd,kd->kr", lam, mu) - einsum(
        "krt,kt->kr", psi, target_mu
    )
    quad = einsum("kr,krs,ks->k", resid, target_prec, resid)
    return (tr_term + quad) * constant

"""Pallas lanes kernel: sigma-point quadrature with the batch on lanes.

The line search re-evaluates every nonlinear factor's expected cost at 11
trial iterates per iteration — measured at ~45-60% of the whole NGD step
(PERF.md section 2).  The fused-XLA path materializes the [B*K, M, d]
sigma-point tensor (and phi, and the weighted products) in HBM: ~50 MB per
trial batch at the bench operating point, all of it bandwidth + kernel
latency.  This kernel keeps the entire quadrature in VMEM with the problem
batch packed onto (RB sublanes x 128 lanes) vector registers — the same
layout that makes the chain kernel (:mod:`.chain_lanes`) win:

    mu [B, K, s] -> kernel layout [K, s, RB, 128]

Per factor k the kernel Choleskys the marginal covariance (unrolled, s is
tiny), forms the d sigma-offset components as [M, RB, 128] blocks (node
values enter as lanes-broadcast inputs, so every op is a full-vreg VPU op),
evaluates the cost ONCE, and reduces E[phi] — and, in the moments variant,
E[(x-mu)phi] and E[(x-mu)(x-mu)^T phi] — without ever leaving VMEM.

Reference analog: the batched CUDA quadrature kernels types 0/1/2
(helpers/CudaOperation.cu:10-183), which this fuses into one pass.

Cost-function contract (``lanes_cost``): called as

    lanes_cost(x, *param_leaves) -> array

where ``x`` is a TUPLE of d component arrays (each [M, RB, 128] inside the
kernel) and each param leaf arrives with its per-factor shape as LEADING
axes and the batch tile trailing (leaf [K] -> [RB, 128]; leaf [K, p] ->
[p, RB, 128]) — index leading axes statically, use jnp broadcasting
against the components.  The same function works on plain arrays, so the
contract is testable outside Pallas.  Costs that need pts-last-axis form
(or arbitrary tracing) keep the fused-XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .chain_lanes import LANE, _chol, _listify, _pack, _sds, _unpack

# VMEM budget (empirical, f32/v5e): elements per 128-lane row held live in
# one grid step — marginals in, moment outputs, and the (d+2) [M, *] sigma
# intermediates.  Sublane utilization matters more than headroom: at the
# bench shape (K=32, s=4, M=137) this budget gives RB=8 for the phi-only
# (line-search) variant and RB=4 with moments; 4096 forced RB=2 (1/4-full
# vregs, 3x the grid steps) and measured ~3x slower.
_MAX_ROW_ELEMS_QUAD = 12288

# sigma-node chunk per inner-loop step: each op inside the chunk body is
# vectorized over [_M_CHUNK, RB, 128] (= _M_CHUNK vregs of live state per
# intermediate)
_M_CHUNK = 8

# Cancellation-trust guard on the COST path (sibling of the chain kernels'
# pivot-trust guard): sparse-GH weights are SIGNED
# (quadrature/SparseGaussHermite.h:197-221), so E[phi] = sum w_m phi_m can
# cancel catastrophically when a trial iterate's marginal spread explodes —
# in f32 the garbage residue came out hugely NEGATIVE and the line search
# accepted it (PERF.md sections 14/27: 8/1024 separate-path collapses at
# N=32), where the reference's f64 evaluation rejects the same trials.
# When |sum| is below ~64 ulps of sum |w_m phi_m| — i.e. more than ~5 of 7
# f32 digits cancelled and the sign itself is untrustworthy — the estimate
# is poisoned to NaN, which the line search treats as a rejected trial
# (NaN costs compare False), restoring the f64-reject behavior at f32
# speed.  Healthy estimates sit at |sum|/sum|w phi| >~ 1/sum|w| (~0.01),
# three orders above the trip point; an exactly-zero hinge cost has both
# sums 0 and is never poisoned.
def _cancel_tol(dtype) -> float:
    return 64.0 * float(jnp.finfo(dtype).eps)


def _row_block_quad(k: int, s: int, m: int, with_moments: bool,
                    batch: int, param_elems: int = 0) -> int:
    """Rows of 128 lanes per grid step (0 = fall back to the XLA path).
    ``m`` is the raw node count; the budget is computed from the
    chunk-PADDED count the kernel actually allocates.  ``param_elems`` is
    the total per-lane element count of the param leaves (sum over leaves
    of K * prod(leaf shape after K)) — negligible for scalar params, the
    dominant term for SDF patches."""
    m = m + (-m) % _M_CHUNK
    per_row = k * s * s * (3 if with_moments else 1) + (s + 1) * m
    per_row += param_elems
    if per_row > _MAX_ROW_ELEMS_QUAD:
        return 0
    cap = min(8, _MAX_ROW_ELEMS_QUAD // per_row)
    rows = -(-batch // LANE)
    return min(
        range(1, cap + 1),
        key=lambda rb: (-(-rows // rb) * rb, -rb),
    )


def _quad_kernel(k_factors, s, with_moments, lanes_cost, param_shapes,
                 eval_dtype, nonneg, rdim, mu_ref, covd_ref, nodes_ref,
                 w_ref, *rest):
    """Inputs: mu [1, K, s, RB, 128], covd [1, K, s, s, RB, 128],
    nodes [1, s, M, RB, 128] (lanes-broadcast node components),
    w [1, M, RB, 128], param leaves [1, K, *leaf, RB, 128]; outputs
    e_phi [1, K, RB, 128] (+ e_xmu [1, K, s, RB, 128],
    e_xxt [1, K, s, s, RB, 128] in the moments variant)."""
    n_params = len(param_shapes)
    param_refs = rest[:n_params]
    if with_moments:
        e_phi_ref, e_xmu_ref, e_xxt_ref = rest[n_params:]
    else:
        (e_phi_ref,) = rest[n_params:]

    m_pad = w_ref.shape[1]                         # padded to _M_CHUNK
    n_chunks = m_pad // _M_CHUNK
    zero = jnp.zeros_like(w_ref[0, 0:1])           # [1, RB, 128]

    def body(k, _):
        cov_l = _listify(covd_ref[0, k], s)
        chol = _chol(cov_l, s)                     # lower, [RB, 128] tiles
        mu_k = [mu_ref[0, k, i] for i in range(s)]
        params = tuple(param_refs[p][0, k] for p in range(n_params))

        # chunked loop over sigma nodes: each op is vectorized over an
        # [MC, RB, 128] block (MC vregs — a whole-[M, ...] formulation holds
        # M vregs per intermediate and spills; a per-node loop pays loop
        # bookkeeping per node — both measured slower), with tile-valued
        # accumulators carried across chunks.  Padded nodes carry weight 0.
        # The cost-only variant additionally carries sum |w phi| for the
        # cancellation-trust guard (see _cancel_tol).
        tri = [(i, j) for i in range(s) for j in range(i + 1)]
        n_acc = 1 + (s + len(tri) if with_moments else 1)

        def chunk_body(c, acc):
            m0 = c * _M_CHUNK
            sl = pl.ds(m0, _M_CHUNK)
            diff = []
            for i in range(s):
                t = None
                for j in range(i + 1):
                    term = nodes_ref[0, j, sl] * chol[i][j][None]
                    t = term if t is None else t + term
                if eval_dtype is not None:
                    # centered offset quantization (moments._sigma_diffs):
                    # round-trip the offset through eval_dtype; phi and the
                    # reductions stay in the working dtype
                    t = t.astype(eval_dtype).astype(t.dtype)
                diff.append(t)                     # [MC, RB, 128]
            pts = tuple(diff[i] + mu_k[i][None] for i in range(s))
            phi = lanes_cost(pts, *params)         # [MC, RB, 128]
            wphi = phi * w_ref[0, sl]
            out = [acc[0] + jnp.sum(wphi, axis=0, keepdims=True)]
            if with_moments:
                wd = [wphi * diff[i] for i in range(s)]
                out += [
                    acc[1 + i] + jnp.sum(wd[i], axis=0, keepdims=True)
                    for i in range(s)
                ]
                out += [
                    acc[1 + s + t]
                    + jnp.sum(wd[i] * diff[j], axis=0, keepdims=True)
                    for t, (i, j) in enumerate(tri)
                ]
            else:
                out.append(
                    acc[1] + jnp.sum(jnp.abs(wphi), axis=0, keepdims=True)
                )
            return tuple(out)

        acc = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (zero,) * n_acc
        )
        if not with_moments:
            tot, absum = acc[0][0], acc[1][0]
            bad = jnp.abs(tot) < _cancel_tol(tot.dtype) * absum
            if nonneg:
                # nonneg-phi contract (NonlinearFactorBatch.nonneg_cost):
                # a negative estimate inside the ROUNDING-noise band is
                # sign-garbage (see moments._NONNEG_BAND); legit
                # quadrature-error negatives outside it pass through
                from ..factors.moments import _NONNEG_BAND

                eps = float(jnp.finfo(tot.dtype).eps)
                bad = bad | (
                    (tot < 0.0) & (tot > -_NONNEG_BAND * eps * absum)
                )
            e_phi_ref[0, k] = jnp.where(
                bad, jnp.full_like(tot, jnp.nan), tot
            )
            return 0
        e_phi_ref[0, k] = acc[0][0]
        if with_moments:
            for i in range(s):
                e_xmu_ref[0, k, i] = acc[1 + i][0]
            for t, (i, j) in enumerate(tri):
                val = acc[1 + s + t][0]
                if rdim is not None and j >= rdim:
                    # configuration-marginal quadrature: closed-form
                    # conditional-moment lift (moments.gh_moments) —
                    # corr = L[:, r:] L[:, r:]^T, nonzero only where
                    # both indices are >= rdim (j <= i here)
                    corr = None
                    for tt in range(rdim, j + 1):
                        term = chol[i][tt] * chol[j][tt]
                        corr = term if corr is None else corr + term
                    val = val + corr * acc[0][0]
                e_xxt_ref[0, k, i, j] = val
                if j != i:
                    e_xxt_ref[0, k, j, i] = val
        return 0

    jax.lax.fori_loop(0, k_factors, body, 0)


def quad_lanes(
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    nodes: jnp.ndarray,
    weights: jnp.ndarray,
    lanes_cost,
    params: tuple[jnp.ndarray, ...] = (),
    with_moments: bool = False,
    interpret: bool | None = None,
    eval_dtype=None,
    nonneg: bool = False,
    rdim: int | None = None,
):
    """Batched fused quadrature: mu [B, K, d], cov [B, K, d, d],
    nodes [M, d], weights [M], params leaves [B, K, *leaf] ->
    E[phi] [B, K] (+ E[(x-mu)phi] [B, K, d], E[xx^T phi] [B, K, d, d]).

    ``eval_dtype`` quantizes the sigma offsets in-kernel (the centered
    round-trip of moments._sigma_diffs) so ``moments_eval_dtype`` composes
    with the lanes path; use bfloat16 only (TPU-native cast).  Note the
    offsets never leave VMEM here, so unlike the XLA path the quantization
    saves no HBM — it exists for numerical consistency when the dispatch
    mixes paths across shapes.

    Returns None when the configuration exceeds the VMEM budget (caller
    falls back to the XLA path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k, d = mu.shape
    m = nodes.shape[0]
    pelems = sum(math.prod(p.shape[1:]) for p in params)
    rb = _row_block_quad(k, d, m, with_moments, b, pelems)
    if rb == 0:
        return None
    # pad the rule to the chunk size: replicated first node, ZERO weight
    # (a replicated genuine sigma point stays finite wherever the real
    # evaluation is; 0-weighted contributions vanish exactly)
    m_pad = (-m) % _M_CHUNK
    if m_pad:
        nodes = jnp.concatenate(
            [nodes, jnp.broadcast_to(nodes[0:1], (m_pad, d))]
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((m_pad,), weights.dtype)]
        )
        m += m_pad
    pad = (-b) % (LANE * rb)
    if pad:
        # replicate problem 0 into the padded lanes (mirroring the
        # replicated-node/zero-weight rule padding): padded lanes then
        # evaluate lanes_cost at a genuine finite point, so costs that are
        # undefined at zero params (e.g. 1/sig_r_sq) stay finite even
        # though the padded outputs are sliced off
        rep = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[0:1], (pad,) + x.shape[1:])]
        )
        mu = rep(mu)
        cov = rep(cov)
        params = tuple(rep(p) for p in params)
    bp = b + pad
    grid = bp // (LANE * rb)

    def lanes(x):
        """[bp, ...] -> [G, ..., RB, 128]."""
        return _pack(jnp.moveaxis(x, 0, -1), grid, rb)

    mu_l = lanes(mu)                               # [G, K, s, RB, 128]
    cov_l = lanes(cov)                             # [G, K, s, s, RB, 128]
    # node components and weights lanes-broadcast so every in-kernel op is
    # a full-vreg elementwise op.  The leading axis stays 1 with a
    # grid-invariant index_map (every grid step fetches block 0), so ONE
    # copy lives in HBM (~(d+1)*M*RB*128 floats) instead of one per grid
    # step — the rule is batch-invariant data.
    nodes_b = jnp.broadcast_to(
        nodes.T[None, :, :, None, None], (1, d, m, rb, LANE)
    ).astype(mu.dtype)
    w_b = jnp.broadcast_to(
        weights[None, :, None, None], (1, m, rb, LANE)
    ).astype(mu.dtype)
    param_l = tuple(lanes(p) for p in params)
    param_shapes = tuple(p.shape[2:] for p in params)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda g, nd=nd: (g,) + (0,) * nd)

    def spec0(shape):
        """Grid-invariant input: the same block 0 on every step."""
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda g, nd=nd: (0,) * (nd + 1))

    out_shapes = [_sds((grid, k, rb, LANE), mu.dtype, mu_l)]
    out_specs = [spec((k, rb, LANE))]
    if with_moments:
        out_shapes += [
            _sds((grid, k, d, rb, LANE), mu.dtype, mu_l),
            _sds((grid, k, d, d, rb, LANE), mu.dtype, mu_l),
        ]
        out_specs += [spec((k, d, rb, LANE)), spec((k, d, d, rb, LANE))]

    kernel = functools.partial(
        _quad_kernel, k, d, with_moments, lanes_cost, param_shapes,
        eval_dtype, nonneg, rdim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            spec((k, d, rb, LANE)),
            spec((k, d, d, rb, LANE)),
            spec0((d, m, rb, LANE)),
            spec0((m, rb, LANE)),
            *[spec((k,) + ps + (rb, LANE)) for ps in param_shapes],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(mu_l, cov_l, nodes_b, w_b, *param_l)

    def unlanes(y):
        return jnp.moveaxis(_unpack(y, bp), -1, 0)[:b]

    if with_moments:
        return unlanes(out[0]), unlanes(out[1]), unlanes(out[2])
    return unlanes(out[0])


# -- vmap composition (same pattern as chain_lanes: outer vmap axes flatten
# onto the lane axis; unbatched args are broadcast first) --------------------

def _ensure(axis_size, x, batched):
    return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


def quad_lanes_vmappable(nodes, weights, mu, cov, lanes_cost, params=(),
                         with_moments=False, interpret=None,
                         eval_dtype=None, nonneg=False, rdim=None):
    """``quad_lanes`` on UNBATCHED per-problem operands (mu [K, d], ...),
    efficient under (nested) outer vmaps: every batch axis (problems x
    line-search trials) flattens onto the 128 lanes, exactly like the chain
    kernel's wrapper.  The quadrature rule must be shared across any
    vmapped batch (a batched rule axis is collapsed to its first element —
    factor batches of one type always share one (dim, degree) rule).

    Callers must check :func:`quad_fits_lanes` first (static shapes) and
    take the XLA path when it is False.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_batching.custom_vmap
    def call(nodes_, weights_, mu_, cov_, *params_):
        # base signature is BATCHED: mu_ [B, K, d]
        return quad_lanes(
            mu_, cov_, nodes_, weights_, lanes_cost, tuple(params_),
            with_moments, interpret, eval_dtype, nonneg, rdim,
        )

    @call.def_vmap
    def _rule(axis_size, in_batched, nodes_, weights_, mu_, cov_, *params_):
        nodes_ = nodes_[0] if in_batched[0] else nodes_
        weights_ = weights_[0] if in_batched[1] else weights_
        mu_b = _ensure(axis_size, mu_, in_batched[2])
        cov_b = _ensure(axis_size, cov_, in_batched[3])
        params_b = [
            _ensure(axis_size, p, flag)
            for p, flag in zip(params_, in_batched[4:])
        ]
        b2, b = mu_b.shape[:2]
        k, d = mu_b.shape[2:]
        out = call(
            nodes_, weights_,
            mu_b.reshape(b2 * b, k, d),
            cov_b.reshape(b2 * b, k, d, d),
            *[p.reshape((b2 * b,) + p.shape[2:]) for p in params_b],
        )
        if out is None:
            # same eligibility-desync diagnostic as the unbatched call
            # below: a None flowing into jax.tree.map here would surface
            # as an obscure custom-batching error instead
            raise ValueError(
                "quad_lanes rejected a shape quad_fits_lanes accepted — "
                "eligibility accounting out of sync"
            )
        out = jax.tree.map(
            lambda y: y.reshape((b2, b) + y.shape[1:]), out
        )
        if with_moments:
            return out, (True, True, True)
        return out, True

    out = call(
        nodes, weights, mu[None], cov[None], *[p[None] for p in params]
    )
    if out is None:
        # quad_lanes refused the shape: the caller's quad_fits_lanes
        # pre-check disagreed with the kernel's budget — a bug, not a
        # fallback condition (silently returning None once crashed the
        # moment unpacking three layers up)
        raise ValueError(
            "quad_lanes rejected a shape quad_fits_lanes accepted — "
            "eligibility accounting out of sync"
        )
    return jax.tree.map(lambda y: y[0], out)


def quad_fits_lanes(k: int, d: int, m: int, with_moments: bool,
                    param_elems: int = 0) -> bool:
    """Host-side static check that the lanes quadrature kernel can run this
    shape within its VMEM budget (vmap flattening never changes K/d/M, so
    the decision is stable under batching)."""
    return _row_block_quad(k, d, m, with_moments, LANE, param_elems) > 0

"""Pallas TPU kernel: fused sigma-point quadrature moments.

The hot loop of the framework (SURVEY.md section 7, "Batched nonlinear
factors + Pallas hot loop").  For a tile of factors the kernel

    1. places sigma points  pts = nodes @ L_k^T + mu_k        (MXU)
    2. evaluates the cost   phi = cost(pts)                   (VPU)
    3. reduces all three moments in VMEM:
           E[phi]                = w . phi
           E[(x-mu) phi]         = (w*phi) @ (pts - mu)
           E[(x-mu)(x-mu)^T phi] = (pts-mu)^T diag(w*phi) (pts-mu)

in one pass — the [K, M, d] sigma-point tensor never exists in HBM, and phi
is evaluated once (the reference's CUDA path launches three kernel types
over the same points, helpers/CudaOperation.cu:10-60, and its CPU path
integrates three separate lambdas, ngd/NGDFactorizedBaseGH.h:53-74).

The cost function must be expressible in Pallas-supported jnp ops over a
[B, d] block of points (all built-in factor models are); arbitrary cost
functions fall back to the fused-XLA path in factors/moments.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_K = 8  # factor-axis tile (sublane-aligned)


def _moments_kernel(
    cost_fn, squeezed, nodes_ref, weights_ref, mu_ref, chol_ref, *rest,
):
    # pallas passes all inputs first, then outputs
    param_refs = rest[:-3]
    e_phi_ref, e_xmu_ref, e_xxt_ref = rest[-3:]
    nodes = nodes_ref[...]                      # [M, d]
    w = weights_ref[...]                        # [M]
    mu = mu_ref[...]                            # [TK, d]
    chol = chol_ref[...]                        # [TK, d, d]
    tk = mu.shape[0]
    m, d = nodes.shape
    params = tuple(
        r[..., 0] if sq else r[...]  # 1-D params were lifted to [K, 1]
        for r, sq in zip(param_refs, squeezed)
    )
    # The whole tile is evaluated in ONE vectorized pass: sigma placement
    # as a broadcast-multiply reduce (d is tiny, so this is a VPU op — and
    # Mosaic has no mixed batched/unbatched dot_general to express it as a
    # batched matmul anyway), then a single cost evaluation over the
    # [TK, M, d] point block (kept 3-D: Mosaic cannot shape-cast away the
    # short trailing d axis).  The previous TILE_K-times Python unroll
    # emitted TILE_K copies of the cost function per tile, which blew the
    # compile time up past practicality (round-1 VERDICT item 2).
    # diff[k, m, e] = sum_d nodes[m, d] * chol[k, e, d]
    diff = jnp.sum(
        nodes[None, :, None, :] * chol[:, None, :, :], axis=-1
    )                                            # [TK, M, d]
    pts = diff + mu[:, None, :]

    def rep(p):
        # broadcast each factor's param row across its M sigma points
        return jnp.broadcast_to(p[:, None], (tk, m) + p.shape[1:])

    phi = cost_fn(pts, *[rep(p) for p in params])  # [TK, M]
    # reductions on the VPU in full f32: the MXU's internal bf16 passes
    # lose ~3 decimal digits on wphi's wide dynamic range (weights span
    # 1e-6..0.3 in high-degree rules)
    wphi = phi * w[None, :]                      # [TK, M]
    e_phi_ref[...] = jnp.sum(wphi, axis=1, keepdims=True)
    wd = wphi[:, :, None] * diff                 # [TK, M, d]
    e_xmu_ref[...] = jnp.sum(wd, axis=1)
    e_xxt_ref[...] = jnp.sum(
        wd[:, :, :, None] * diff[:, :, None, :], axis=1
    )


def fused_moments(
    nodes: jnp.ndarray,
    weights: jnp.ndarray,
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    cost_fn: Callable[..., jnp.ndarray],
    params: tuple[jnp.ndarray, ...] = (),
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (E[phi] [K], E[(x-mu)phi] [K,d], E[(x-mu)(x-mu)^T phi] [K,d,d]).

    ``cost_fn(pts [..., d], *params_rows [..., p]) -> [...]`` evaluates the
    factor cost batch-dim-agnostically (use ``pts[..., i]`` /
    ``axis=-1`` reductions — inside the kernel the block is [TK, M, d]);
    ``params`` is a tuple of arrays with leading K, broadcast per point
    inside the kernel.
    """
    k, d = mu.shape
    m = nodes.shape[0]
    # unrolled small-d factorization: exact f32 elementwise ops (and the
    # same factor the XLA moments path places points with)
    from ..ops.smallmat import chol_small

    chol = chol_small(cov)

    # rank-1 blocks can only tile in multiples of 128; lift 1-D params to 2-D
    squeezed = tuple(p.ndim == 1 for p in params)
    params = tuple(
        p[:, None] if sq else p for p, sq in zip(params, squeezed)
    )

    pad = (-k) % TILE_K
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, d), mu.dtype)])
        eye = jnp.broadcast_to(jnp.eye(d, dtype=chol.dtype), (pad, d, d))
        chol = jnp.concatenate([chol, eye])
        params = tuple(
            jnp.concatenate([p, jnp.zeros((pad,) + p.shape[1:], p.dtype)])
            for p in params
        )
    kp = k + pad

    kernel = functools.partial(_moments_kernel, cost_fn, squeezed)
    param_specs = [
        pl.BlockSpec(
            (TILE_K,) + p.shape[1:],
            (lambda i, nd=p.ndim: (i,) + (0,) * (nd - 1)),
        )
        for p in params
    ]
    out = pl.pallas_call(
        kernel,
        grid=(kp // TILE_K,),
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (0, 0)),          # nodes (shared)
            pl.BlockSpec((m,), lambda i: (0,)),              # weights
            pl.BlockSpec((TILE_K, d), lambda i: (i, 0)),     # mu tile
            pl.BlockSpec((TILE_K, d, d), lambda i: (i, 0, 0)),
            *param_specs,
        ],
        out_specs=[
            pl.BlockSpec((TILE_K, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE_K, d), lambda i: (i, 0)),
            pl.BlockSpec((TILE_K, d, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, 1), mu.dtype),
            jax.ShapeDtypeStruct((kp, d), mu.dtype),
            jax.ShapeDtypeStruct((kp, d, d), mu.dtype),
        ],
        interpret=interpret,
    )(nodes, weights, mu, chol, *params)
    e_phi, e_xmu, e_xxt = out
    return e_phi[:k, 0], e_xmu[:k], e_xxt[:k]


def fused_moments_vmappable(
    nodes: jnp.ndarray,
    weights: jnp.ndarray,
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    cost_fn: Callable[..., jnp.ndarray],
    params: tuple[jnp.ndarray, ...] = (),
    interpret: bool | None = None,
):
    """`fused_moments` wrapped so outer vmaps flatten onto the factor axis
    (pallas_call's generic batching rule emits untileable blocks).

    The quadrature rule must be SHARED across any vmapped problem batch
    (factor batches of one type always use one (dim, degree) rule; stacked
    problems carry identical copies) — a batched rule axis is collapsed to
    its first element.
    """
    if interpret is None:
        import jax as _jax

        interpret = _jax.default_backend() != "tpu"

    @jax.custom_batching.custom_vmap
    def call(nodes_, weights_, mu_, cov_, *params_):
        return fused_moments(
            nodes_, weights_, mu_, cov_, cost_fn, tuple(params_),
            interpret=interpret,
        )

    @call.def_vmap
    def _rule(axis_size, in_batched, nodes_, weights_, mu_, cov_, *params_):
        # shared-rule assumption: collapse a batched rule axis
        nodes_ = nodes_[0] if in_batched[0] else nodes_
        weights_ = weights_[0] if in_batched[1] else weights_

        # args not batched at this vmap level (e.g. factor params inside the
        # line-search trial vmap) are broadcast before flattening onto the
        # factor axis
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [
            ensure(x, flag)
            for x, flag in zip((mu_, cov_) + params_, in_batched[2:])
        ]
        mu_b, cov_b = args[0], args[1]
        b, k, d = mu_b.shape
        e_phi, e_xmu, e_xxt = call(
            nodes_, weights_,
            mu_b.reshape(b * k, d),
            cov_b.reshape(b * k, d, d),
            *[p.reshape((b * k,) + p.shape[2:]) for p in args[2:]],
        )
        out = (
            e_phi.reshape(b, k),
            e_xmu.reshape(b, k, d),
            e_xxt.reshape(b, k, d, d),
        )
        return out, (True, True, True)

    return call(nodes, weights, mu, cov, *params)


def make_batched_cost(cost_fn: Callable, params_struct: Any = None):
    """Adapt a per-point ``cost_fn(x [d], params)`` to the kernel's block
    signature ``(pts [..., d], *param_rows [..., p]) -> [...]`` by vmapping
    over every leading batch dim."""
    def nest_vmap(f, ndim):
        for _ in range(ndim - 1):
            f = jax.vmap(f)
        return f

    if params_struct is None:
        def batched(pts):
            return nest_vmap(lambda x: cost_fn(x, None), pts.ndim)(pts)
        return batched

    def batched(pts, *params_rows):
        def one(x, *rows):
            params = jax.tree.unflatten(params_struct, list(rows))
            return cost_fn(x, params)

        rows_b = tuple(
            jnp.broadcast_to(r, pts.shape[:-1] + r.shape[pts.ndim - 1:])
            for r in params_rows
        )
        return nest_vmap(one, pts.ndim)(pts, *rows_b)

    return batched

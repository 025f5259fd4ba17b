"""Pallas chain kernel: GBP covariance + log det in lanes layout.

The block-tridiagonal recurrences dominate the optimizer's runtime, and as
XLA ``lax.scan``s they execute ~2N sequential micro-ops with per-op
dispatch overhead — latency-bound for small blocks.  This kernel runs the
ENTIRE forward/backward sweep in one Pallas program with the batch axis B
packed onto full (8 sublanes x 128 lanes) vector registers:

    diag [B, N, s, s]  ->  kernel layout [N, s, s, R, 128],  R = ceil(B/128)

Every s x s matrix entry is an [R, 128]-tile, so the whole Cholesky /
triangular solve / Schur algebra unrolls (statically, s is tiny) into
elementwise VPU ops over full vregs — B problems march through the chain in
lockstep with no per-step XLA op overhead.  (A flat [B] trailing axis would
occupy one vreg per 128 elements with 7 of 8 sublanes idle; the 2-D packing
is worth ~6x on the 11-trial line-search batch.)

Outputs match ops.blocktridiag.gbp_covariance_logdet per batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# -- unrolled small-matrix algebra on lists of [B]-vector entries -----------

def _chol(a, s):
    """Lower Cholesky of an s x s SPD 'lanes matrix' a[i][j] -> L[i][j]."""
    l = [[None] * s for _ in range(s)]
    for j in range(s):
        acc = a[j][j]
        for k in range(j):
            acc = acc - l[j][k] * l[j][k]
        ljj = jnp.sqrt(acc)
        l[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, s):
            acc = a[i][j]
            for k in range(j):
                acc = acc - l[i][k] * l[j][k]
            l[i][j] = acc * inv
    return l

def _chol_solve_vec(l, b, s):
    """Solve (L L^T) x = b for one lanes vector b[i]."""
    y = [None] * s
    for i in range(s):
        acc = b[i]
        for k in range(i):
            acc = acc - l[i][k] * y[k]
        y[i] = acc / l[i][i]
    x = [None] * s
    for i in reversed(range(s)):
        acc = y[i]
        for k in range(i + 1, s):
            acc = acc - l[k][i] * x[k]
        x[i] = acc / l[i][i]
    return x


def _matmul(a, b, n, m, p, transpose_a=False):
    """c[i][j] = sum_k a[i][k] b[k][j] (or a[k][i] when transposed)."""
    c = [[None] * p for _ in range(n)]
    for i in range(n):
        for j in range(p):
            acc = None
            for k in range(m):
                term = (a[k][i] if transpose_a else a[i][k]) * b[k][j]
                acc = term if acc is None else acc + term
            c[i][j] = acc
    return c


def _logdet_from_chol(l, s):
    acc = jnp.log(l[0][0])
    for j in range(1, s):
        acc = acc + jnp.log(l[j][j])
    return 2.0 * acc


def _pivot_trust(l, piv_l, d_l, m_l, s, trust):
    """Update the running minimum pivot-trust statistic.

    For each diagonal j of the Schur pivot ``piv = d + m`` with Cholesky
    ``l``:  numer = L_jj^2 (the surviving pivot mass) against
    denom = |d_jj| + |m_jj| + |piv_jj - L_jj^2| (the total magnitude of
    everything that cancelled to produce it — the message subtraction AND
    the in-factorization sum of squares, using piv - L_jj^2 = sum_k
    L_jk^2).  When numer/denom falls to a few eps the computed pivot is
    pure rounding noise: the matrix has lost positive-definiteness at
    working precision and the logdet is garbage (the PERF.md section-14
    accept-collapse class: f32 chol of a near-indefinite trial produced
    tiny-positive pivots and a hugely negative "cost decrease").  Callers
    poison the logdet with NaN below the threshold so such trials are
    REJECTED, exactly as the reference's f64 backtracking rejects non-SPD
    proposals via NaN costs (gvibase/GVI-GH-impl.h:79-118).
    """
    for j in range(s):
        numer = l[j][j] * l[j][j]
        denom = (
            jnp.abs(d_l[j][j]) + jnp.abs(m_l[j][j])
            + jnp.abs(piv_l[j][j] - numer)
        )
        trust = jnp.minimum(trust, numer / denom)
    return trust


def _trust_tol(dtype) -> float:
    # 8 eps: trips only when fewer than ~3 significant bits survive the
    # cancellation — pure-noise pivots — while legitimate ill-conditioning
    # (local condition up to ~1/(8 eps)) passes through untouched
    return 8.0 * float(jnp.finfo(dtype).eps)


def _listify(arr, s):
    """[s, s, R, 128] traced array -> list-of-lists of [R, 128] tiles."""
    return [[arr[a, b] for b in range(s)] for a in range(s)]


def _stack(mat, s):
    return jnp.stack([jnp.stack([mat[a][b] for b in range(s)])
                      for a in range(s)])


def _gbp_kernel(n, s, d_ref, o_ref, covd_ref, covo_ref, ld_ref,
                fpiv_ref, gpiv_ref):
    """fori_loop over the chain: the s-structure unrolls statically, the
    N-loop compiles once (Mosaic chokes on a fully unrolled 3N-deep body).

    Refs carry a leading singleton grid axis (the batch-row chunk); scratch
    refs do not."""
    zero = jnp.zeros_like(d_ref[0, 0, 0, 0])
    zeros_m = jnp.zeros_like(d_ref[0, 0])
    tol = _trust_tol(d_ref.dtype)

    def fwd_body(i, carry):
        # (message, logdet, Kahan compensation, min pivot trust): the
        # logdet feeds line-search accept decisions, so it is accumulated
        # compensated and poisoned with NaN when any pivot cancels to
        # rounding noise (see _pivot_trust)
        m_arr, ld, comp, trust = carry
        d_l = _listify(d_ref[0, i], s)
        m_l = _listify(m_arr, s)
        piv_l = _listify(d_ref[0, i] + m_arr, s)
        fpiv_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        trust = _pivot_trust(l, piv_l, d_l, m_l, s, trust)
        term = _logdet_from_chol(l, s) - comp
        ld_new = ld + term
        comp = (ld_new - ld) - term
        ld = ld_new
        off = _listify(o_ref[0, jnp.minimum(i, n - 2)], s)
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(l, [off[r][col] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        btx = _matmul(off, x, s, s, s, transpose_a=True)
        m_next = _stack([[-btx[a][b] for b in range(s)]
                         for a in range(s)], s)
        keep = i < n - 1
        return (jnp.where(keep, m_next, m_arr), ld, comp, trust)

    if n > 1:
        _, ld, _, trust = jax.lax.fori_loop(
            0, n, fwd_body, (zeros_m, zero, zero, jnp.ones_like(zero))
        )
    else:
        piv_l = _listify(d_ref[0, 0], s)
        fpiv_ref[0] = d_ref[0, 0]
        l = _chol(piv_l, s)
        zl = [[zero] * s for _ in range(s)]
        trust = _pivot_trust(l, piv_l, piv_l, zl, s, jnp.ones_like(zero))
        ld = _logdet_from_chol(l, s)
    ld_ref[0] = jnp.where(trust >= tol, ld, jnp.full_like(ld, jnp.nan))

    def bwd_body(k, m_arr):
        i = n - 1 - k
        piv_l = _listify(d_ref[0, i] + m_arr, s)
        gpiv_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        off = _listify(o_ref[0, jnp.maximum(i - 1, 0)], s)  # B_{i-1}
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(l, [off[col][r] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        bx = _matmul(off, x, s, s, s)
        m_next = _stack([[-bx[a][b] for b in range(s)]
                         for a in range(s)], s)
        keep = i > 0
        return jnp.where(keep, m_next, m_arr)

    if n > 1:
        jax.lax.fori_loop(0, n, bwd_body, zeros_m)

    one = jnp.ones_like(zero)

    def edge_body(i, _):
        f = _listify(fpiv_ref[i], s)
        g = _listify(gpiv_ref[i + 1], s)
        off = _listify(o_ref[0, i], s)
        t = 2 * s
        joint = [[None] * t for _ in range(t)]
        for a in range(s):
            for b in range(s):
                joint[a][b] = f[a][b]
                joint[a][s + b] = off[a][b]
                joint[s + a][b] = off[b][a]
                joint[s + a][s + b] = g[a][b]
        l = _chol(joint, t)
        inv = [[None] * t for _ in range(t)]
        for col in range(t):
            sol = _chol_solve_vec(
                l, [one if r == col else zero for r in range(t)], t
            )
            for r in range(t):
                inv[r][col] = sol[r]
        covd_ref[0, i] = _stack([[inv[a][b] for b in range(s)]
                                 for a in range(s)], s)
        covo_ref[0, i] = _stack([[inv[a][s + b] for b in range(s)]
                                 for a in range(s)], s)

        @pl.when(i == n - 2)
        def _():
            covd_ref[0, n - 1] = _stack(
                [[inv[s + a][s + b] for b in range(s)] for a in range(s)], s
            )

        return 0

    if n > 1:
        jax.lax.fori_loop(0, n - 1, edge_body, 0)
    else:
        d_l = _listify(d_ref[0, 0], s)
        l = _chol(d_l, s)
        inv = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(
                l, [one if r == col else zero for r in range(s)], s
            )
            for r in range(s):
                inv[r][col] = sol[r]
        covd_ref[0, 0] = _stack(inv, s)


def _sds(shape, dtype, like):
    """ShapeDtypeStruct carrying the vma (varying-manual-axes) type of
    operand ``like``: under ``shard_map(check_vma=True)`` pallas_call
    requires its out_shapes to declare how outputs vary over the mesh —
    they vary exactly like the packed operands.  Outside shard_map
    ``vma`` is empty and this is a plain ShapeDtypeStruct."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


LANE = 128
# VMEM sizing: each grid step holds ~6 [N, s, s, RB, 128] f32 arrays
# (2 in, 2 out, 2 scratch).  N * s^2 * RB <= 8192 keeps that under the
# scoped-vmem ceiling (empirical: 8192 = the long-standing N=512/1-row
# configuration compiles; 12288 OOMs).
_MAX_ROW_ELEMS = 8192


def _row_block(n: int, s: int, batch: int) -> int:
    """Rows of 128 lanes per grid step under the VMEM budget (0 = doesn't
    fit even one row; callers fall back to the scan path).  Among the fits,
    picks the largest block that minimizes row padding for ``batch``.

    MULTI-grid-step configurations get HALF the budget: Pallas
    double-buffers the (large) covariance outputs across grid steps, and
    the long-misattributed "N>=256 dies in the remote compile helper"
    failures were exactly this — scoped-vmem stack OOMs at 16.3M vs the
    16M limit for [rb=2, grid=3, N=256] and [rb=1, grid=6, N=512] trial
    batches (the 8192 budget was calibrated on single-grid shapes, where
    no double-buffering happens)."""
    per_row = n * s * s
    rows = -(-batch // LANE)

    def fits(rb: int) -> bool:
        grid = -(-rows // rb)
        budget = _MAX_ROW_ELEMS if grid == 1 else _MAX_ROW_ELEMS // 2
        return per_row * rb <= budget

    cands = [rb for rb in range(1, 9) if fits(rb)]
    if not cands:
        return 0
    return min(cands, key=lambda rb: (-(-rows // rb) * rb, -rb))


def _pack(x, grid, rb):
    """[..., bp] -> [G, ..., RB, 128] with the grid-chunk axis leading;
    batch element b lives at chunk b // (RB*128), row (b // 128) % RB,
    lane b % 128."""
    y = x.reshape(x.shape[:-1] + (grid, rb, LANE))
    return jnp.moveaxis(y, -3, 0)


def _unpack(y, bp):
    """Inverse of _pack: [G, ..., RB, 128] -> [..., bp]."""
    x = jnp.moveaxis(y, 0, -3)
    return x.reshape(x.shape[:-3] + (bp,))


def gbp_covariance_logdet_lanes(
    diag: jnp.ndarray, off: jnp.ndarray, interpret: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched GBP covariance + logdet: diag [B,N,s,s], off [B,N-1,s,s]
    -> (cov_diag [B,N,s,s], cov_off [B,N-1,s,s], logdet [B]).

    B is padded to a multiple of 128 (the lane width) and packed as
    [R, 128] so sublanes are fully used.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, s, _ = diag.shape
    rb = _row_block(n, s, b)
    if rb == 0:
        per_row = n * s * s
        if per_row <= _MAX_ROW_ELEMS:
            # the shape fits a SINGLE-grid call but not the halved
            # multi-grid budget (e.g. N=512 s=4 trial batches): run the
            # batch as sequential chunks, each its own single-grid kernel
            # call — one compiled instance, no output double-buffering,
            # ~an order of magnitude faster than the scan fallback at
            # N=512.  Each chunk carries as many sublane rows as the FULL
            # (single-grid) budget allows, not just one (given the current
            # budgets per_row > _MAX_ROW_ELEMS//2 here so this is 1, but
            # the chunk width tracks the budget relation).
            rpc = min(8, _MAX_ROW_ELEMS // per_row)
            chunk = rpc * LANE
            pad = (-b) % chunk
            if pad:
                eye = jnp.broadcast_to(
                    jnp.eye(s, dtype=diag.dtype), (pad, n, s, s)
                )
                diag = jnp.concatenate([diag, eye])
                off = jnp.concatenate(
                    [off, jnp.zeros((pad, max(n - 1, 0), s, s), off.dtype)]
                )
            c = (b + pad) // chunk
            cd, co, ld = jax.lax.map(
                lambda t: gbp_covariance_logdet_lanes(t[0], t[1], interpret),
                (diag.reshape((c, chunk) + diag.shape[1:]),
                 off.reshape((c, chunk) + off.shape[1:])),
            )
            return (
                cd.reshape((c * chunk,) + cd.shape[2:])[:b],
                co.reshape((c * chunk,) + co.shape[2:])[:b],
                ld.reshape(c * chunk)[:b],
            )
        # chain too long for the VMEM budget: scan path (still batched)
        from ..ops.blocktridiag import BlockTridiag, gbp_covariance_logdet

        return jax.vmap(
            lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o))
        )(diag, off)
    pad = (-b) % (LANE * rb)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=diag.dtype), (pad, n, s, s))
        diag = jnp.concatenate([diag, eye])
        off = jnp.concatenate(
            [off, jnp.zeros((pad, max(n - 1, 0), s, s), off.dtype)]
        )
    bp = b + pad
    grid = bp // (LANE * rb)

    # [G, N, s, s, RB, 128]: the grid axis leads so each block's trailing
    # (RB, 128) equals the full array dims (a Mosaic tiling requirement)
    d_l = _pack(jnp.transpose(diag, (1, 2, 3, 0)), grid, rb)
    o_l = (
        _pack(jnp.transpose(off, (1, 2, 3, 0)), grid, rb)
        if n > 1 else jnp.zeros((grid, 1, s, s, rb, LANE), diag.dtype)
    )

    no = max(n - 1, 1)
    kernel = functools.partial(_gbp_kernel, n, s)
    covd, covo, ld = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, n, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, no, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, no, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, rb, LANE), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            _sds((grid, n, s, s, rb, LANE), diag.dtype, d_l),
            _sds((grid, no, s, s, rb, LANE), diag.dtype, d_l),
            _sds((grid, rb, LANE), diag.dtype, d_l),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, s, s, rb, LANE), diag.dtype),
            pltpu.VMEM((n, s, s, rb, LANE), diag.dtype),
        ],
        interpret=interpret,
    )(d_l, o_l)

    cov_diag = jnp.transpose(_unpack(covd, bp), (3, 0, 1, 2))[:b]
    cov_off = (
        jnp.transpose(_unpack(covo, bp), (3, 0, 1, 2))[:b]
        if n > 1 else jnp.zeros((b, 0, s, s), diag.dtype)
    )
    return cov_diag, cov_off, ld.reshape(bp)[:b]


def _solve_kernel(n, s, d_ref, o_ref, b_ref, x_ref, fpiv_ref, y_ref):
    """Block-Thomas solve A x = b in lanes layout (b_ref, x_ref:
    [1, N, s, RB, 128] blocks; scratch without the leading grid axis)."""
    zeros_m = jnp.zeros_like(d_ref[0, 0])

    def fwd_body(i, m_arr):
        piv_l = _listify(d_ref[0, i] + m_arr, s)
        fpiv_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        # y_i = b_i - B_{i-1}^T F_{i-1}^{-1} y_{i-1} handled below via
        # the same sweep: here compute the message for the NEXT pivot
        off = _listify(o_ref[0, jnp.minimum(i, n - 2)], s)
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(l, [off[r][col] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        btx = _matmul(off, x, s, s, s, transpose_a=True)
        m_next = _stack([[-btx[a][b] for b in range(s)]
                         for a in range(s)], s)
        return jnp.where(i < n - 1, m_next, m_arr)

    if n > 1:
        jax.lax.fori_loop(0, n, fwd_body, zeros_m)
    else:
        fpiv_ref[0] = d_ref[0, 0]

    def elim_body(i, _):
        # y_i = b_i - B_{i-1}^T F_{i-1}^{-1} y_{i-1}
        piv_l = _listify(fpiv_ref[jnp.maximum(i - 1, 0)], s)
        l = _chol(piv_l, s)
        y_prev = [y_ref[i - 1, r] for r in range(s)]
        sol = _chol_solve_vec(l, y_prev, s)
        off = _listify(o_ref[0, jnp.maximum(i - 1, 0)], s)  # B_{i-1}
        for r in range(s):
            acc = b_ref[0, i, r]
            for k in range(s):
                acc = acc - off[k][r] * sol[k]
            y_ref[i, r] = acc
        return 0

    y_ref[0] = b_ref[0, 0]
    if n > 1:
        jax.lax.fori_loop(1, n, elim_body, 0)

    def back_body(k, _):
        # x_i = F_i^{-1} (y_i - B_i x_{i+1}); the B-term is masked out for
        # the last state
        i = n - 1 - k
        piv_l = _listify(fpiv_ref[i], s)
        l = _chol(piv_l, s)
        rhs = [y_ref[i, r] for r in range(s)]
        off = _listify(o_ref[0, jnp.minimum(i, n - 2)], s)
        x_next = [x_ref[0, jnp.minimum(i + 1, n - 1), r] for r in range(s)]
        # select, not multiply: x_ref[i+1] is uninitialized scratch on the
        # first (i = n-1) step and 0 * NaN would poison the result
        rhs = [
            jnp.where(
                i < n - 1,
                rhs[r] - sum(off[r][c] * x_next[c] for c in range(s)),
                rhs[r],
            )
            for r in range(s)
        ]
        sol = _chol_solve_vec(l, rhs, s)
        for r in range(s):
            x_ref[0, i, r] = sol[r]
        return 0

    jax.lax.fori_loop(0, n, back_body, 0)


def solve_lanes(
    diag: jnp.ndarray, off: jnp.ndarray, b: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched SPD block-tridiagonal solve: diag [B,N,s,s], off [B,N-1,s,s],
    b [B,N,s] -> x [B,N,s], lanes-kernel backed."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, n, s, _ = diag.shape
    rb = _row_block(n, s, bsz)
    if rb == 0:
        per_row = n * s * s
        if per_row <= _MAX_ROW_ELEMS:
            # sequential single-grid chunks, widest row block the full
            # budget allows (see the covariance wrapper above)
            rpc = min(8, _MAX_ROW_ELEMS // per_row)
            chunk = rpc * LANE
            pad = (-bsz) % chunk
            if pad:
                eye = jnp.broadcast_to(
                    jnp.eye(s, dtype=diag.dtype), (pad, n, s, s)
                )
                diag = jnp.concatenate([diag, eye])
                off = jnp.concatenate(
                    [off, jnp.zeros((pad, max(n - 1, 0), s, s), off.dtype)]
                )
                b = jnp.concatenate([b, jnp.zeros((pad, n, s), b.dtype)])
            c = (bsz + pad) // chunk
            x = jax.lax.map(
                lambda t: solve_lanes(t[0], t[1], t[2], interpret),
                (diag.reshape((c, chunk) + diag.shape[1:]),
                 off.reshape((c, chunk) + off.shape[1:]),
                 b.reshape((c, chunk) + b.shape[1:])),
            )
            return x.reshape((c * chunk,) + x.shape[2:])[:bsz]
        from ..ops.blocktridiag import BlockTridiag, solve as solve_scan

        return jax.vmap(
            lambda d, o, rhs: solve_scan(
                BlockTridiag(d, o), rhs.reshape(-1)
            ).reshape(n, s)
        )(diag, off, b)
    pad = (-bsz) % (LANE * rb)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=diag.dtype), (pad, n, s, s))
        diag = jnp.concatenate([diag, eye])
        off = jnp.concatenate(
            [off, jnp.zeros((pad, max(n - 1, 0), s, s), off.dtype)]
        )
        b = jnp.concatenate([b, jnp.zeros((pad, n, s), b.dtype)])
    bp = bsz + pad
    grid = bp // (LANE * rb)

    d_l = _pack(jnp.transpose(diag, (1, 2, 3, 0)), grid, rb)
    o_l = (
        _pack(jnp.transpose(off, (1, 2, 3, 0)), grid, rb)
        if n > 1 else jnp.zeros((grid, 1, s, s, rb, LANE), diag.dtype)
    )
    b_l = _pack(jnp.transpose(b, (1, 2, 0)), grid, rb)  # [G, N, s, RB, 128]

    no = max(n - 1, 1)
    kernel = functools.partial(_solve_kernel, n, s)
    x_l = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, n, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, no, s, s, rb, LANE), lambda g: (g, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, n, s, rb, LANE), lambda g: (g, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, s, rb, LANE), lambda g: (g, 0, 0, 0, 0)),
        out_shape=_sds((grid, n, s, rb, LANE), diag.dtype, d_l),
        scratch_shapes=[
            pltpu.VMEM((n, s, s, rb, LANE), diag.dtype),
            pltpu.VMEM((n, s, rb, LANE), diag.dtype),
        ],
        interpret=interpret,
    )(d_l, o_l, b_l)
    return jnp.transpose(_unpack(x_l, bp), (2, 0, 1))[:bsz]


@jax.custom_batching.custom_vmap
def _solve_lanes_batched(diag, off, b):
    return solve_lanes(diag, off, b)


@_solve_lanes_batched.def_vmap
def _solve_lanes_rule(axis_size, in_batched, diag, off, b):
    diag = _ensure_batched(axis_size, diag, in_batched[0])
    off = _ensure_batched(axis_size, off, in_batched[1])
    b = _ensure_batched(axis_size, b, in_batched[2])
    b2, bb = diag.shape[:2]
    n, s = diag.shape[2], diag.shape[3]
    x = _solve_lanes_batched(
        diag.reshape(b2 * bb, n, s, s),
        off.reshape(b2 * bb, max(n - 1, 0), s, s),
        b.reshape(b2 * bb, n, s),
    )
    return x.reshape(b2, bb, n, s), True


def solve_lanes_single(precision, b):
    """Drop-in for ops.blocktridiag.solve on one problem (flat rhs [N*s])."""
    n, s = precision.diag.shape[0], precision.diag.shape[-1]
    x = _solve_lanes_batched(
        precision.diag[None], precision.off[None], b.reshape(1, n, s)
    )
    return x[0].reshape(b.shape)


# -- vmap composition --------------------------------------------------------
# pallas_call's generic batching rule emits non-tileable block shapes, so the
# batched entry point carries a custom rule that FLATTENS any number of outer
# vmap axes into the kernel's lane axis — nested vmaps (problems x line-search
# trials) all land on lanes.

@jax.custom_batching.custom_vmap
def _lanes_batched(diag, off):
    return gbp_covariance_logdet_lanes(diag, off)


def _ensure_batched(axis_size, x, batched):
    return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@_lanes_batched.def_vmap
def _lanes_batched_rule(axis_size, in_batched, diag, off):
    diag = _ensure_batched(axis_size, diag, in_batched[0])
    off = _ensure_batched(axis_size, off, in_batched[1])
    b2, b = diag.shape[:2]
    n, s = diag.shape[2], diag.shape[3]
    cd, co, ld = _lanes_batched(
        diag.reshape(b2 * b, n, s, s),
        off.reshape(b2 * b, max(n - 1, 0), s, s),
    )
    out = (
        cd.reshape(b2, b, n, s, s),
        co.reshape(b2, b, max(n - 1, 0), s, s),
        ld.reshape(b2, b),
    )
    return out, (True, True, True)


def gbp_covariance_logdet_lanes_single(precision):
    """Drop-in for ops.blocktridiag.gbp_covariance_logdet on ONE problem,
    lanes-kernel backed.  Efficient only under outer vmap (the batch axes
    flatten onto the 128 lanes); a truly unbatched call pads to 128 lanes.
    """
    cd, co, ld = _lanes_batched(
        precision.diag[None], precision.off[None]
    )
    return cd[0], co[0], ld[0]

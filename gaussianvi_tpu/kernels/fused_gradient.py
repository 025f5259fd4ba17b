"""Fused NGD gradient kernel: covariance + sigma-point moments + joint
natural-gradient assembly + BOTH block-Thomas solves in ONE Pallas program.

Round-3 device traces (PERF.md section 18) left B=1024 spending 16% of the
iteration in width-B pack/unpack copies around exactly four phases: the
per-iteration gradient quadrature, the NGD assembly einsums, the
natural-gradient solve, and the accepted-iterate chain call.  This kernel is
the sibling of :mod:`.fused_trials` for that remaining width-B work — the
whole gradient step stays in VMEM:

* Inputs are the CURRENT iterate ``mu``, ``(prec_diag, prec_off)`` and the
  per-problem temperature, packed once at width B (problems on lanes), plus
  the same iterate-independent factor operands the fused trial kernel uses
  (quadrature rules, linear residual forms) — the two kernels share one
  operand prep (:meth:`..inference.engine.LocalEngine._build_fused_specs`).
* The GBP forward/backward sweeps and per-edge 2s x 2s covariance inversion
  (the exact algorithm of :mod:`.chain_lanes`) are FUSED with the factor
  gradient math: as each state's marginal covariance comes out of the joint
  inverse it is consumed immediately by the sigma-point MOMENT quadrature
  (E[phi], E[(x-mu)phi], E[(x-mu)(x-mu)^T phi] in one pass — the reference
  evaluates phi three times, ngd/NGDFactorizedBaseGH.h:53-74) and the NGD
  local gradients Vdmu_k = P_k E[(x-mu)phi]/T, Vddmu_k = (P_k E_xxt P_k -
  P_k E[phi])/T, scatter-added into joint scratch.  Linear factors
  contribute their closed-form gradients in-kernel from the residual form:
  Vdmu = 2 Lam^T prec_c (Lam mu - pm), Vddmu = 2 A — the Isserlis-collapsed
  identity of factors/moments.linear_local_gradients (reference
  ngd/NGDFactorizedLinear.h:104-119), assuming symmetric target precisions
  (every library prior builds them symmetric).
* After assembly the kernel emits ``dprec = Vddmu - Lambda`` and runs BOTH
  natural-gradient solves — Thomas over Vddmu (pivoted in place over the
  Vddmu scratch) and the SPD fallback over Lambda, whose pivots are the
  forward sweep's, already in scratch — returning ``dmu`` and
  ``dmu_fallback`` directly.  An indefinite Vddmu NaNs its Cholesky and the
  caller's finite-check picks the fallback, exactly like the XLA path.
* The covariance blocks ARE emitted (unlike the trial kernel): they are the
  per-iteration record the reference's VIMPResults keeps
  (helpers/DataRecorder.h:96-118), and with this kernel in the loop the
  separate accepted-iterate chain call of the fused-trials path is deleted
  (the next iteration's gradient kernel recomputes covariance from the
  updated precision in-kernel).

Reference analog: one iteration of the batched CUDA path
(gvibase/GVI-GH-Cuda-impl.h:150-286 — GBP inverse, batched moment kernels,
derivative mapping, CG solve), which crosses the host<->device boundary
between every phase; here the phases never leave VMEM.

Layout contract matches :mod:`.chain_lanes` / :mod:`.fused_trials`: batch
packed on (RB sublanes x 128 lanes); grid = batch chunks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_lanes import (
    LANE,
    _chol,
    _chol_solve_vec,
    _listify,
    _logdet_from_chol,
    _matmul,
    _pack,
    _pivot_trust,
    _sds,
    _stack,
    _trust_tol,
    _unpack,
)
from .fused_trials import (
    LinTrialSpec,
    NLTrialSpec,
    _inv_from_chol,
    _pad_m,
    _pad_rule,
)
from .quad_lanes import _M_CHUNK

# Empirical VMEM budget (f32/v5e): total elements per 128-lane row summed
# over resident arrays (inputs and outputs double-buffered, scratch single).
# Device probe (scripts/fused_grad_ab.py --probe, round 4): the bench shape
# (N=32, s=4, per_row=10,596) compiles and runs FASTEST at rb=8
# (301k prob-iters/s at B=1024 vs 269k at the rb=2 a 24k budget allowed) —
# v5e VMEM is far larger than the 16M default scoped-vmem cap the chain
# kernel's budget was calibrated against.  90k admits rb=8 there while
# still declining N>=128 shapes (per_row ~42k at N=128 caps rb=2).
# GVI_KERNEL_VMEM_SCALE rescales for targets enforcing the scoped cap
# (kernels/budgets.py).
_MAX_ROW_ELEMS_GRAD = 90_000

# Max grid steps per pallas_call: XLA places this kernel's output buffers
# in SCOPED vmem scaled by the grid count (B=8192 at rb=8 -> grid 8 ->
# 18.7M > the 16M scoped stack limit, compile-time OOM; grid <= 4
# measured fine through B=4096).  Larger batches are CHUNKED into
# multiple calls over the packed grid axis — same total work, bounded
# scoped footprint.
_MAX_GRID = 4


def _grad_budget() -> int:
    from .budgets import scaled

    return scaled(_MAX_ROW_ELEMS_GRAD)


def row_elems_grad(n: int, s: int,
                   nl_specs: tuple[NLTrialSpec, ...],
                   lin_specs: tuple[LinTrialSpec, ...],
                   mode: str = "full") -> int:
    """VMEM accounting: elements per 128-lane row.

    ``mode`` selects the kernel variant (see :func:`gradient_lanes`):
    "full" (single-device), "accum" (per-shard partial gradients; no
    dprec/solve outputs, no y scratch) or "solve" (seeded accumulators +
    linear factors + solves; extra seed inputs)."""
    no = max(n - 1, 1)
    per = 2 * (n * s + n * s * s + no * s * s + 1)        # mu, pd, po, temp
    if mode == "solve":
        # seed inputs: vdmu, vdd diag, vdd off (x2 buf)
        per += 2 * (n * s + n * s * s + no * s * s)
    if mode == "accum":
        # outputs: vdmu, vdd diag, vdd off (x2 buf)
        per += 2 * (n * s + n * s * s + no * s * s)
        # scratch: fpiv, vdd, vdo, vdmu (no y — no solves)
        per += 2 * n * s * s + no * s * s + n * s
    else:
        # outputs: cov_d, cov_o, ld, dprec_d, dprec_o, dmu, dmu_fb (x2 buf)
        per += 2 * (2 * n * s * s + 2 * no * s * s + 2 * n * s + 1)
        # scratch: fpiv, vdd, vdo, vdmu, y
        per += 2 * n * s * s + no * s * s + 2 * n * s
    for sp in nl_specs:
        m = _pad_m(sp.m)
        per += 2 * ((s + 1) * m)
        per += 2 * sum(sp.k * math.prod(sh) for sh in sp.param_shapes)
    for sp in lin_specs:
        blocks = 3 if sp.nb == 2 else 1
        per += 2 * sp.ka * (
            blocks * s * s + sp.r * sp.nb * s + sp.r + sp.r * sp.r
        )
    return per


def _layout_grad(n, s, nl_specs, lin_specs, batch, mode="full") -> int:
    """Sublane rows per grid step (0 = over budget).  Unlike the trial
    kernel there is no per-trial serialization, so rb = 1 layouts are
    admitted (they behave like any other width-B lanes kernel call)."""
    budget = _grad_budget()
    per_row = row_elems_grad(n, s, nl_specs, lin_specs, mode)
    if per_row > budget:
        return 0
    cap = min(8, budget // per_row)
    rows = -(-batch // LANE)
    return min(
        range(1, cap + 1),
        key=lambda rb: (-(-rows // rb) * rb, -rb),
    )


def grad_fits_lanes(n, s, nl_specs, lin_specs, mode: str = "full") -> bool:
    """Static eligibility: n >= 2 and the shape fits the VMEM budget."""
    if n < 2:
        return False
    return _layout_grad(n, s, nl_specs, lin_specs, LANE, mode) > 0


def sharded_grad_fits_lanes(n, s, nl_specs, lin_specs) -> bool:
    """Static eligibility for the fp-sharded SPLIT pair: the per-shard
    accumulate kernel (nonlinear shard only) and the post-psum solve
    kernel (linear factors + solves) must each fit."""
    return (
        grad_fits_lanes(n, s, nl_specs, (), mode="accum")
        and grad_fits_lanes(n, s, (), lin_specs, mode="solve")
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _grad_kernel(n, s, nl_specs, lin_specs, eval_dtype, mode,
                 mu_ref, pd_ref, po_ref, temp_ref, *rest):
    """Grid = (batch chunk g,).  Refs:

    mu [1, N, s, RB, 128]; pd [1, N, s, s, RB, 128];
    po [1, NO, s, s, RB, 128]; temp [1, RB, 128];
    [mode "solve" only: seed vdmu [1, N, s, RB, 128],
    seed vdd [1, N, s, s, RB, 128], seed vdo [1, NO, s, s, RB, 128] —
    the fp-psum'd partial gradients from the "accum" kernels;]
    then per nl batch: (starts [K] SMEM if dynamic), nodes [1, s, M, RB,
    128], w [1, M, RB, 128], param leaves [1, K, *leaf, RB, 128];
    then per lin batch: (starts [K] SMEM if dynamic),
    a [1, Ka, (3 if nb==2 else 1), s, s, RB, 128],
    lam [1, Ka, r, nb*s, RB, 128], pm [1, Ka, r, RB, 128],
    prec_c [1, Ka, r, r, RB, 128].
    Outputs ("full"/"solve"): covd [1, N, s, s, RB, 128],
    covo [1, NO, s, s, RB, 128], ld [1, RB, 128],
    dpd [1, N, s, s, RB, 128], dpo [1, NO, s, s, RB, 128],
    dmu [1, N, s, RB, 128], dfb [1, N, s, RB, 128];
    ("accum"): vdmu_o [1, N, s, RB, 128], vdd_o [1, N, s, s, RB, 128],
    vdo_o [1, NO, s, s, RB, 128].
    Scratch: fpiv [N, s, s, RB, 128], vdd [N, s, s, RB, 128] (Vddmu diag,
    pivoted in place by solve #1), vdo [NO, s, s, RB, 128] (Vddmu off),
    vdmu [N, s, RB, 128], y [N, s, RB, 128] ("full"/"solve" only).

    The three modes split the single-device program at the fp-psum
    boundary (VERDICT r4 item 1; reference: the all-nonlinear-factor
    batched CUDA launch, gvibase/GVI-GH-Cuda-impl.h:161-192): "accum"
    evaluates THIS SHARD's nonlinear factors against the (fp-replicated)
    chain covariance and emits the partial (Vdmu, Vddmu); the psum over fp
    happens in XLA between the kernels; "solve" re-runs the (cheap) chain
    sweeps to emit covariance/logdet with fp-INVARIANT vma typing, adds
    the fp-replicated linear factors' closed-form gradients, and runs
    dprec + both Thomas solves.
    """
    seed_refs = None
    pos = 0
    if mode == "solve":
        seed_refs = rest[:3]
        pos = 3
    nl_refs = []
    for sp in nl_specs:
        starts = None
        if sp.slice_offset is None:
            starts = rest[pos]
            pos += 1
        nodes, w = rest[pos], rest[pos + 1]
        pos += 2
        params = rest[pos:pos + len(sp.param_shapes)]
        pos += len(sp.param_shapes)
        nl_refs.append((starts, nodes, w, params))
    lin_refs = []
    for sp in lin_specs:
        starts = None
        if sp.slice_offset is None:
            starts = rest[pos]
            pos += 1
        lin_refs.append(
            (starts, rest[pos], rest[pos + 1], rest[pos + 2], rest[pos + 3])
        )
        pos += 4
    if mode == "accum":
        (vdmu_o_ref, vdd_o_ref, vdo_o_ref,
         fpiv_ref, vdd_ref, vdo_ref, vdmu_ref) = rest[pos:]
        covd_ref = covo_ref = ld_ref = None
        dpd_ref = dpo_ref = dmu_ref = dfb_ref = y_ref = None
    else:
        (covd_ref, covo_ref, ld_ref, dpd_ref, dpo_ref, dmu_ref, dfb_ref,
         fpiv_ref, vdd_ref, vdo_ref, vdmu_ref, y_ref) = rest[pos:]

    inv_t = 1.0 / temp_ref[0]                       # [RB, 128]
    zero = jnp.zeros_like(inv_t)
    one = jnp.ones_like(inv_t)
    zeros_m = jnp.zeros_like(pd_ref[0, 0])          # [s, s, RB, 128]
    zeros_v = jnp.zeros_like(mu_ref[0, 0])          # [s, RB, 128]

    # ---- phase 0: initialize the gradient accumulators --------------------
    # zeros, or (mode "solve") the psum'd partial gradients
    def zero_body(i, _):
        if mode == "solve":
            svd, svdd, svdo = seed_refs
            vdd_ref[i] = svdd[0, i]
            vdmu_ref[i] = svd[0, i]
        else:
            vdd_ref[i] = zeros_m
            vdmu_ref[i] = zeros_v

        @pl.when(i < n - 1)
        def _():
            if mode == "solve":
                vdo_ref[i] = seed_refs[2][0, i]
            else:
                vdo_ref[i] = zeros_m

        return 0

    jax.lax.fori_loop(0, n, zero_body, 0)

    # ---- phase 1: forward sweep over Lambda: pivots + logdet ---------------
    # Kahan-compensated + pivot-trust guarded, like the chain kernel
    tol = _trust_tol(mu_ref.dtype)

    def fwd_body(i, carry):
        m_arr, ld, comp, trust = carry
        d_l = _listify(pd_ref[0, i], s)
        m_l = _listify(m_arr, s)
        piv_l = _listify(pd_ref[0, i] + m_arr, s)
        fpiv_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        trust = _pivot_trust(l, piv_l, d_l, m_l, s, trust)
        term = _logdet_from_chol(l, s) - comp
        ld_new = ld + term
        comp = (ld_new - ld) - term
        ld = ld_new
        off = _listify(po_ref[0, jnp.minimum(i, n - 2)], s)
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

    _, ld, _, trust = jax.lax.fori_loop(
        0, n, fwd_body, (zeros_m, zero, zero, jnp.ones_like(zero))
    )
    if mode != "accum":
        ld_ref[0] = jnp.where(trust >= tol, ld, jnp.full_like(ld, jnp.nan))

    # ---- factor gradient helpers ------------------------------------------
    tri = [(i, j) for i in range(s) for j in range(i + 1)]

    def quad_moments(sp, refs, k, mu_c, chol_l):
        """(e_phi, e_xmu list[s], e_xxt tri list) of factor k of an nb==1
        nonlinear batch at marginal (mu_c list[s], chol(cov) chol_l)."""
        _, nodes_ref, w_ref, param_refs = refs
        params = tuple(pr[0, k] for pr in param_refs)
        m_pad = w_ref.shape[1]
        n_chunks = m_pad // _M_CHUNK
        n_acc = 1 + s + len(tri)

        def chunk_body(c, acc):
            sl = pl.ds(c * _M_CHUNK, _M_CHUNK)
            diff = []
            for i in range(s):
                t = None
                for j in range(i + 1):
                    term = nodes_ref[0, j, sl] * chol_l[i][j][None]
                    t = term if t is None else t + term
                if eval_dtype is not None:
                    # centered offset quantization (moments._sigma_diffs)
                    t = t.astype(eval_dtype).astype(t.dtype)
                diff.append(t)
            pts = tuple(diff[i] + mu_c[i][None] for i in range(s))
            phi = sp.lanes_cost(pts, *params)
            wphi = phi * w_ref[0, sl]
            out = [acc[0] + jnp.sum(wphi, axis=0)]
            wd = [wphi * diff[i] for i in range(s)]
            out += [acc[1 + i] + jnp.sum(wd[i], axis=0) for i in range(s)]
            out += [
                acc[1 + s + t_] + jnp.sum(wd[i] * diff[j], axis=0)
                for t_, (i, j) in enumerate(tri)
            ]
            return tuple(out)

        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, (zero,) * n_acc)
        return acc[0], list(acc[1:1 + s]), list(acc[1 + s:])

    def nl_gradient(sp, refs, k, i, mu_c, cov_l):
        """Accumulate NGD local gradients of nonlinear factor k at state i
        (ngd/NGDFactorizedBaseGH.h:53-74 math, fused with the moments)."""
        chol_l = _chol(cov_l, s)
        e_phi, e_xmu, e_xxt_tri = quad_moments(sp, refs, k, mu_c, chol_l)
        e_xxt = [[None] * s for _ in range(s)]
        for t_, (a_, b_) in enumerate(tri):
            e_xxt[a_][b_] = e_xxt_tri[t_]
            e_xxt[b_][a_] = e_xxt_tri[t_]
        if sp.rdim is not None and sp.rdim < s:
            # configuration-marginal quadrature: add the closed-form
            # conditional-moment lift (moments.gh_moments) —
            # corr = L[:, r:] L[:, r:]^T, a cancellation-free sum of
            # products nonzero only where BOTH indices are >= rdim
            for a_ in range(sp.rdim, s):
                for b_ in range(sp.rdim, a_ + 1):
                    c_ab = None
                    for t_ in range(sp.rdim, b_ + 1):
                        term = chol_l[a_][t_] * chol_l[b_][t_]
                        c_ab = term if c_ab is None else c_ab + term
                    c_ab = c_ab * e_phi
                    e_xxt[a_][b_] = e_xxt[a_][b_] + c_ab
                    if b_ != a_:
                        e_xxt[b_][a_] = e_xxt[b_][a_] + c_ab
        p = _inv_from_chol(chol_l, s, one, zero)       # marginal precision
        # Vdmu_k = P e_xmu / T
        vd_new = []
        for r in range(s):
            acc = vdmu_ref[i, r]
            for c in range(s):
                acc = acc + p[r][c] * e_xmu[c] * inv_t
            vd_new.append(acc)
        for r in range(s):
            vdmu_ref[i, r] = vd_new[r]
        # Vddmu_k = sym(P E P) - P e_phi, / T
        pe = _matmul(p, e_xxt, s, s, s)
        pep = _matmul(pe, p, s, s, s)
        contrib = [[None] * s for _ in range(s)]
        for a_ in range(s):
            for b_ in range(s):
                contrib[a_][b_] = (
                    0.5 * (pep[a_][b_] + pep[b_][a_]) - p[a_][b_] * e_phi
                ) * inv_t
        vdd_ref[i] = vdd_ref[i] + _stack(contrib, s)

    def _lin_resid_w(refs, kk, r, mu_e):
        """w = prec_c (Lam mu - pm): the residual premultiplied, shared by
        the Vdmu rows."""
        _, _, lam_ref, pm_ref, prec_ref = refs
        de = len(mu_e)
        resid = []
        for rr in range(r):
            acc = -pm_ref[0, kk, rr]
            for d_ in range(de):
                acc = acc + lam_ref[0, kk, rr, d_] * mu_e[d_]
            resid.append(acc)
        w = []
        for rr in range(r):
            acc = None
            for cc in range(r):
                term = prec_ref[0, kk, rr, cc] * resid[cc]
                acc = term if acc is None else acc + term
            w.append(acc)
        return w

    def lin_gradient_nb1(refs, k, sp, i, mu_c):
        """Anchor factor: Vdmu = 2 Lam^T w / T, Vddmu = 2 A / T
        (ngd/NGDFactorizedLinear.h:104-119, Isserlis collapsed)."""
        _, a_ref, lam_ref, _, _ = refs
        kk = jnp.minimum(k, sp.ka - 1)
        w = _lin_resid_w(refs, kk, sp.r, mu_c)
        vd_new = []
        for d_ in range(s):
            acc = vdmu_ref[i, d_]
            for rr in range(sp.r):
                acc = acc + 2.0 * lam_ref[0, kk, rr, d_] * w[rr] * inv_t
            vd_new.append(acc)
        for d_ in range(s):
            vdmu_ref[i, d_] = vd_new[d_]
        vdd_ref[i] = vdd_ref[i] + 2.0 * a_ref[0, kk, 0] * inv_t[None, None]

    def lin_gradient_nb2(refs, k, sp, i, mu_i, mu_j):
        """Edge factor: Vdmu rows split across states i/i+1; Vddmu blocks
        A11 -> diag i, A22 -> diag i+1, A12 -> off i (the blockwise form of
        inference/graph.scatter_gradients)."""
        _, a_ref, lam_ref, _, _ = refs
        kk = jnp.minimum(k, sp.ka - 1)
        w = _lin_resid_w(refs, kk, sp.r, mu_i + mu_j)
        vd_i, vd_j = [], []
        for d_ in range(s):
            acc_i = vdmu_ref[i, d_]
            acc_j = vdmu_ref[i + 1, d_]
            for rr in range(sp.r):
                acc_i = acc_i + 2.0 * lam_ref[0, kk, rr, d_] * w[rr] * inv_t
                acc_j = acc_j + (
                    2.0 * lam_ref[0, kk, rr, s + d_] * w[rr] * inv_t
                )
            vd_i.append(acc_i)
            vd_j.append(acc_j)
        for d_ in range(s):
            vdmu_ref[i, d_] = vd_i[d_]
            vdmu_ref[i + 1, d_] = vd_j[d_]
        two_t = 2.0 * inv_t[None, None]
        vdd_ref[i] = vdd_ref[i] + a_ref[0, kk, 0] * two_t
        vdd_ref[i + 1] = vdd_ref[i + 1] + a_ref[0, kk, 1] * two_t
        vdo_ref[i] = vdo_ref[i] + a_ref[0, kk, 2] * two_t

    def state_mu(i):
        return [mu_ref[0, i, r] for r in range(s)]

    def eval_state(i, cov_l, mu_c):
        """All per-STATE gradient contributions at state i."""
        for sp, refs in zip(nl_specs, nl_refs):
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, k=k):
                    nl_gradient(sp, refs, k, i, mu_c, cov_l)
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, k=k):
                        nl_gradient(sp, refs, k, i, mu_c, cov_l)
        for sp, refs in zip(lin_specs, lin_refs):
            if sp.nb != 1:
                continue
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, k=k):
                    lin_gradient_nb1(refs, k, sp, i, mu_c)
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, k=k):
                        lin_gradient_nb1(refs, k, sp, i, mu_c)

    # ---- phase 2: backward sweep fused with edge inversion + gradients -----
    # the carry is the backward MESSAGE (zeros init), not the pivot: a
    # fori carry seeded from a ref READ is vma-varying under compiled
    # shard_map while the body's output is not, and the scan then fails to
    # type-check — the message form (the chain kernel's pattern) keeps the
    # init a plain constant
    def bwd_body(kk, m_arr):
        i = n - 2 - kk
        f = _listify(fpiv_ref[i], s)
        g = _listify(pd_ref[0, i + 1] + m_arr, s)
        off = _listify(po_ref[0, i], s)
        t = 2 * s
        joint = [[None] * t for _ in range(t)]
        for a_ in range(s):
            for b_ in range(s):
                joint[a_][b_] = f[a_][b_]
                joint[a_][s + b_] = off[a_][b_]
                joint[s + a_][b_] = off[b_][a_]
                joint[s + a_][s + b_] = g[a_][b_]
        lj = _chol(joint, t)
        inv = _inv_from_chol(lj, t, one, zero)
        cii = [[inv[a][b] for b in range(s)] for a in range(s)]
        cjj = [[inv[s + a][s + b] for b in range(s)] for a in range(s)]
        cij = [[inv[a][s + b] for b in range(s)] for a in range(s)]
        if mode != "accum":
            covd_ref[0, i] = _stack(cii, s)
            covo_ref[0, i] = _stack(cij, s)

        mu_i = state_mu(i)
        mu_j = state_mu(i + 1)
        eval_state(i, cii, mu_i)

        @pl.when(i == n - 2)
        def _():
            if mode != "accum":
                covd_ref[0, n - 1] = _stack(cjj, s)
            eval_state(n - 1, cjj, mu_j)

        for sp, refs in zip(lin_specs, lin_refs):
            if sp.nb != 2:
                continue
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, k=k):
                    lin_gradient_nb2(refs, k, sp, i, mu_i, mu_j)
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, k=k):
                        lin_gradient_nb2(refs, k, sp, i, mu_i, mu_j)

        # next message: m_i = -B_i gpiv_{i+1}^{-1} B_i^T
        lg = _chol(g, s)
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(lg, [off[col][r] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        msg_i = [[None] * s for _ in range(s)]
        for a_ in range(s):
            for b_ in range(s):
                acc = None
                for r in range(s):
                    term = off[a_][r] * x[r][b_]
                    acc = term if acc is None else acc + term
                msg_i[a_][b_] = -acc
        return _stack(msg_i, s)

    jax.lax.fori_loop(0, n - 1, bwd_body, zeros_m)

    if mode == "accum":
        # emit the partial accumulators; the psum + solves happen outside
        def emit_body(i, _):
            vdd_o_ref[0, i] = vdd_ref[i]
            vdmu_o_ref[0, i] = vdmu_ref[i]

            @pl.when(i < n - 1)
            def _():
                vdo_o_ref[0, i] = vdo_ref[i]

            return 0

        jax.lax.fori_loop(0, n, emit_body, 0)
        return

    # ---- phase 3: dprec = Vddmu - Lambda ------------------------------------
    def dprec_body(i, _):
        dpd_ref[0, i] = vdd_ref[i] - pd_ref[0, i]

        @pl.when(i < n - 1)
        def _():
            dpo_ref[0, i] = vdo_ref[i] - po_ref[0, i]

        return 0

    jax.lax.fori_loop(0, n, dprec_body, 0)

    # ---- phase 4: Thomas solve Vddmu dmu = -Vdmu ----------------------------
    # forward pivots IN PLACE over the Vddmu diag scratch (each diag block
    # is read exactly once, at its own step, before being overwritten)
    def s1_fwd(i, m_arr):
        piv_l = _listify(vdd_ref[i] + m_arr, s)
        vdd_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        off = _listify(vdo_ref[jnp.minimum(i, n - 2)], s)
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(l, [off[r][col] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        btx = _matmul(off, x, s, s, s, transpose_a=True)
        m_next = _stack([[-btx[a][b] for b in range(s)]
                         for a in range(s)], s)
        return jnp.where(i < n - 1, m_next, m_arr)

    jax.lax.fori_loop(0, n, s1_fwd, zeros_m)

    def _solve_sweeps(piv_at, off_at, x_out_ref):
        """Elimination + back-substitution with rhs = -Vdmu, pivots/offs
        provided by accessors (chain_lanes._solve_kernel structure)."""
        for r in range(s):
            y_ref[0, r] = -vdmu_ref[0, r]

        def elim_body(i, _):
            l = _chol(_listify(piv_at(i - 1), s), s)
            sol = _chol_solve_vec(l, [y_ref[i - 1, r] for r in range(s)], s)
            off = _listify(off_at(jnp.maximum(i - 1, 0)), s)
            for r in range(s):
                acc = -vdmu_ref[i, r]
                for k in range(s):
                    acc = acc - off[k][r] * sol[k]
                y_ref[i, r] = acc
            return 0

        jax.lax.fori_loop(1, n, elim_body, 0)

        def back_body(kk, _):
            i = n - 1 - kk
            l = _chol(_listify(piv_at(i), s), s)
            rhs = [y_ref[i, r] for r in range(s)]
            off = _listify(off_at(jnp.minimum(i, n - 2)), s)
            x_next = [
                x_out_ref[0, jnp.minimum(i + 1, n - 1), r] for r in range(s)
            ]
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
                x_out_ref[0, i, r] = sol[r]
            return 0

        jax.lax.fori_loop(0, n, back_body, 0)

    _solve_sweeps(lambda i: vdd_ref[i], lambda i: vdo_ref[i], dmu_ref)

    # ---- phase 5: SPD fallback solve Lambda dmu_fb = -Vdmu ------------------
    # Lambda's forward pivots are exactly phase 1's, still in fpiv scratch.
    _solve_sweeps(lambda i: fpiv_ref[i], lambda i: po_ref[0, i], dfb_ref)


# ---------------------------------------------------------------------------
# host wrapper + vmap composition
# ---------------------------------------------------------------------------

def gradient_lanes(
    mu, pd, po, temperature,
    nl_specs: tuple[NLTrialSpec, ...],
    lin_specs: tuple[LinTrialSpec, ...],
    nl_arrays: tuple,      # per batch: (starts|None, nodes, weights, leaves)
    lin_arrays: tuple,     # per batch: (starts|None, a, lam, pm, prec_c)
    interpret: bool | None = None,
    eval_dtype=None,       # in-kernel centered offset quantization (bf16)
    mode: str = "full",
    seeds: tuple | None = None,   # mode "solve": (vdmu, vdd, vdo) psum'd
):
    """Batched fused NGD gradient step.

    mu [B, N, s]; pd [B, N, s, s]; po [B, N-1, s, s]; temperature [B].
    nl/lin array leaves carry a leading B axis (starts do not).  Returns
    (mode "full"/"solve"): (cov_diag [B, N, s, s], cov_off [B, N-1, s, s],
    logdet [B], dprec_diag [B, N, s, s], dprec_off [B, N-1, s, s],
    dmu [B, N, s], dmu_fallback [B, N, s]);
    (mode "accum"): (vdmu [B, N, s], vdd [B, N, s, s], vdo [B, N-1, s, s])
    — the partial joint gradients of THIS factor shard, to be psum'd over
    fp and fed to a "solve" call as ``seeds``.
    None if the shape exceeds the budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, s = mu.shape
    rb = _layout_grad(n, s, nl_specs, lin_specs, b, mode)
    if rb == 0:
        return None
    pad = (-b) % (LANE * rb)
    if pad:
        rep = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[0:1], (pad,) + x.shape[1:])]
        )
        mu, pd, po, temperature = map(rep, (mu, pd, po, temperature))
        nl_arrays = tuple(
            (st, nd, w, tuple(rep(p) for p in leaves))
            for (st, nd, w, leaves) in nl_arrays
        )
        lin_arrays = tuple(
            (st, rep(a), rep(lm), rep(pm), rep(pc))
            for (st, a, lm, pm, pc) in lin_arrays
        )
        if seeds is not None:
            seeds = tuple(rep(x) for x in seeds)
    bp = b + pad
    grid_b = bp // (LANE * rb)

    def lanes(x):
        return _pack(jnp.moveaxis(x, 0, -1), grid_b, rb)

    no = max(n - 1, 1)
    mu_l = lanes(mu)
    pd_l, po_l = lanes(pd), lanes(po)
    temp_l = lanes(temperature.astype(mu.dtype))     # [G, RB, 128]

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda g, nd=nd: (g,) + (0,) * nd)

    def spec0(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda g, nd=nd: (0,) * (nd + 1))

    in_specs = [
        spec((n, s, rb, LANE)),
        spec((n, s, s, rb, LANE)), spec((no, s, s, rb, LANE)),
        spec((rb, LANE)),
    ]
    operands = [mu_l, pd_l, po_l, temp_l]

    if mode == "solve":
        sv, svdd, svdo = seeds
        operands += [lanes(sv), lanes(svdd), lanes(svdo)]
        in_specs += [
            spec((n, s, rb, LANE)), spec((n, s, s, rb, LANE)),
            spec((no, s, s, rb, LANE)),
        ]

    for sp, (starts, nodes, weights, leaves) in zip(nl_specs, nl_arrays):
        if sp.slice_offset is None:
            operands.append(starts.astype(jnp.int32))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        nodes_p, w_p = _pad_rule(nodes, weights, mu.dtype)
        m = nodes_p.shape[0]
        operands.append(jnp.broadcast_to(
            nodes_p.T[None, :, :, None, None], (1, s, m, rb, LANE)
        ))
        in_specs.append(spec0((s, m, rb, LANE)))
        operands.append(jnp.broadcast_to(
            w_p[None, :, None, None], (1, m, rb, LANE)
        ))
        in_specs.append(spec0((m, rb, LANE)))
        for leaf, sh in zip(leaves, sp.param_shapes):
            operands.append(lanes(leaf))
            in_specs.append(spec((sp.k,) + sh + (rb, LANE)))
    for sp, (starts, a, lm, pm, pc) in zip(lin_specs, lin_arrays):
        if sp.slice_offset is None:
            operands.append(starts.astype(jnp.int32))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        blocks = 3 if sp.nb == 2 else 1
        a3 = a.reshape(a.shape[0], sp.ka, blocks, s, s)
        operands.append(lanes(a3))
        in_specs.append(spec((sp.ka, blocks, s, s, rb, LANE)))
        operands.append(lanes(lm))
        in_specs.append(spec((sp.ka, sp.r, sp.nb * s, rb, LANE)))
        operands.append(lanes(pm))
        in_specs.append(spec((sp.ka, sp.r, rb, LANE)))
        operands.append(lanes(pc))
        in_specs.append(spec((sp.ka, sp.r, sp.r, rb, LANE)))

    # out vma: "accum" outputs are THIS SHARD's partial gradients — they
    # genuinely vary over every axis any operand varies over (the JOIN,
    # so the fp axis of the sharded nl operands is carried to the psum).
    # "solve" sees only fp-invariant operands (state + psum'd seeds +
    # replicated linear factors), so the join equals mu's vma there.  The
    # single-kernel "full" mode declares mu's vma DELIBERATELY: it is
    # only ever built on meshes whose factor axis has size 1
    # (FactorShardEngine fp_size==1 / LocalEngine off-mesh), where the
    # fp-varying TYPE of the factor operands is vacuous — joining it in
    # would make the whole GVI loop carry (mu, precision, covariance)
    # fp-varying and break the scan's carry typing (the round-5 1x1-mesh
    # device-gate regression).
    if mode == "accum":
        vma: frozenset = frozenset()
        for op in operands:
            vma = vma | getattr(jax.typeof(op), "vma", frozenset())
    else:
        vma = getattr(jax.typeof(mu_l), "vma", frozenset()) or frozenset()

    def sds(shape):
        if vma:
            return jax.ShapeDtypeStruct(shape, mu.dtype, vma=vma)
        return jax.ShapeDtypeStruct(shape, mu.dtype)

    if mode == "accum":
        out_shapes = [
            sds((grid_b, n, s, rb, LANE)),      # vdmu
            sds((grid_b, n, s, s, rb, LANE)),   # vdd
            sds((grid_b, no, s, s, rb, LANE)),  # vdo
        ]
        out_specs = [
            spec((n, s, rb, LANE)), spec((n, s, s, rb, LANE)),
            spec((no, s, s, rb, LANE)),
        ]
        scratch = [
            pltpu.VMEM((n, s, s, rb, LANE), mu.dtype),   # fpiv
            pltpu.VMEM((n, s, s, rb, LANE), mu.dtype),   # vdd
            pltpu.VMEM((no, s, s, rb, LANE), mu.dtype),  # vdo
            pltpu.VMEM((n, s, rb, LANE), mu.dtype),      # vdmu
        ]
    else:
        out_shapes = [
            sds((grid_b, n, s, s, rb, LANE)),   # covd
            sds((grid_b, no, s, s, rb, LANE)),  # covo
            sds((grid_b, rb, LANE)),            # ld
            sds((grid_b, n, s, s, rb, LANE)),   # dpd
            sds((grid_b, no, s, s, rb, LANE)),  # dpo
            sds((grid_b, n, s, rb, LANE)),      # dmu
            sds((grid_b, n, s, rb, LANE)),      # dfb
        ]
        out_specs = [
            spec((n, s, s, rb, LANE)), spec((no, s, s, rb, LANE)),
            spec((rb, LANE)),
            spec((n, s, s, rb, LANE)), spec((no, s, s, rb, LANE)),
            spec((n, s, rb, LANE)), spec((n, s, rb, LANE)),
        ]
        scratch = [
            pltpu.VMEM((n, s, s, rb, LANE), mu.dtype),   # fpiv
            pltpu.VMEM((n, s, s, rb, LANE), mu.dtype),   # vdd
            pltpu.VMEM((no, s, s, rb, LANE), mu.dtype),  # vdo
            pltpu.VMEM((n, s, rb, LANE), mu.dtype),      # vdmu
            pltpu.VMEM((n, s, rb, LANE), mu.dtype),      # y
        ]

    kernel = functools.partial(
        _grad_kernel, n, s, nl_specs, lin_specs, eval_dtype, mode
    )

    def call(ops, gc, shapes):
        return pl.pallas_call(
            kernel,
            grid=(gc,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=shapes,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*ops)

    if grid_b <= _MAX_GRID:
        out = call(operands, grid_b, out_shapes)
    else:
        # bound the per-call grid (scoped-vmem stack OOM at grid > 4, see
        # _MAX_GRID): slice the grid-indexed operands, re-issue per chunk
        grid_flags = [True] * (7 if mode == "solve" else 4)
        for sp in nl_specs:
            if sp.slice_offset is None:
                grid_flags.append(False)          # starts (SMEM)
            grid_flags += [False, False]          # nodes, weights (spec0)
            grid_flags += [True] * len(sp.param_shapes)
        for sp in lin_specs:
            if sp.slice_offset is None:
                grid_flags.append(False)
            grid_flags += [True] * 4
        parts = []
        for g0 in range(0, grid_b, _MAX_GRID):
            gc = min(_MAX_GRID, grid_b - g0)
            ops_c = [
                op[g0:g0 + gc] if flag else op
                for op, flag in zip(operands, grid_flags)
            ]
            shapes_c = [
                jax.ShapeDtypeStruct(
                    (gc,) + sh.shape[1:], sh.dtype,
                    **({"vma": vma} if vma else {}),
                )
                for sh in out_shapes
            ]
            parts.append(call(ops_c, gc, shapes_c))
        out = tuple(
            jnp.concatenate(comps, axis=0) for comps in zip(*parts)
        )

    def unlanes(y):
        return jnp.moveaxis(_unpack(y, bp), -1, 0)[:b]

    if mode == "accum":
        vdmu, vdd, vdo = out
        return (
            unlanes(vdmu),
            unlanes(vdd),
            unlanes(vdo) if n > 1 else jnp.zeros((b, 0, s, s), mu.dtype),
        )
    covd, covo, ld, dpd, dpo, dmu, dfb = out
    return (
        unlanes(covd),
        unlanes(covo) if n > 1 else jnp.zeros((b, 0, s, s), mu.dtype),
        unlanes(ld),
        unlanes(dpd),
        unlanes(dpo) if n > 1 else jnp.zeros((b, 0, s, s), mu.dtype),
        unlanes(dmu),
        unlanes(dfb),
    )


def make_gradient_vmappable(n, s, nl_specs, lin_specs, interpret=None,
                            eval_dtype=None, mode: str = "full"):
    """Per-problem fused gradient step, efficient under outer vmap (problem
    axes flatten onto the 128 lanes — same pattern as fused_trials).
    Returns a function

        mode "full"/"solve":
        f(mu [N,s], pd [N,s,s], po [N-1,s,s], temperature [],
          [mode "solve": vdmu [N,s], vdd [N,s,s], vdo [N-1,s,s],]
          *flat_arrays)
          -> (cov_diag, cov_off, logdet, dprec_diag, dprec_off, dmu,
              dmu_fallback)
        mode "accum":
        f(mu, pd, po, temperature, *flat_arrays) -> (vdmu, vdd, vdo)

    ``flat_arrays``: per nl batch (starts? nodes weights *leaves), per lin
    batch (starts? a lam pm prec_c) — the SAME flat tuple the fused trial
    kernel takes (engine._build_fused_specs builds it once for both; the
    fp-sharded split pair passes the nl slots to "accum" and the lin slots
    to "solve")."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_core = 7 if mode == "solve" else 4
    shared = [False] * n_core      # mu pd po temperature (+ seeds)
    for sp in nl_specs:
        if sp.slice_offset is None:
            shared.append(True)    # starts
        shared += [True, True]     # nodes, weights
        shared += [False] * len(sp.param_shapes)
    for sp in lin_specs:
        if sp.slice_offset is None:
            shared.append(True)
        shared += [False, False, False, False]

    def _regroup(args):
        core = args[:n_core]
        pos = n_core
        nl_arrays = []
        for sp in nl_specs:
            starts = None
            if sp.slice_offset is None:
                starts = args[pos]
                pos += 1
            nodes, w = args[pos], args[pos + 1]
            pos += 2
            leaves = tuple(args[pos:pos + len(sp.param_shapes)])
            pos += len(sp.param_shapes)
            nl_arrays.append((starts, nodes, w, leaves))
        lin_arrays = []
        for sp in lin_specs:
            starts = None
            if sp.slice_offset is None:
                starts = args[pos]
                pos += 1
            lin_arrays.append(
                (starts, args[pos], args[pos + 1], args[pos + 2],
                 args[pos + 3])
            )
            pos += 4
        return core, tuple(nl_arrays), tuple(lin_arrays)

    @jax.custom_batching.custom_vmap
    def call(*args):
        # base case is BATCHED: core leaves [B, ...], temperature [B]
        core, nl_arrays, lin_arrays = _regroup(args)
        seeds = tuple(core[4:7]) if mode == "solve" else None
        return gradient_lanes(
            *core[:4], nl_specs, lin_specs, nl_arrays, lin_arrays,
            interpret=interpret, eval_dtype=eval_dtype, mode=mode,
            seeds=seeds,
        )

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        new_args = []
        for x, sh, bt in zip(args, shared, in_batched):
            if sh:
                new_args.append(x[0] if bt else x)
            else:
                xb = x if bt else jnp.broadcast_to(
                    x[None], (axis_size,) + x.shape
                )
                new_args.append(
                    xb.reshape((xb.shape[0] * xb.shape[1],) + xb.shape[2:])
                )
        out = call(*new_args)
        if out is None:
            raise ValueError("fused gradient shape exceeded the VMEM budget "
                             "under vmap (check grad_fits_lanes first)")
        bb = out[2].shape[0]
        b1 = bb // axis_size
        resh = lambda y: y.reshape((axis_size, b1) + y.shape[1:])
        return tuple(resh(y) for y in out), tuple(True for _ in out)

    def f(mu, pd, po, temperature, *rest):
        if mode == "solve":
            seeds, flat = rest[:3], rest[3:]
        else:
            seeds, flat = (), rest
        out = call(
            mu[None], pd[None], po[None],
            jnp.reshape(temperature, (1,)),
            *[x[None] for x in seeds],
            *[x if sh else x[None]
              for x, sh in zip(flat, shared[n_core:])],
        )
        if out is None:
            raise ValueError("fused gradient shape exceeded the VMEM budget "
                             "(check grad_fits_lanes first)")
        return tuple(y[0] for y in out)

    return f

"""Fused line-search trial evaluation: chain + quadrature + linear costs
in ONE Pallas program, trials evaluated in-kernel.

Round-2 device traces (PERF.md section 10) showed 25% of the NGD iteration
spent in lanes-layout pack/unpack copies around the separate chain and
quadrature kernels — almost all of it on the 11-trial line-search batch
(11x the width of every other phase).  This kernel removes that traffic
structurally:

* Inputs are the CURRENT iterate and the step direction — ``mu``, ``dmu``,
  ``(prec, dprec)`` block-tridiagonal blocks — packed once at width B
  (problems on lanes).  The T trial iterates ``mu + s_t dmu``,
  ``sym(prec + s_t dprec)`` are formed INSIDE the kernel as full-vreg
  mul-adds, so the 11x trial axis never exists in HBM at all (the old path
  materialized, packed, and unpacked every [T*B, N, s, s] trial tensor).
* The GBP backward sweep and the per-edge 2s x 2s covariance inversion are
  FUSED with factor evaluation: as each edge's covariance blocks
  (Sig_ii, Sig_i+1,i+1, Sig_i,i+1) come out of the joint inverse they are
  immediately consumed by the sigma-point quadrature of the state-i
  nonlinear factor, the edge GP-prior cost, and any anchor matching that
  state — then discarded.  No [N, s, s] covariance tensor is ever written:
  the kernel's only outputs are the per-factor expected costs and the
  log determinant, [T, K]-sized scalars per lane.
* Linear-factor costs use the precomputed residual form
  ``cost_k = <A_k, Sig_k> + (Lam mu - pm)^T prec_c (Lam mu - pm)`` (A, pm,
  prec_c iterate-independent, built once outside the optimization scan
  from (Lam, Psi, mu_t, prec_t); A symmetrized so the 2<A12, Sig_off>
  folding is exact; the residual kept UN-expanded — the mu-quadratic
  expansion cancels catastrophically in f32 and measurably biased accepts
  at B=1024).  Uniform batches (all K rows identical, e.g. the
  constant-dt minimum-acc prior) pass a single row (``ka == 1``).

The accepted iterate's covariance (needed by the next iteration's
gradients) is recomputed by ONE width-B chain call per iteration — 1/T of
the trial-path chain work, against which this kernel deletes the entire
trial-batch copy share.

Reference analog: the single batched GPU launch per iteration of
GVI-GH-Cuda-impl.h:161-192 + the backtracking cost path
(NGD-GH-Cuda-impl.h:66-88), which re-uploads sigma points per trial; here
the whole search stays in VMEM.

Layout contract matches :mod:`.chain_lanes` / :mod:`.quad_lanes`: batch
packed on (RB sublanes x 128 lanes); grid = (batch chunks, trial groups).
When the batch needs fewer sublane rows than the VMEM budget allows, the
spare rows carry ADDITIONAL trials per grid step (the trial step enters
the kernel as a full [RB, 128] tile, so each rows_b-row group evaluates a
different trial against a replicated batch) — without this, small batches
left the vector units mostly idle and the fused path measured ~2x slower
than the separate kernels at B=64.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

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
    _pack,
    _pivot_trust,
    _sds,
    _stack,
    _trust_tol,
)
from .quad_lanes import _M_CHUNK

# Empirical VMEM budgets (f32/v5e): total elements per 128-lane row,
# summed over all resident arrays (inputs double-buffered, outputs,
# scratch).  Round-4 device probes (scripts/r4_followup.py + the
# bench-shape probe in PERF section 27) showed the real v5e ceiling is
# FAR above the original 24,576 (the 16M scoped-vmem cap it was
# calibrated against is not the 128MB physical VMEM), and the best
# layout is shape-dependent — three measured regimes:
#
#   short chains (n*s*s < 2048, e.g. N=32 s=4): 58k admits cap=8 —
#     B=1024 measured 648k prob-iters/s vs 286k at the old cap=3 budget;
#   N=128-class (2048 <= n*s*s < 4096): with the round-4 137-node rules
#     the SEPARATE path won every probed fused layout (28.7k vs
#     23.6-28.1k at cap 2-3), and the old 24,576 budget declined the
#     kernel.  The round-5 MARGINAL rules (29 nodes at the same shapes,
#     PERF section 33) shrink per_row ~2x, and the re-probe
#     (scripts/r5_naxis.py) measured the fused path at cap=2 WINNING 50%
#     (99.8k vs 66.4k prob-iters/s at B=256) — the budget is now 61,440
#     (admits cap=2 for 29-node shapes; 137-node shapes land cap 2-3,
#     within ~2% of their separate path per the round-4 probe);
#   long chains (n*s*s >= 4096, e.g. N=256): 140k admits cap=3, which
#     beats the separate path 30% (15.9k vs 12.2k) — the separate trial
#     chain has degraded at these shapes, and riding the fused evaluator
#     also keeps the section-14-accurate path.  (Do NOT raise further:
#     cap=8 at N=256 per_row ~42k would exceed the physical VMEM.)
_MAX_ROW_ELEMS_TRIALS = 58_000
_MAX_ROW_ELEMS_TRIALS_MID = 61_440
_MAX_ROW_ELEMS_TRIALS_LONG = 140_000


def _trials_budget(n: int, s: int) -> int:
    # physical-VMEM calibration; GVI_KERNEL_VMEM_SCALE rescales for
    # targets enforcing the 16MB scoped-vmem cap (kernels/budgets.py)
    from .budgets import scaled

    nss = n * s * s
    if nss >= 4096:
        return scaled(_MAX_ROW_ELEMS_TRIALS_LONG)
    if nss >= 2048:
        return scaled(_MAX_ROW_ELEMS_TRIALS_MID)
    return scaled(_MAX_ROW_ELEMS_TRIALS)


class NLTrialSpec(NamedTuple):
    """Static description of one nonlinear (nb == 1) factor batch."""

    lanes_cost: Any                       # component-form cost (see quad_lanes)
    param_shapes: tuple[tuple[int, ...], ...]  # per-leaf shape AFTER the K axis
    k: int                                # factors in the batch
    m: int                                # UNPADDED node count
    slice_offset: int | None              # start == offset + arange(k); None
    #                                       -> a [K] int32 starts array is
    #                                       passed (SMEM)
    # configuration-marginal quadrature (NonlinearFactorBatch.quad_rdim):
    # nodes are zero beyond the first rdim dims.  The TRIAL kernel's
    # E[phi] is exact as-is (zero-padded placement IS the marginal rule);
    # the GRADIENT kernel adds the closed-form e_xxt conditional-moment
    # lift (moments.gh_moments) before the NGD assembly.
    rdim: int | None = None


class LinTrialSpec(NamedTuple):
    """Static description of one linear factor batch in residual form."""

    nb: int                               # 1 (anchor) or 2 (edge)
    k: int
    ka: int                               # 1 if uniform over K else k
    r: int                                # residual rank (lam rows)
    slice_offset: int | None              # None -> starts passed (SMEM)


def linear_residual_form(lam, psi, target_mu, target_prec, constant):
    """(A, pm, prec_c) with

        cost = <A, Sig> + (lam mu - pm)^T prec_c (lam mu - pm)

    equal to :func:`..factors.moments.linear_cost` (constant folded into A
    and prec_c, A symmetrized).  The residual is evaluated as written —
    NOT expanded into ``mu^T A mu - 2 b.mu + c``, whose large terms cancel
    catastrophically in f32 once |mu| >> |residual| (measured on device as
    a systematic accept-bias at B=1024).  Row axes: A [Ka, d, d],
    pm [Ka, r], prec_c [Ka, r, r]."""
    from ..ops.precision import einsum

    a = einsum("kra,krs,ksb->kab", lam, target_prec, lam)
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2)) * constant[:, None, None]
    pm = einsum("krt,kt->kr", psi, target_mu)
    prec_c = (
        0.5 * (target_prec + jnp.swapaxes(target_prec, -1, -2))
        * constant[:, None, None]
    )
    return a, pm, prec_c


def _pad_m(m: int) -> int:
    return m + (-m) % _M_CHUNK


def row_elems_trials(n: int, s: int, n_trials: int,
                     nl_specs: tuple[NLTrialSpec, ...],
                     lin_specs: tuple[LinTrialSpec, ...]) -> int:
    """Accounting for the VMEM budget: elements per 128-lane row."""
    no = max(n - 1, 1)
    per = 2 * (2 * n * s + 2 * n * s * s + 2 * no * s * s)  # 6 inputs, x2 buf
    per += n * s * s                                        # fpiv scratch
    per += n_trials                                         # trial scalars
    out = 1                                                 # logdet
    for sp in nl_specs:
        m = _pad_m(sp.m)
        per += 2 * ((s + 1) * m)                            # rule (x2 buf)
        per += 2 * sum(sp.k * math.prod(sh) for sh in sp.param_shapes)
        out += sp.k
    for sp in lin_specs:
        blocks = 3 if sp.nb == 2 else 1
        per += 2 * sp.ka * (
            blocks * s * s + sp.r * sp.nb * s + sp.r + sp.r * sp.r
        )
        out += sp.k
    per += 2 * out
    return per


def _row_block_trials(n, s, n_trials, nl_specs, lin_specs, batch) -> int:
    rows_b, tpg = _layout_trials(n, s, n_trials, nl_specs, lin_specs, batch)
    return rows_b * tpg


def _layout_trials(n, s, n_trials, nl_specs, lin_specs,
                   batch) -> tuple[int, int]:
    """(rows_b, trials_per_grid): how the RB sublane rows of one grid step
    are split between batch rows and trial replicas.  (0, 0) = over budget.

    When the batch needs fewer rows than the VMEM budget allows (small B),
    the SPARE rows carry additional line-search trials — the kernel reads
    the trial step as a full [RB, 128] tile, so rows can hold different
    trials with the batch replicated across them; this keeps the vector
    units full at small B, where a trial-per-grid-step layout was measured
    2x slower than the separate-kernel path (one 64-problem row per step)."""
    per_row = row_elems_trials(n, s, n_trials, nl_specs, lin_specs)
    budget = _trials_budget(n, s)
    if per_row > budget:
        return 0, 0
    cap = min(8, budget // per_row)
    if cap < 2:
        # a single-row budget leaves the kernel width-starved: at cap=1
        # neither extra trials nor extra batch rows can share a grid step
        # (max 128 lanes of work per sequential trial step) — measured
        # 1.8x SLOWER than the separate kernels at N=128/B=64; decline so
        # the dispatch keeps the separate path
        return 0, 0
    rows = -(-batch // LANE)
    if rows >= cap:
        # batch fills the budget: pick the row block minimizing padded rows
        rb = min(
            range(1, cap + 1),
            key=lambda r: (-(-rows // r) * r, -r),
        )
        return rb, 1
    return rows, min(cap // rows, n_trials)


def trials_fit_lanes(n, s, n_trials, nl_specs, lin_specs) -> bool:
    """Static eligibility: n >= 2 and the shape fits the VMEM budget."""
    if n < 2:
        return False
    return _row_block_trials(n, s, n_trials, nl_specs, lin_specs, LANE) > 0


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _sym_list(a_arr, s):
    """[s, s, RB, 128] -> symmetrized list-of-lists."""
    al = _listify(a_arr, s)
    return [
        [0.5 * (al[i][j] + al[j][i]) for j in range(s)] for i in range(s)
    ]


def _inv_from_chol(l, t, one, zero):
    """Full inverse of an t x t SPD lanes matrix from its Cholesky."""
    inv = [[None] * t for _ in range(t)]
    for col in range(t):
        sol = _chol_solve_vec(
            l, [one if r == col else zero for r in range(t)], t
        )
        for r in range(t):
            inv[r][col] = sol[r]
    return inv


def _trials_kernel(n, s, nl_specs, lin_specs, eval_dtype,
                   mu_ref, dmu_ref, pd_ref, po_ref, dpd_ref, dpo_ref,
                   st_ref, *rest):
    """Grid = (batch chunk g, trial t).  Refs:

    mu/dmu [1, N, s, RB, 128]; pd/dpd [1, N, s, s, RB, 128];
    po/dpo [1, NO, s, s, RB, 128]; st [1, RB, 128] (this trial's step);
    then per nl batch: (starts [K] SMEM if dynamic), nodes [1, s, M, RB, 128],
    w [1, M, RB, 128], param leaves [1, K, *leaf, RB, 128];
    then per lin batch: (starts [K] SMEM if dynamic),
    a [1, Ka, (3 if nb==2 else 1), s, s, RB, 128],
    lam [1, Ka, r, nb*s, RB, 128], pm [1, Ka, r, RB, 128],
    prec_c [1, Ka, r, r, RB, 128].
    Outputs (leading [1, 1] = (g, t) block axes): ld [1, 1, RB, 128], fc
    per nl batch [1, 1, K, RB, 128], fc per lin batch [1, 1, K, RB, 128].
    Scratch: fpiv [N, s, s, RB, 128].
    """
    pos = 0
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
    ld_ref = rest[pos]
    pos += 1
    fc_nl_refs = rest[pos:pos + len(nl_specs)]
    pos += len(nl_specs)
    fc_lin_refs = rest[pos:pos + len(lin_specs)]
    pos += len(lin_specs)
    (fpiv_ref,) = rest[pos:]

    st = st_ref[0]                                  # [RB, 128] trial step
    zero = jnp.zeros_like(st)
    one = jnp.ones_like(st)
    zeros_m = jnp.zeros_like(pd_ref[0, 0])

    def trial_diag(i):
        """Symmetrized trial diag block i as list-of-lists."""
        a = pd_ref[0, i] + st[None, None] * dpd_ref[0, i]
        return _sym_list(a, s)

    def trial_off(i):
        o = po_ref[0, i] + st[None, None] * dpo_ref[0, i]
        return _listify(o, s)

    # ---- forward sweep: pivots + logdet -----------------------------------
    # logdet is accumulated Kahan-compensated and poisoned with NaN when a
    # pivot cancels to rounding noise (chain_lanes._pivot_trust): a
    # noise-pivot trial's "cost decrease" is garbage and must be REJECTED,
    # not accepted (the PERF section-14 collapse class)
    tol = _trust_tol(mu_ref.dtype)

    def fwd_body(i, carry):
        m_arr, ld, comp, trust = carry
        d_l = trial_diag(i)
        m_l = _listify(m_arr, s)
        piv_l = _listify(_stack(d_l, s) + m_arr, s)
        fpiv_ref[i] = _stack(piv_l, s)
        l = _chol(piv_l, s)
        trust = _pivot_trust(l, piv_l, d_l, m_l, s, trust)
        term = _logdet_from_chol(l, s) - comp
        ld_new = ld + term
        comp = (ld_new - ld) - term
        ld = ld_new
        off = trial_off(jnp.minimum(i, n - 2))
        x = [[None] * s for _ in range(s)]
        for col in range(s):
            sol = _chol_solve_vec(l, [off[r][col] for r in range(s)], s)
            for r in range(s):
                x[r][col] = sol[r]
        btx = [[None] * s for _ in range(s)]
        for a_ in range(s):
            for b_ in range(s):
                acc = None
                for r in range(s):
                    term2 = off[r][a_] * x[r][b_]
                    acc = term2 if acc is None else acc + term2
                btx[a_][b_] = -acc
        keep = i < n - 1
        return (jnp.where(keep, _stack(btx, s), m_arr), ld, comp, trust)

    _, ld, _, trust = jax.lax.fori_loop(
        0, n, fwd_body, (zeros_m, zero, zero, jnp.ones_like(zero))
    )
    ld_ref[0, 0] = jnp.where(trust >= tol, ld, jnp.full_like(ld, jnp.nan))

    # ---- factor evaluation helpers ---------------------------------------
    def quad_factor(sp, refs, k, mu_c, cov_l):
        """E[phi] of factor k of an nb==1 nonlinear batch at marginal
        (mu_c list[s], cov_l list-of-lists [s][s])."""
        _, nodes_ref, w_ref, param_refs = refs
        chol_l = _chol(cov_l, s)
        params = tuple(pr[0, k] for pr in param_refs)
        m_pad = w_ref.shape[1]
        n_chunks = m_pad // _M_CHUNK

        def chunk_body(c, acc):
            sl = pl.ds(c * _M_CHUNK, _M_CHUNK)
            pts = []
            for i in range(s):
                t = None
                for j in range(i + 1):
                    term = nodes_ref[0, j, sl] * chol_l[i][j][None]
                    t = term if t is None else t + term
                if eval_dtype is not None:
                    # centered offset quantization (moments._sigma_diffs)
                    t = t.astype(eval_dtype).astype(t.dtype)
                pts.append(t + mu_c[i][None])
            phi = sp.lanes_cost(tuple(pts), *params)
            return acc + jnp.sum(phi * w_ref[0, sl], axis=0)

        return jax.lax.fori_loop(0, n_chunks, chunk_body, zero)

    def _resid_cost(refs, kk, r, mu_e):
        """(lam mu - pm)^T prec_c (lam mu - pm) — the residual evaluated as
        written (the expanded mu-quadratic cancels catastrophically in f32
        once |mu| >> |residual|; see linear_residual_form)."""
        _, _, lam_ref, pm_ref, prec_ref = refs
        de = len(mu_e)
        resid = []
        for rr in range(r):
            acc = -pm_ref[0, kk, rr]
            for d_ in range(de):
                acc = acc + lam_ref[0, kk, rr, d_] * mu_e[d_]
            resid.append(acc)
        out = None
        for rr in range(r):
            row = None
            for cc in range(r):
                term = prec_ref[0, kk, rr, cc] * resid[cc]
                row = term if row is None else row + term
            term = resid[rr] * row
            out = term if out is None else out + term
        return out

    def lin_cost_nb1(refs, k, sp, mu_c, cov_l):
        """<A, Sig> + stable residual quadratic for an anchor factor."""
        _, a_ref, _, _, _ = refs
        kk = jnp.minimum(k, sp.ka - 1)
        a_l = _listify(a_ref[0, kk, 0], s)
        acc = _resid_cost(refs, kk, sp.r, mu_c)
        for i in range(s):
            for j in range(s):
                acc = acc + a_l[i][j] * cov_l[i][j]
        return acc

    def lin_cost_nb2(refs, k, sp, mu_i, mu_j, cii, cjj, cij):
        """Edge factor: blocks A11/A22/A12 against (Sig_ii, Sig_jj, Sig_ij)
        + the stable residual quadratic over the concatenated mean."""
        _, a_ref, _, _, _ = refs
        kk = jnp.minimum(k, sp.ka - 1)
        a11 = _listify(a_ref[0, kk, 0], s)
        a22 = _listify(a_ref[0, kk, 1], s)
        a12 = _listify(a_ref[0, kk, 2], s)
        acc = _resid_cost(refs, kk, sp.r, mu_i + mu_j)
        for i in range(s):
            for j in range(s):
                acc = acc + a11[i][j] * cii[i][j]
                acc = acc + a22[i][j] * cjj[i][j]
                acc = acc + 2.0 * a12[i][j] * cij[i][j]
        return acc

    def trial_mu(i):
        return [
            mu_ref[0, i, r] + st * dmu_ref[0, i, r] for r in range(s)
        ]

    def eval_state(i, cov_l, mu_c):
        """All per-STATE factor contributions at state i."""
        for sp, refs, fc_ref in zip(nl_specs, nl_refs, fc_nl_refs):
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                    fc_ref[0, 0, k] = quad_factor(sp, refs, k, mu_c, cov_l)
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                        fc_ref[0, 0, k] = quad_factor(sp, refs, k, mu_c, cov_l)
        for sp, refs, fc_ref in zip(lin_specs, lin_refs, fc_lin_refs):
            if sp.nb != 1:
                continue
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                    fc_ref[0, 0, k] = lin_cost_nb1(refs, k, sp, mu_c, cov_l)
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                        fc_ref[0, 0, k] = lin_cost_nb1(
                            refs, k, sp, mu_c, cov_l
                        )

    # ---- backward sweep fused with edge inversion + factor eval -----------
    # message-form carry with a zeros init (see fused_gradient's phase-2
    # note: a ref-read-seeded fori carry is vma-varying under compiled
    # shard_map while the body output is not, failing the scan type check)
    def bwd_body(kk, m_arr):
        i = n - 2 - kk
        # edge i: joint [[fpiv_i, B_i], [B_i^T, gpiv_{i+1}]] -> inverse
        f = _listify(fpiv_ref[i], s)
        g = _listify(_stack(trial_diag(i + 1), s) + m_arr, s)
        off = trial_off(i)
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

        mu_i = trial_mu(i)
        mu_j = trial_mu(i + 1)
        eval_state(i, cii, mu_i)

        @pl.when(i == n - 2)
        def _():
            eval_state(n - 1, cjj, mu_j)

        for sp, refs, fc_ref in zip(lin_specs, lin_refs, fc_lin_refs):
            if sp.nb != 2:
                continue
            if sp.slice_offset is not None:
                k = i - sp.slice_offset

                @pl.when(jnp.logical_and(k >= 0, k < sp.k))
                def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                    fc_ref[0, 0, k] = lin_cost_nb2(
                        refs, k, sp, mu_i, mu_j, cii, cjj, cij
                    )
            else:
                starts = refs[0]
                for k in range(sp.k):
                    @pl.when(starts[k] == i)
                    def _(sp=sp, refs=refs, fc_ref=fc_ref, k=k):
                        fc_ref[0, 0, k] = lin_cost_nb2(
                            refs, k, sp, mu_i, mu_j, cii, cjj, cij
                        )

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


# ---------------------------------------------------------------------------
# host wrapper + vmap composition
# ---------------------------------------------------------------------------

def _pad_rule(nodes, weights, dtype):
    m = nodes.shape[0]
    d = nodes.shape[1]
    m_pad = (-m) % _M_CHUNK
    if m_pad:
        nodes = jnp.concatenate(
            [nodes, jnp.broadcast_to(nodes[0:1], (m_pad, d))]
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((m_pad,), weights.dtype)]
        )
    return nodes.astype(dtype), weights.astype(dtype)


def trial_costs_lanes(
    mu, dmu, pd, po, dpd, dpo, trials,
    nl_specs: tuple[NLTrialSpec, ...],
    lin_specs: tuple[LinTrialSpec, ...],
    nl_arrays: tuple,      # per batch: (starts|None, nodes, weights, leaves)
    lin_arrays: tuple,     # per batch: (starts|None, a, lam, pm, prec_c)
    interpret: bool | None = None,
    eval_dtype=None,       # in-kernel centered offset quantization (bf16)
):
    """Batched fused trial evaluation.

    mu/dmu [B, N, s]; pd/dpd [B, N, s, s]; po/dpo [B, N-1, s, s];
    trials [T].  nl/lin array leaves carry a leading B axis (starts do
    not).  Returns (ld [B, T], fc_nl tuple of [B, T, K],
    fc_lin tuple of [B, T, K]), or None if the shape exceeds the budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, s = mu.shape
    n_trials = trials.shape[0]
    rows_b, tpg = _layout_trials(n, s, n_trials, nl_specs, lin_specs, b)
    if rows_b == 0:
        return None
    rb = rows_b * tpg            # sublane rows per grid step
    pad = (-b) % (LANE * rows_b)
    if pad:
        rep = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[0:1], (pad,) + x.shape[1:])]
        )
        mu, dmu, pd, po, dpd, dpo = map(rep, (mu, dmu, pd, po, dpd, dpo))
        nl_arrays = tuple(
            (st, nd, w, tuple(rep(p) for p in leaves))
            for (st, nd, w, leaves) in nl_arrays
        )
        lin_arrays = tuple(
            (st, rep(a), rep(lm), rep(pm), rep(pc))
            for (st, a, lm, pm, pc) in lin_arrays
        )
    bp = b + pad
    grid_b = bp // (LANE * rows_b)   # == 1 whenever tpg > 1
    n_tg = -(-n_trials // tpg)       # trial grid steps
    t_pad = n_tg * tpg - n_trials
    trials_p = trials
    if t_pad:
        # replicate the last (smallest) trial step into the padded slots:
        # always finite, outputs sliced off
        trials_p = jnp.concatenate(
            [trials, jnp.broadcast_to(trials[-1:], (t_pad,))]
        )

    def lanes(x):
        y = _pack(jnp.moveaxis(x, 0, -1), grid_b, rows_b)
        if tpg > 1:
            # replicate the batch across the tpg trial row-groups:
            # row r = rt * rows_b + rbatch holds batch chunk rbatch for
            # trial replica rt (the kernel's st tile varies per row)
            y = jnp.tile(y, (1,) * (y.ndim - 2) + (tpg, 1))
        return y

    no = max(n - 1, 1)
    mu_l, dmu_l = lanes(mu), lanes(dmu)
    pd_l, dpd_l = lanes(pd), lanes(dpd)
    po_l, dpo_l = lanes(po), lanes(dpo)
    # trial steps as row-varying tiles: block [1, RB, 128] for grid step t
    # holds trials t*tpg .. t*tpg+tpg-1, one per rows_b-row group
    st_l = jnp.broadcast_to(
        trials_p.astype(mu.dtype).reshape(n_tg, tpg)[:, :, None, None],
        (n_tg, tpg, rows_b, LANE),
    ).reshape(n_tg, rb, LANE)

    def spec(shape):
        """Batch-chunk-indexed input: block g, any t."""
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda g, t, nd=nd: (g,) + (0,) * nd
        )

    def spec0(shape):
        """Grid-invariant input (block 0 always)."""
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda g, t, nd=nd: (0,) * (nd + 1)
        )

    in_specs = [
        spec((n, s, rb, LANE)), spec((n, s, rb, LANE)),
        spec((n, s, s, rb, LANE)), spec((no, s, s, rb, LANE)),
        spec((n, s, s, rb, LANE)), spec((no, s, s, rb, LANE)),
        pl.BlockSpec((1, rb, LANE), lambda g, t: (t, 0, 0)),
    ]
    operands = [mu_l, dmu_l, pd_l, po_l, dpd_l, dpo_l, st_l]

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

    def out_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, 1) + shape, lambda g, t, nd=nd: (g, t) + (0,) * nd
        )

    out_shapes = [_sds((grid_b, n_tg, rb, LANE), mu.dtype, mu_l)]
    out_specs = [out_spec((rb, LANE))]
    for sp in nl_specs:
        out_shapes.append(
            _sds((grid_b, n_tg, sp.k, rb, LANE), mu.dtype, mu_l)
        )
        out_specs.append(out_spec((sp.k, rb, LANE)))
    for sp in lin_specs:
        out_shapes.append(
            _sds((grid_b, n_tg, sp.k, rb, LANE), mu.dtype, mu_l)
        )
        out_specs.append(out_spec((sp.k, rb, LANE)))

    kernel = functools.partial(
        _trials_kernel, n, s, nl_specs, lin_specs, eval_dtype
    )

    def call(ops, gc, shapes):
        return pl.pallas_call(
            kernel,
            grid=(gc, n_tg),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=shapes,
            scratch_shapes=[pltpu.VMEM((n, s, s, rb, LANE), mu.dtype)],
            interpret=interpret,
        )(*ops)

    from .fused_gradient import _MAX_GRID

    if grid_b <= _MAX_GRID:
        out = pl.pallas_call(
            kernel,
            grid=(grid_b, n_tg),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((n, s, s, rb, LANE), mu.dtype)],
            interpret=interpret,
        )(*operands)
    else:
        # bound the per-call batch grid (XLA scopes the output buffers in
        # vmem scaled by the grid count — compile-time scoped-vmem OOM at
        # large B; see fused_gradient._MAX_GRID): chunk the batch-indexed
        # operands and re-issue
        grid_flags = [True] * 6 + [False]     # mu..dpo yes, st_l no
        for sp in nl_specs:
            if sp.slice_offset is None:
                grid_flags.append(False)      # starts (SMEM)
            grid_flags += [False, False]      # nodes, weights (spec0)
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
                    **(
                        {"vma": jax.typeof(mu_l).vma}
                        if getattr(jax.typeof(mu_l), "vma", None) else {}
                    ),
                )
                for sh in out_shapes
            ]
            parts.append(call(ops_c, gc, shapes_c))
        out = tuple(
            jnp.concatenate(comps, axis=0) for comps in zip(*parts)
        )

    def unlanes(y):
        # [G, TG, ..., RB=tpg*rows_b, 128] -> [B, T, ...]
        y = y.reshape(y.shape[:-2] + (tpg, rows_b, LANE))
        y = jnp.moveaxis(y, -3, 2)          # [G, TG, tpg, ..., rows_b, 128]
        y = y.reshape((y.shape[0], n_tg * tpg) + y.shape[3:])
        x = jnp.moveaxis(y, 0, -3)          # [T_pad, ..., G, rows_b, 128]
        x = x.reshape(x.shape[:-3] + (bp,))
        return jnp.moveaxis(x, -1, 0)[:b, :n_trials]

    ld = unlanes(out[0])
    n_nl = len(nl_specs)
    fc_nl = tuple(unlanes(o) for o in out[1:1 + n_nl])
    fc_lin = tuple(unlanes(o) for o in out[1 + n_nl:])
    return ld, fc_nl, fc_lin


def make_trial_costs_vmappable(n, s, n_trials, nl_specs, lin_specs,
                               interpret=None, eval_dtype=None):
    """Per-problem fused trial evaluation, efficient under outer vmap
    (problem axes flatten onto the 128 lanes — same pattern as
    chain_lanes/quad_lanes).  Returns a function

        f(mu [N,s], dmu, pd, po, dpd, dpo, trials [T], *flat_arrays)
          -> (ld [T], fc tuple of [T, K] per batch, nl first then linear)

    ``flat_arrays``: per nl batch (starts? nodes weights *leaves), per lin
    batch (starts? a lam pm prec_c) — starts/nodes/weights/trials are shared across
    any vmapped batch (a batched axis is collapsed to element 0; stacked
    problems share graph structure — verified by stack_problems)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # index bookkeeping for the flat argument list
    shared = [False] * 6 + [True]      # mu dmu pd po dpd dpo trials
    for sp in nl_specs:
        if sp.slice_offset is None:
            shared.append(True)        # starts
        shared += [True, True]         # nodes, weights
        shared += [False] * len(sp.param_shapes)
    for sp in lin_specs:
        if sp.slice_offset is None:
            shared.append(True)
        shared += [False, False, False, False]

    def _regroup(args):
        """flat -> (core 6, trials, nl_arrays, lin_arrays)."""
        core = args[:6]
        trials = args[6]
        pos = 7
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
        return core, trials, tuple(nl_arrays), tuple(lin_arrays)

    @jax.custom_batching.custom_vmap
    def call(*args):
        # base case is BATCHED: core leaves [B, ...]
        core, trials, nl_arrays, lin_arrays = _regroup(args)
        return trial_costs_lanes(
            *core, trials, nl_specs, lin_specs, nl_arrays, lin_arrays,
            interpret=interpret, eval_dtype=eval_dtype,
        )

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        new_args = []
        for x, sh, bt in zip(args, shared, in_batched):
            if sh:
                # graph-structural operand: one copy serves every lane
                new_args.append(x[0] if bt else x)
            else:
                # batched leaf [B2, B, ...] (broadcast first if the outer
                # vmap did not batch it) -> flatten onto the lane batch
                xb = x if bt else jnp.broadcast_to(
                    x[None], (axis_size,) + x.shape
                )
                new_args.append(
                    xb.reshape((xb.shape[0] * xb.shape[1],) + xb.shape[2:])
                )
        out = call(*new_args)
        if out is None:
            raise ValueError("fused trial shape exceeded the VMEM budget "
                             "under vmap (check trials_fit_lanes first)")
        ld, fc_nl, fc_lin = out
        bb = ld.shape[0]
        b2 = axis_size
        b1 = bb // b2
        resh = lambda y: y.reshape((b2, b1) + y.shape[1:])
        out_b = (
            resh(ld),
            tuple(resh(f) for f in fc_nl),
            tuple(resh(f) for f in fc_lin),
        )
        batched = (
            True, tuple(True for _ in fc_nl), tuple(True for _ in fc_lin)
        )
        return out_b, batched

    def f(mu, dmu, pd, po, dpd, dpo, trials, *flat):
        out = call(
            mu[None], dmu[None], pd[None], po[None], dpd[None], dpo[None],
            trials,
            *[x if sh else x[None]
              for x, sh in zip(flat, shared[7:])],
        )
        if out is None:
            raise ValueError("fused trial shape exceeded the VMEM budget "
                             "(check trials_fit_lanes first)")
        ld, fc_nl, fc_lin = out
        return ld[0], tuple(f_[0] for f_ in fc_nl), tuple(
            f_[0] for f_ in fc_lin
        )

    return f

"""Sequence-parallel chain inference: the trajectory axis sharded over
devices.

The chain length N is this workload's "sequence" axis (SURVEY.md section
5.7).  :mod:`..ops.parallel_chain` parallelizes the GBP recurrences *within*
one device via associative scans; this module shards the time axis itself
over a mesh axis (``sp``), so chains far longer than one device's memory —
or fused with factor/data parallelism — run with only O(P) tiny collectives:

* forward/backward Schur messages: each device composes its local segment's
  linear-fractional maps (one associative scan over N/P elements), devices
  ``all_gather`` the P segment summaries (three s x s matrices each), every
  device folds the summaries before (after) its own to get the message
  entering its segment, then evaluates its local prefixes at that incoming
  message — two passes of local work, one all_gather;
* boundary edge covariances: each device ``ppermute``s its first backward
  pivot to the left neighbor;
* log det: local sum of pivot log-dets + one ``psum``.

Outputs are bitwise-comparable to :func:`..ops.blocktridiag.
gbp_covariance_logdet` up to fp reassociation (validated in tests on the
8-virtual-device CPU mesh).

Layout convention: with P devices and N = P * Nl states, device p holds
states [p*Nl, (p+1)*Nl) — ``diag_local [Nl, s, s]`` — and off-diagonal
blocks ``off_local [Nl, s, s]`` where row j is B_{p*Nl+j} (the edge to the
NEXT state); the globally-last row is zero padding.  Use
:func:`pad_off_for_seqpar` to build that layout from a standard
``BlockTridiag``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.blocktridiag import spd_inv, spd_solve
from ..ops.parallel_chain import _compose_affine, _compose_lft
from ..ops.smallmat import logdet_spd_small
from ..ops.precision import einsum, matmul


def pad_off_for_seqpar(off: jnp.ndarray) -> jnp.ndarray:
    """[N-1, s, s] -> [N, s, s] with a zero last row (the missing edge)."""
    n1, s, _ = off.shape
    return jnp.concatenate([off, jnp.zeros((1, s, s), off.dtype)])


def _eval_lft(q, r, u, m):
    """Apply the map m -> Q - U^T (R + m)^{-1} U (batched over leading)."""
    return q - matmul(jnp.swapaxes(u, -1, -2), spd_solve(r + m, u))


def _vary(x, axis_name):
    """Mark a replicated value as device-varying so shard_map scan carries
    type-check (the fold below produces a my-index-dependent result).
    No-op when the value already varies over ``axis_name``."""
    if axis_name in getattr(jax.typeof(x), "vma", frozenset()):
        return x
    if hasattr(lax, "pcast"):
        return lax.pcast(x, (axis_name,), to="varying")
    return lax.pvary(x, (axis_name,))


def _fold_gathered(summaries, my_idx, before, s, dtype, axis_name):
    """Fold gathered segment summaries into the message entering this
    device's segment: evaluate summaries q < my_idx (``before=True``, in
    order) or q > my_idx (``before=False``, reversed) starting from m = 0.
    P is small, so this is a tiny masked scan every device runs alike."""
    q_all, r_all, u_all = summaries  # each [P, s, s]
    p = q_all.shape[0]
    idxs = jnp.arange(p) if before else jnp.arange(p - 1, -1, -1)

    def body(m, j):
        apply = (j < my_idx) if before else (j > my_idx)
        m_new = _eval_lft(q_all[j], r_all[j], u_all[j], m)
        return jnp.where(apply, m_new, m), ()

    m0 = _vary(jnp.zeros((s, s), dtype), axis_name)
    m_final, _ = lax.scan(body, m0, idxs)
    return m_final


def _local_prefixes(q, r, u):
    """Inclusive prefix compositions of local LFT elements (assoc scan)."""
    return lax.associative_scan(_compose_lft, (q, r, u))


def forward_pivots_local(diag_l, off_l, axis_name):
    """Forward Schur pivots F for this device's segment (shard_map body)."""
    nl, s, _ = diag_l.shape
    dtype = diag_l.dtype
    my = lax.axis_index(axis_name)
    zeros = jnp.zeros((nl, s, s), dtype)
    qc, rc, uc = _local_prefixes(zeros, diag_l, off_l)
    summary = (qc[-1], rc[-1], uc[-1])
    gathered = tuple(lax.all_gather(x, axis_name) for x in summary)
    m_in = _fold_gathered(gathered, my, True, s, dtype, axis_name)
    # message into local state j: j=0 -> m_in; j>0 -> prefix_{j-1}(m_in)
    msgs_tail = _eval_lft(qc[:-1], rc[:-1], uc[:-1], m_in[None])
    msgs = jnp.concatenate([m_in[None], msgs_tail], axis=0)
    return diag_l + msgs


def backward_pivots_local(diag_l, off_l, axis_name):
    """Backward pivots G for this device's segment (shard_map body).

    Backward element for state i uses (D_{i+1}, B_i^T): within a segment the
    element at local row j propagates the message from state j+1 into state
    j.  The globally-last element is zero padding (off row is zero), which
    evaluates to m=0 entering the last state — correct.
    """
    nl, s, _ = diag_l.shape
    dtype = diag_l.dtype
    my = lax.axis_index(axis_name)
    # next-state diagonals: shift left within segment; last row comes from
    # the right neighbor's first diagonal (ppermute), identity pad globally
    p = lax.psum(1, axis_name)
    nbr_first = lax.ppermute(
        diag_l[0], axis_name, [(i, (i - 1) % p) for i in range(p)]
    )
    last_next = jnp.where(my == p - 1, jnp.eye(s, dtype=dtype), nbr_first)
    diag_next = jnp.concatenate([diag_l[1:], last_next[None]], axis=0)
    zeros = jnp.zeros((nl, s, s), dtype)
    ut = jnp.swapaxes(off_l, -1, -2)
    # reversed local elements
    qc, rc, uc = _local_prefixes(
        zeros, diag_next[::-1], ut[::-1]
    )
    summary = (qc[-1], rc[-1], uc[-1])
    gathered = tuple(lax.all_gather(x, axis_name) for x in summary)
    # the fold yields the message into the NEXT segment's first state; this
    # segment's own messages are ALL the inclusive reversed prefixes applied
    # to it (forward is exclusive instead: its elements emit "into i+1",
    # backward elements emit "into i")
    m_in = _fold_gathered(gathered, my, False, s, dtype, axis_name)
    msgs_rev = _eval_lft(qc, rc, uc, m_in[None])
    return diag_l + msgs_rev[::-1]


def gbp_covariance_logdet_seqpar(diag_l, off_l, axis_name="sp"):
    """Time-sharded GBP covariance blocks + log det (shard_map body).

    Inputs per device: diag_l [Nl, s, s], off_l [Nl, s, s] (padded layout).
    Returns (cov_diag [Nl, s, s], cov_off [Nl, s, s] padded layout,
    logdet scalar replicated).
    """
    nl, s, _ = diag_l.shape
    dtype = diag_l.dtype
    my = lax.axis_index(axis_name)
    p = lax.psum(1, axis_name)
    is_last = my == p - 1

    f_piv = forward_pivots_local(diag_l, off_l, axis_name)
    g_piv = backward_pivots_local(diag_l, off_l, axis_name)

    ld = lax.psum(jnp.sum(logdet_spd_small(f_piv)), axis_name)

    # per-edge joints: edge j connects local state j to state j+1; the last
    # edge's right pivot comes from the right neighbor's first backward pivot
    nbr_gpiv = lax.ppermute(
        g_piv[0], axis_name, [(i, (i - 1) % p) for i in range(p)]
    )
    right_last = jnp.where(is_last, jnp.eye(s, dtype=dtype), nbr_gpiv)
    g_right = jnp.concatenate([g_piv[1:], right_last[None]], axis=0)

    joint = jnp.concatenate(
        [
            jnp.concatenate([f_piv, off_l], axis=2),
            jnp.concatenate([jnp.swapaxes(off_l, -1, -2), g_right], axis=2),
        ],
        axis=1,
    )  # [Nl, 2s, 2s]
    # every local state is the LEFT endpoint of its edge row, so its
    # marginal is the top-left block.  The globally-padded edge is
    # [[F_{N-1}, 0], [0, I]], whose top-left inverse block F_{N-1}^{-1} is
    # exactly the last state's marginal (zero backward message) — the
    # padding needs no special case.
    joint_cov = spd_inv(joint)
    cov_diag = joint_cov[:, :s, :s]
    cov_off = joint_cov[:, :s, s:]
    return cov_diag, cov_off, ld


def solve_seqpar(diag_l, off_l, b_l, axis_name="sp"):
    """Time-sharded block-Thomas solve A x = b (shard_map body).

    Affine recurrences have an exact identity element, so both sweeps use
    plain segment-summary prefix composition: local associative scan,
    all_gather of (M, c) summaries, masked fold, local evaluation.
    b_l, x: [Nl, s].
    """
    nl, s, _ = diag_l.shape
    dtype = diag_l.dtype
    my = lax.axis_index(axis_name)
    p = lax.psum(1, axis_name)

    f_piv = forward_pivots_local(diag_l, off_l, axis_name)

    def fold_affine(gathered_m, gathered_c, before, v0):
        idxs = jnp.arange(p) if before else jnp.arange(p - 1, -1, -1)

        def body(v, j):
            apply = (j < my) if before else (j > my)
            v_new = einsum("ij,j->i", gathered_m[j], v) + gathered_c[j]
            return jnp.where(apply, v_new, v), ()

        v, _ = lax.scan(body, _vary(v0, axis_name), idxs)
        return v

    # ---- forward elimination: y_i = b_i - B_{i-1}^T F_{i-1}^{-1} y_{i-1} --
    # local affine elements for rows 1..Nl (element j maps y at local j to
    # y at local j+1; the element crossing into the next segment belongs to
    # THIS segment's summary)
    m_elems = -matmul(jnp.swapaxes(off_l, -1, -2), spd_inv(f_piv))     # [Nl, s, s]
    # c element for local row j is b at local row j+1; roll the rhs left
    # (the wrapped last element is globally padding)
    nbr_b0 = lax.ppermute(
        b_l[0], axis_name, [(i, (i - 1) % p) for i in range(p)]
    )
    c_elems = jnp.concatenate([b_l[1:], nbr_b0[None]], axis=0)  # [Nl, s]
    mc, cc = lax.associative_scan(_compose_affine, (m_elems, c_elems))
    gathered_m = lax.all_gather(mc[-1], axis_name)
    gathered_c = lax.all_gather(cc[-1], axis_name)
    # y entering local state 0 = fold of previous segments applied to b_0
    # of segment 0... the affine chain starts at y_0 = b_0 (global)
    b0_global = lax.all_gather(b_l[0], axis_name)[0]
    y_first = fold_affine(gathered_m, gathered_c, True, b0_global)
    # y at local j (j >= 1) = local prefix_{j-1} applied to y_first
    ys_tail = einsum("nij,j->ni", mc[:-1], y_first) + cc[:-1]
    ys = jnp.concatenate([y_first[None], ys_tail], axis=0)

    # ---- back substitution: x_i = F_i^{-1} y_i - F_i^{-1} B_i x_{i+1} ----
    f_inv_y = spd_solve(f_piv, ys[:, :, None])[:, :, 0]
    m_b = -matmul(spd_inv(f_piv), off_l)                               # [Nl, s, s]
    # element at local j maps x_{j+1} -> x_j; compose right-to-left
    mc2, cc2 = lax.associative_scan(
        _compose_affine, (m_b[::-1], f_inv_y[::-1])
    )
    gm2 = lax.all_gather(mc2[-1], axis_name)
    gc2 = lax.all_gather(cc2[-1], axis_name)
    # x entering from the right of this segment (= x at the next segment's
    # first state) = fold of LATER segments' summaries seeded with a virtual
    # x_N = 0: the globally-padded last element has off = 0, hence M = 0 and
    # c = F_{N-1}^{-1} y_{N-1}, so the zero seed reproduces the true
    # x_{N-1} exactly as it folds through the last segment
    x_right = fold_affine(gm2, gc2, False, jnp.zeros((s,), dtype))
    # inclusive reversed prefix R_k maps x_right to x at local Nl-1-k
    xs_rev = einsum("nij,j->ni", mc2, x_right) + cc2
    return xs_rev[::-1]

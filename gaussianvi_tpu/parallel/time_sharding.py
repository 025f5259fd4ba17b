"""Time-sharded NGD training step: the trajectory axis over the mesh.

Completes the sequence-parallel story of SURVEY.md section 5.7 at the
training-step level: with the chain engine of :mod:`.chain_seqpar`, a full
NGD iteration — covariance, factor expectations, joint gradient assembly,
natural-gradient solve, lockstep line search — runs with the N states
sharded over an ``sp`` mesh axis.  Per-iteration communication is O(P)
small messages: the chain engine's segment summaries, one mu/cov halo
exchange for the factors straddling segment boundaries, one reverse halo
for their gradient contributions, and the psum'd line-search costs.

Layout ("chain layout"): factors are stored per-state/per-edge so they
shard with the states they touch —

* every nonlinear batch must be unary (nb=1) with exactly one factor per
  state, row j belonging to state j;
* binary (nb=2) linear batches are stored per-edge, padded to N rows with
  ``constant = 0`` (closed-form linear costs and gradients scale by the
  constant, so padding rows contribute exact zeros);
* unary linear batches are stored per-state, masked the same way.

:func:`to_chain_layout` converts a standard :class:`FactorGraph` (e.g. from
``build_chain_estimation``) into this layout on the host.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..factors import moments as mm
from ..inference.graph import FactorGraph, GaussianState
from ..ops.blocktridiag import BlockTridiag
from .chain_seqpar import gbp_covariance_logdet_seqpar, solve_seqpar


def to_chain_layout(graph: FactorGraph) -> FactorGraph:
    """Reorder a chain-structured FactorGraph into per-state/per-edge rows.

    Host-side (concrete ``start`` arrays required).  Raises if a nonlinear
    batch is not exactly one-unary-factor-per-state.
    """
    n = graph.num_states
    nl_out = []
    for fb in graph.nonlinear:
        if fb.nb != 1:
            raise ValueError("time sharding needs unary nonlinear factors")
        order = np.argsort(np.asarray(fb.start))
        starts = np.asarray(fb.start)[order]
        if not np.array_equal(starts, np.arange(n)):
            raise ValueError(
                "each nonlinear batch must cover every state exactly once"
            )
        perm = jnp.asarray(order)
        nl_out.append(replace(
            fb,
            start=jnp.asarray(starts),
            slice_offset=0,
            params=jax.tree.map(lambda p: p[perm], fb.params)
            if fb.params is not None else None,
        ))

    lin_out = []
    for lb in graph.linear:
        starts = np.asarray(lb.start)
        if len(np.unique(starts)) != len(starts):
            raise ValueError("duplicate linear-factor starts unsupported")

        def spread(x):
            out = jnp.zeros((n,) + x.shape[1:], x.dtype)
            return out.at[jnp.asarray(starts)].set(x)

        lin_out.append(replace(
            lb,
            start=jnp.arange(n, dtype=lb.start.dtype),
            slice_offset=0,
            lam=spread(lb.lam),
            psi=spread(lb.psi),
            target_mu=spread(lb.target_mu),
            target_prec=spread(lb.target_prec),
            constant=spread(lb.constant),  # missing rows: constant 0
        ))
    return FactorGraph(
        num_states=n,
        state_dim=graph.state_dim,
        nonlinear=tuple(nl_out),
        linear=tuple(lin_out),
    )


def _right_halo(x, axis_name):
    """Send this device's value to its RIGHT neighbor; receive from the
    left (device 0 receives the last device's value — callers arrange for
    that wrapped value to be exactly zero)."""
    p = lax.psum(1, axis_name)
    return lax.ppermute(x, axis_name, [(i, (i + 1) % p) for i in range(p)])


def _left_halo(x, axis_name):
    """Receive the RIGHT neighbor's value (wrapped for the last device)."""
    p = lax.psum(1, axis_name)
    return lax.ppermute(x, axis_name, [(i, (i - 1) % p) for i in range(p)])


def _edge_marginals(mu_l, cov_diag, cov_off, axis_name):
    """Per-edge (mu [Nl, 2s], cov [Nl, 2s, 2s]) with the boundary edge's
    right state haloed from the neighbor."""
    nbr_mu = _left_halo(mu_l[0], axis_name)
    nbr_cd = _left_halo(cov_diag[0], axis_name)
    mu_r = jnp.concatenate([mu_l[1:], nbr_mu[None]], axis=0)
    cd_r = jnp.concatenate([cov_diag[1:], nbr_cd[None]], axis=0)
    mu_e = jnp.concatenate([mu_l, mu_r], axis=-1)
    top = jnp.concatenate([cov_diag, cov_off], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(cov_off, -1, -2), cd_r], axis=-1)
    return mu_e, jnp.concatenate([top, bot], axis=-2)


def _local_costs(graph, mu_l, cov_diag, cov_off, temperature, axis_name):
    """This segment's share of sum_k E[psi_k]/T (scalar, psum'd later)."""
    total = jnp.zeros((), mu_l.dtype)
    mu_e, cov_e = _edge_marginals(mu_l, cov_diag, cov_off, axis_name)
    for fb in graph.nonlinear:
        e_phi = mm.expectation_phi(
            fb.nodes, fb.weights, mu_l, cov_diag, fb.cost_fn, fb.params
        )
        total = total + jnp.sum(e_phi) / temperature
    for lb in graph.linear:
        mk, ck = (mu_l, cov_diag) if lb.nb == 1 else (mu_e, cov_e)
        total = total + jnp.sum(mm.linear_cost(
            lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
            mk, ck,
        )) / temperature
    return total


def _assemble_gradients(graph, mu_l, cov_diag, cov_off, temperature,
                        axis_name):
    """Joint (Vdmu [Nl, s], Vddmu diag [Nl,s,s] + padded off [Nl,s,s]).

    Edge factors scatter their right-state contribution with one reverse
    halo; the wrapped contribution entering device 0 comes from the padded
    (constant=0) globally-last edge, hence exact zeros.
    """
    nl, s = mu_l.shape
    vdmu = jnp.zeros_like(mu_l)
    vddmu_d = jnp.zeros((nl, s, s), mu_l.dtype)
    vddmu_o = jnp.zeros((nl, s, s), mu_l.dtype)

    for fb in graph.nonlinear:
        e_phi, e_xmu, e_xxt = mm.gh_moments(
            fb.nodes, fb.weights, mu_l, cov_diag, fb.cost_fn, fb.params
        )
        vd, vdd = mm.ngd_local_gradients(
            e_phi, e_xmu, e_xxt, cov_diag, temperature
        )
        vdmu = vdmu + vd
        vddmu_d = vddmu_d + vdd

    mu_e, cov_e = _edge_marginals(mu_l, cov_diag, cov_off, axis_name)
    for lb in graph.linear:
        if lb.nb == 1:
            vd, vdd = mm.linear_local_gradients(
                lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
                mu_l, temperature,
            )
            vdmu = vdmu + vd
            vddmu_d = vddmu_d + vdd
        else:
            vd, vdd = mm.linear_local_gradients(
                lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
                mu_e, temperature,
            )  # vd [Nl, 2s], vdd [Nl, 2s, 2s]
            vdmu = vdmu + vd[:, :s]
            vddmu_d = vddmu_d + vdd[:, :s, :s]
            vddmu_o = vddmu_o + vdd[:, :s, s:]
            # right-state pieces: rows 0..Nl-2 belong to local states
            # 1..Nl-1; the boundary row goes to the right neighbor
            vdmu = vdmu.at[1:].add(vd[:-1, s:])
            vddmu_d = vddmu_d.at[1:].add(vdd[:-1, s:, s:])
            halo_mu = _right_halo(vd[-1, s:], axis_name)
            halo_dd = _right_halo(vdd[-1, s:, s:], axis_name)
            vdmu = vdmu.at[0].add(halo_mu)
            vddmu_d = vddmu_d.at[0].add(halo_dd)
    return vdmu, vddmu_d, vddmu_o


def time_ngd_iteration(graph, mu_l, prec_d, prec_o, temperature, config,
                       axis_name="sp"):
    """One NGD iteration, time-sharded (shard_map body).

    prec_o uses the padded [Nl, s, s] edge layout of
    :mod:`.chain_seqpar`.  Line search follows the lockstep pattern of
    :func:`.sharding._iteration_local` on the psum'd global cost.
    """
    def cost_of(mu_, pd_, po_):
        cd, co, ld = gbp_covariance_logdet_seqpar(pd_, po_, axis_name)
        local = _local_costs(graph, mu_, cd, co, temperature, axis_name)
        return lax.psum(local, axis_name) + 0.5 * ld, cd, co

    cost_iter, cov_diag, cov_off = cost_of(mu_l, prec_d, prec_o)
    vdmu, vddmu_d, vddmu_o = _assemble_gradients(
        graph, mu_l, cov_diag, cov_off, temperature, axis_name
    )
    dprec_d = vddmu_d - prec_d
    dprec_o = vddmu_o - prec_o
    dmu = solve_seqpar(vddmu_d, vddmu_o, -vdmu, axis_name)
    # indefinite Vddmu -> NaN direction; fall back to the (always SPD)
    # current precision as metric, agreed GLOBALLY so devices stay in
    # lockstep (mirrors inference/optimize.py's fallback)
    fallback = solve_seqpar(prec_d, prec_o, -vdmu, axis_name)
    n_bad = lax.psum(
        jnp.sum(jnp.logical_not(jnp.isfinite(dmu))), axis_name
    )
    dmu = jnp.where(n_bad == 0, dmu, fallback)

    def ls_cond(c):
        return jnp.logical_not(c[2])

    def ls_body(c):
        step, n_failed, done, acc = c
        live = jnp.logical_not(done)
        trial = step * config.step_decay
        new_mu = mu_l + trial * dmu
        new_pd = prec_d + trial * dprec_d
        new_pd = 0.5 * (new_pd + jnp.swapaxes(new_pd, -1, -2))
        new_po = prec_o + trial * dprec_o
        new_cost, _, _ = cost_of(new_mu, new_pd, new_po)
        ok = jnp.logical_and(new_cost < cost_iter, live)
        n_failed = jnp.where(
            jnp.logical_and(live, jnp.logical_not(ok)), n_failed + 1,
            n_failed,
        )
        done = jnp.logical_or(
            done, jnp.logical_or(ok, n_failed > config.niters_backtrack)
        )
        acc_mu, acc_pd, acc_po = acc
        acc = (
            jnp.where(ok, new_mu, acc_mu),
            jnp.where(ok, new_pd, acc_pd),
            jnp.where(ok, new_po, acc_po),
        )
        return (jnp.where(live, trial, step), n_failed, done, acc)

    init = (
        jnp.asarray(config.step_size_base, mu_l.dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
        (mu_l, prec_d, prec_o),
    )
    _, _, _, (acc_mu, acc_pd, acc_po) = lax.while_loop(ls_cond, ls_body, init)
    return acc_mu, acc_pd, acc_po, cost_iter


def sharded_time_ngd_step(graph: FactorGraph, state: GaussianState,
                          config, mesh: Mesh, temperature=1.0):
    """One NGD step with the trajectory axis sharded over mesh axis 'sp'.

    ``graph`` must be in chain layout (:func:`to_chain_layout`).  Returns
    (GaussianState, cost_before_step).
    """
    n, s = state.mu.shape
    p = mesh.shape["sp"]
    if n % p:
        raise ValueError(f"num_states {n} not divisible by sp={p}")
    off_pad = jnp.concatenate(
        [state.precision.off, jnp.zeros((1, s, s), state.mu.dtype)]
    )

    def nl_spec(fb):
        return type(fb)(
            start=P("sp"), nodes=P(), weights=P(),
            params=jax.tree.map(lambda _: P("sp"), fb.params)
            if fb.params is not None else None,
            cost_fn=fb.cost_fn, nb=fb.nb, block_cost=fb.block_cost,
            slice_offset=fb.slice_offset,
        )

    def lin_spec(lb):
        return type(lb)(
            start=P("sp"), lam=P("sp"), psi=P("sp"), target_mu=P("sp"),
            target_prec=P("sp"), constant=P("sp"), nb=lb.nb,
            slice_offset=lb.slice_offset,
        )

    graph_spec = FactorGraph(
        num_states=graph.num_states, state_dim=graph.state_dim,
        nonlinear=tuple(nl_spec(fb) for fb in graph.nonlinear),
        linear=tuple(lin_spec(lb) for lb in graph.linear),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_spec, P("sp"), P("sp"), P("sp")),
        out_specs=(P("sp"), P("sp"), P("sp"), P()),
        check_vma=False,
    )
    def step(graph_loc, mu_l, pd_l, po_l):
        t = jnp.asarray(temperature, mu_l.dtype)
        return time_ngd_iteration(
            graph_loc, mu_l, pd_l, po_l, t, config, "sp"
        )

    acc_mu, acc_pd, acc_po, cost = jax.jit(step)(
        graph, state.mu, state.precision.diag, off_pad
    )
    return (
        GaussianState(acc_mu, BlockTridiag(acc_pd, acc_po[:-1])),
        cost,
    )

"""Multi-chip SPMD execution over a (dp, fp) device mesh.

The reference is single-process: its only parallelism is OpenMP over factors
with thread-private gradient accumulators reduced in a critical section
(ngd/NGD-GH-impl.h:33-51) and a single-GPU batched quadrature offload
(GVI-GH-Cuda-impl.h:150-286).  SURVEY.md section 5.8 maps this to TPU:

* ``dp`` — data parallel over independent problems (parallel restarts /
  batched trajectories); rides DCN across hosts.
* ``fp`` — factor parallel: each device evaluates sigma-point moments for
  its shard of the nonlinear factors and the joint (Vdmu, Vddmu) is
  assembled with one ``psum`` over ICI — the all-reduce that replaces the
  OMP critical section.

The per-iteration line search compares globally psum-reduced costs, so every
device takes the same accept/reject branch and stays in lockstep.

Implementation: one ``shard_map`` over the whole NGD iteration.  The chain
GBP sweep and the linear-factor closed forms are cheap and replicated within
each fp group; only the quadrature hot loop is sharded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..factors import moments as mm
from ..inference.graph import (
    FactorGraph,
    GaussianState,
    gather_marginals,
    scatter_gradients,
)
from ..ops.blocktridiag import BlockTridiag, gbp_covariance_logdet, solve
from ..ops.parallel_chain import gbp_covariance_logdet_assoc, solve_assoc


def _chain_ops(config, num_states):
    if config.chain_impl == "lanes":
        from ..kernels.chain_lanes import (
            gbp_covariance_logdet_lanes_single,
            solve_lanes_single,
        )

        return gbp_covariance_logdet_lanes_single, solve_lanes_single
    use_assoc = config.chain_impl == "assoc" or (
        config.chain_impl == "auto" and num_states >= config.assoc_threshold
    )
    if use_assoc:
        return gbp_covariance_logdet_assoc, solve_assoc
    return gbp_covariance_logdet, solve


def make_mesh(dp: int, fp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * fp > len(devices):
        raise ValueError(
            f"mesh {dp}x{fp} needs {dp * fp} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[: dp * fp]).reshape(dp, fp)
    return Mesh(dev_array, ("dp", "fp"))


def stack_problems(graphs: list[FactorGraph], states: list[GaussianState]):
    """Stack B same-structure problems along a new leading axis."""
    graphs = _align_slice_offsets(graphs)
    graph_b = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
    state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return graph_b, state_b


def _align_slice_offsets(graphs: list[FactorGraph]) -> list[FactorGraph]:
    """slice_offset is static pytree metadata; problems whose factor
    supports start at different states (e.g. anchors at different indices)
    can't stack with it set — fall those batches back to the general
    gather/scatter path (slice_offset=None) before stacking."""
    from dataclasses import replace

    out = list(graphs)
    for attr in ("nonlinear", "linear"):
        groups = [getattr(g, attr) for g in out]
        for k in range(min(len(t) for t in groups) if groups else 0):
            offs = {t[k].slice_offset for t in groups}
            if len(offs) > 1:
                out = [
                    replace(g, **{attr: tuple(
                        replace(fb, slice_offset=None) if i == k else fb
                        for i, fb in enumerate(getattr(g, attr))
                    )})
                    for g in out
                ]
    return out


def _null_nonlinear_slice_offsets(graph: FactorGraph) -> FactorGraph:
    """Drop slice_offset from fp-sharded nonlinear batches (static metadata
    that is only valid for the unsharded global K axis)."""
    from dataclasses import replace

    return replace(graph, nonlinear=tuple(
        replace(fb, slice_offset=None) if fb.slice_offset is not None else fb
        for fb in graph.nonlinear
    ))


def _graph_specs(graph: FactorGraph, batched: bool):
    """PartitionSpec tree for a (batched) FactorGraph: nonlinear factor
    axes sharded over fp, problem axis over dp, rules replicated."""
    dp = ("dp",) if batched else ()

    def nl_spec(fb):
        return type(fb)(
            start=P(*dp, "fp"),
            nodes=P(*dp),
            weights=P(*dp),
            params=jax.tree.map(lambda _: P(*dp, "fp"), fb.params),
            cost_fn=fb.cost_fn,
            nb=fb.nb,
            block_cost=fb.block_cost,
            slice_offset=fb.slice_offset,
        )

    def lin_spec(lb):
        return type(lb)(
            start=P(*dp),
            lam=P(*dp),
            psi=P(*dp),
            target_mu=P(*dp),
            target_prec=P(*dp),
            constant=P(*dp),
            nb=lb.nb,
            slice_offset=lb.slice_offset,
        )

    return FactorGraph(
        num_states=graph.num_states,
        state_dim=graph.state_dim,
        nonlinear=tuple(nl_spec(fb) for fb in graph.nonlinear),
        linear=tuple(lin_spec(lb) for lb in graph.linear),
    )


def _state_spec(batched: bool):
    dp = ("dp",) if batched else ()
    return GaussianState(P(*dp), BlockTridiag(P(*dp), P(*dp)))


def _iteration_local(graph, state, temperature, config, method="ngd"):
    """One NGD/prox iteration on the local shard; factor reductions psum over
    fp.

    Runs inside shard_map: ``graph`` holds this device's factor shard,
    ``state`` the full (replicated within the fp group) joint state.
    """
    mu, precision = state.mu, state.precision
    cov_fn, solve_fn = _chain_ops(config, mu.shape[0])

    def cost_of(mu_, prec_):
        cov_d, cov_o, ld = cov_fn(prec_)
        local = jnp.zeros((), mu_.dtype)
        for fb in graph.nonlinear:
            mu_k, cov_k = gather_marginals(fb.start, fb.nb, mu_, cov_d, cov_o)
            e_phi = mm.expectation_phi(
                fb.nodes, fb.weights, mu_k, cov_k, fb.cost_fn, fb.params
            )
            local = local + jnp.sum(e_phi) / temperature
        total = lax.psum(local, "fp")
        for lb in graph.linear:  # replicated within the fp group
            mu_k, cov_k = gather_marginals(lb.start, lb.nb, mu_, cov_d, cov_o)
            total = total + jnp.sum(
                mm.linear_cost(
                    lb.lam, lb.psi, lb.target_mu, lb.target_prec,
                    lb.constant, mu_k, cov_k,
                )
            ) / temperature
        return total + 0.5 * ld, cov_d, cov_o

    cost_iter, cov_diag, cov_off = cost_of(mu, precision)

    if method == "prox":
        # JKO pseudo-gradients: per-factor (no joint solve); nonlinear
        # contributions sharded over fp, linear replicated
        from ..inference.gvi import prox_gradients
        from .. inference.graph import FactorGraph as _FG

        nl_graph = _FG(
            num_states=graph.num_states, state_dim=graph.state_dim,
            nonlinear=graph.nonlinear, linear=(),
        )
        lin_graph = _FG(
            num_states=graph.num_states, state_dim=graph.state_dim,
            nonlinear=(), linear=graph.linear,
        )
        step0 = config.step_size_base
        dmu_nl, dprec_nl = prox_gradients(
            nl_graph, mu, cov_diag, cov_off, step0
        )
        dmu = lax.psum(dmu_nl, "fp")
        dprec = BlockTridiag(
            lax.psum(dprec_nl.diag, "fp"), lax.psum(dprec_nl.off, "fp")
        )
        dmu_l, dprec_l = prox_gradients(
            lin_graph, mu, cov_diag, cov_off, step0
        )
        dmu = dmu + dmu_l
        dprec = dprec + dprec_l
    else:
        # --- factor-parallel NGD assembly: local scatter + psum over fp ---
        n, s = mu.shape
        vdmu = jnp.zeros_like(mu)
        vddmu = BlockTridiag.zeros(n, s, mu.dtype)
        for fb in graph.nonlinear:
            mu_k, cov_k = gather_marginals(
                fb.start, fb.nb, mu, cov_diag, cov_off
            )
            e_phi, e_xmu, e_xxt = mm.gh_moments(
                fb.nodes, fb.weights, mu_k, cov_k, fb.cost_fn, fb.params
            )
            vd, vdd = mm.ngd_local_gradients(
                e_phi, e_xmu, e_xxt, cov_k, temperature
            )
            vdmu, vddmu = scatter_gradients(
                fb.start, fb.nb, vd, vdd, vdmu, vddmu
            )
        vdmu = lax.psum(vdmu, "fp")
        vddmu = BlockTridiag(
            lax.psum(vddmu.diag, "fp"), lax.psum(vddmu.off, "fp")
        )
        for lb in graph.linear:
            mu_k, _ = gather_marginals(lb.start, lb.nb, mu, cov_diag, cov_off)
            vd, vdd = mm.linear_local_gradients(
                lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
                mu_k, temperature,
            )
            vdmu, vddmu = scatter_gradients(
                lb.start, lb.nb, vd, vdd, vdmu, vddmu
            )

        dprec = vddmu - precision
        dmu = solve_fn(vddmu, -vdmu.reshape(-1)).reshape(mu.shape)

    # --- backtracking on the globally-reduced cost (lockstep) ---
    def ls_cond(c):
        return jnp.logical_not(c[2])

    def ls_body(c):
        # updates gated on ``live`` — under vmap the batched while_loop runs
        # until all lanes finish and finished lanes must stay frozen.
        step, n_failed, done, acc_mu, acc_prec, accepted = c
        live = jnp.logical_not(done)
        trial = step * config.step_decay
        new_mu = mu + trial * dmu
        new_prec = (precision + dprec.scale(trial)).symmetrize()
        new_cost, _, _ = cost_of(new_mu, new_prec)
        ok = jnp.logical_and(new_cost < cost_iter, live)
        n_failed = jnp.where(
            jnp.logical_and(live, jnp.logical_not(ok)), n_failed + 1, n_failed
        )
        new_done = jnp.logical_or(
            done, jnp.logical_or(ok, n_failed > config.niters_backtrack)
        )
        acc_mu = jnp.where(ok, new_mu, acc_mu)
        acc_prec = BlockTridiag(
            jnp.where(ok, new_prec.diag, acc_prec.diag),
            jnp.where(ok, new_prec.off, acc_prec.off),
        )
        new_step = jnp.where(live, trial, step)
        return (new_step, n_failed, new_done, acc_mu, acc_prec,
                jnp.logical_or(accepted, ok))

    init = (
        jnp.asarray(config.step_size_base, mu.dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
        mu,
        precision,
        jnp.zeros((), bool),
    )
    _, _, _, acc_mu, acc_prec, _ = lax.while_loop(ls_cond, ls_body, init)
    return GaussianState(acc_mu, acc_prec), cost_iter


def sharded_ngd_step(graph_b, state_b, config, mesh: Mesh, temperature=1.0,
                     method: str = "ngd"):
    """One full NGD training step, SPMD over (dp, fp).

    ``graph_b``/``state_b`` carry a leading problem axis (sharded over dp);
    each factor batch's K axis is sharded over fp.  Returns the updated
    batched state and per-problem costs.
    """
    graph_spec = _graph_specs(graph_b, batched=True)
    state_spec = _state_spec(batched=True)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_spec, state_spec),
        out_specs=(state_spec, P("dp")),
        # freshly-created constants inside scan carries start replicated and
        # become dp/fp-varying after one step; skip the static vma check
        check_vma=False,
    )
    def step(graph_loc, state_loc):
        # the factor K axis is sharded over fp, so a shard's local `start`
        # no longer satisfies start == slice_offset + arange(K_local) for
        # shards > 0: null the now-wrong static metadata instead of carrying
        # it into the sharded scope
        graph_loc = _null_nonlinear_slice_offsets(graph_loc)

        def one(graph_i, state_i):
            t = jnp.asarray(temperature, state_i.mu.dtype)
            return _iteration_local(graph_i, state_i, t, config, method)

        return jax.vmap(one)(graph_loc, state_loc)

    return jax.jit(step)(graph_b, state_b)

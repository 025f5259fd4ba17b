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

The iteration body is THE SAME code as the single-device path
(:func:`..inference.optimize.run_gvi`), driven through
:class:`FactorShardEngine` — so the full reference loop semantics
(temperature schedule, EMA smoothing, convergence freeze, backtracking on
the globally psum-reduced cost so every device stays in lockstep) hold
sharded, and :func:`optimize_sharded` trajectories match ``optimize()``
exactly (up to psum reassociation).
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
from ..inference.config import GVIConfig
from ..inference.engine import LocalEngine
from ..inference.graph import (
    FactorGraph,
    GaussianState,
    gather_marginals,
    scatter_gradients,
)
from ..inference.optimize import GVIHistory, concat_factor_costs, run_gvi
from ..ops.blocktridiag import BlockTridiag


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
    """Align static metadata that depends on per-problem factor supports.

    * ``slice_offset``: problems whose factor supports start at different
      states (e.g. anchors at different indices) can't stack with it set —
      fall those batches back to the general gather/scatter path.
    * ``shared_start``: cleared when the concrete start indices differ
      across problems, so lane-sharing consumers (the fused trial kernel)
      exclude the batch.
    * ``uniform``: conservatively AND'ed across problems.
    """
    out = list(graphs)
    for attr in ("nonlinear", "linear"):
        groups = [getattr(g, attr) for g in out]
        for k in range(min(len(t) for t in groups) if groups else 0):
            batches = [t[k] for t in groups]
            updates = {}
            if len({fb.slice_offset for fb in batches}) > 1:
                updates["slice_offset"] = None
            starts = [np.asarray(fb.start) for fb in batches]
            if any(not np.array_equal(starts[0], st) for st in starts[1:]):
                updates["shared_start"] = False
            uniforms = {getattr(fb, "uniform", None) for fb in batches}
            if len(uniforms) > 1 and hasattr(batches[0], "uniform"):
                updates["uniform"] = False
            if updates:
                out = [
                    replace(g, **{attr: tuple(
                        replace(fb, **updates) if i == k else fb
                        for i, fb in enumerate(getattr(g, attr))
                    )})
                    for g in out
                ]
    return out


def _null_nonlinear_slice_offsets(graph: FactorGraph) -> FactorGraph:
    """Drop slice_offset from fp-sharded nonlinear batches (static metadata
    that is only valid for the unsharded global K axis)."""
    return replace(graph, nonlinear=tuple(
        replace(fb, slice_offset=None) if fb.slice_offset is not None else fb
        for fb in graph.nonlinear
    ))


def _graph_specs(graph: FactorGraph, batched: bool):
    """PartitionSpec tree for a (batched) FactorGraph: nonlinear factor
    axes sharded over fp, problem axis over dp, rules replicated."""
    dp = ("dp",) if batched else ()

    # dataclasses.replace keeps ALL static metadata (nb, cost fns,
    # slice_offset, uniform, shared_start, ...) so the spec prefix tree's
    # treedef always matches the real graph's
    def nl_spec(fb):
        return replace(
            fb,
            start=P(*dp, "fp"),
            nodes=P(*dp),
            weights=P(*dp),
            params=jax.tree.map(lambda _: P(*dp, "fp"), fb.params),
        )

    def lin_spec(lb):
        return replace(
            lb,
            start=P(*dp),
            lam=P(*dp),
            psi=P(*dp),
            target_mu=P(*dp),
            target_prec=P(*dp),
            constant=P(*dp),
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


def _history_spec(graph: FactorGraph) -> GVIHistory:
    """out_specs for a run_gvi history under vmap-over-local-problems:
    problem axis over dp; nonlinear per-factor costs reassemble their
    (sharded) K axis over fp, linear costs are fp-replicated."""
    return GVIHistory(
        mu=P("dp"), cov_diag=P("dp"), cov_off=P("dp"),
        prec_diag=P("dp"), prec_off=P("dp"),
        cost=P("dp"),
        factor_costs=(
            tuple(P("dp", None, "fp") for _ in graph.nonlinear)
            + tuple(P("dp") for _ in graph.linear)
        ),
        accepted_step=P("dp"),
    )


def resolve_sharded_impls(config: GVIConfig, mesh: Mesh,
                          num_states: int | None = None) -> GVIConfig:
    """Resolve ``chain_impl``/``quad_impl`` "auto" by the MESH's device
    platform (not the process default: a TPU-attached process may run a
    dryrun over a virtual CPU mesh, and vice versa won't happen, but the
    mesh is the ground truth either way).

    On a TPU mesh the lanes Pallas kernels run COMPILED inside shard_map —
    validated by tests/device/ (a pallas_call lowers per shard; the chain
    is (dp, fp)-local so no collective crosses the kernel) — keeping the
    measured single-chip fast path (PERF.md sections 4/7) when a second
    chip appears.  On a CPU mesh "auto" resolves to the scan paths: the
    lanes kernels would run in Pallas INTERPRET mode there, which jax 0.9
    cannot trace under shard_map's vma checking (its internal grid loop
    carries vma-untyped buffers); the interpret-mode lanes equivalence is
    instead validated explicitly with ``check_vma=False``
    (tests/test_sharded_lanes.py).
    """
    platform = mesh.devices.flat[0].platform
    new = {}
    if config.chain_impl == "auto":
        if platform == "tpu":
            new["chain_impl"] = "lanes"
        else:
            # same scan-path rule the engines use off-TPU: honor the
            # assoc_threshold knob (log-depth scans for very long chains)
            new["chain_impl"] = (
                "assoc"
                if num_states is not None
                and num_states >= config.assoc_threshold
                else "seq"
            )
    if config.quad_impl == "auto":
        chain = new.get("chain_impl", config.chain_impl)
        new["quad_impl"] = "lanes" if chain == "lanes" else "xla"
    return replace(config, **new) if new else config


class FactorShardEngine(LocalEngine):
    """Engine hooks with the nonlinear-factor axis sharded over ``fp``.

    The chain (covariance/log-det/solve) and the closed-form linear factors
    are cheap and replicated within each fp group — only the quadrature hot
    loop is sharded; the joint (Vdmu, Vddmu) and the total nonlinear cost
    are assembled with one ``psum`` over fp.  Loop-carried scalars become
    dp-varying after the first data-dependent decision (``carry_axes``).
    """

    carry_axes = ("dp",)

    def __init__(self, graph: FactorGraph, config, axis: str = "fp",
                 fp_size: int | None = None,
                 kernel_interpret: bool | None = None):
        # "auto" should have been resolved against the mesh by
        # optimize_sharded (resolve_sharded_impls); an engine constructed
        # directly without a mesh falls back to the scan paths (the
        # process platform is not trustworthy inside shard_map)
        if config.chain_impl == "auto":
            config = replace(
                config,
                chain_impl=(
                    "assoc"
                    if graph.num_states >= config.assoc_threshold else "seq"
                ),
            )
        if config.quad_impl == "auto":
            config = replace(
                config,
                quad_impl="lanes" if config.chain_impl == "lanes" else "xla",
            )
        # fp >= 2: the single fused GRADIENT kernel assembles (Vdmu,
        # Vddmu) and solves IN-kernel from the local factor shard only —
        # the joint must be psum'd BEFORE the solve, so those meshes run
        # the SPLIT kernel pair instead (accumulate per shard -> psum over
        # fp -> solve; see _build_fused_gradient below).  The fused TRIAL
        # kernel is cost-only: its per-shard factor costs reduce through
        # reduce_trial_costs (psum over fp below), so it stays enabled.
        # On a dp-ONLY mesh (fp=1, e.g. parallel restarts across chips)
        # the fp psums are size-1 no-ops and the single-kernel paths are
        # exactly as valid as in the local engine.
        self._fp_size = fp_size
        self.axis = axis
        # must land before super().__init__ (which builds the kernels);
        # see LocalEngine.kernel_interpret — the dryrun's virtual CPU mesh
        # in a TPU-default process passes True here
        self.kernel_interpret = kernel_interpret
        super().__init__(
            graph, config, use_pallas=False, quad_impl=config.quad_impl
        )

    def _build_fused_gradient(self, config):
        """fp >= 2: build the SPLIT fused-gradient pair (VERDICT r4 item
        1) — an "accum" kernel producing this shard's partial (Vdmu,
        Vddmu) from the local nonlinear factors, ONE psum over fp, and a
        "solve" kernel adding the fp-replicated linear factors and
        running covariance/logdet + dprec + both Thomas solves.  The pair
        is the single-device kernel split exactly at the psum boundary,
        so the multi-chip factor-parallel path keeps the fused fast path
        (reference analog: the all-nonlinear-factor batched CUDA launch,
        gvibase/GVI-GH-Cuda-impl.h:161-192, with the psum standing in for
        the single-GPU global-memory reduction)."""
        if self._fp_size == 1:
            return super()._build_fused_gradient(config)
        from ..kernels.fused_gradient import (
            make_gradient_vmappable,
            sharded_grad_fits_lanes,
        )

        specs = self._fused_spec_cache
        if specs is None and self.quad_impl == "lanes":
            specs = self._build_fused_specs(config, allow_prep=True)
        if specs is None:
            return None
        nl_specs, lin_specs, flat, eval_dtype, preps = specs
        g = self.graph
        n, s = g.num_states, g.state_dim
        if not sharded_grad_fits_lanes(n, s, nl_specs, lin_specs):
            return None
        fn_a = make_gradient_vmappable(
            n, s, nl_specs, (), eval_dtype=eval_dtype, mode="accum",
            interpret=self.kernel_interpret,
        )
        fn_b = make_gradient_vmappable(
            n, s, (), lin_specs, eval_dtype=eval_dtype, mode="solve",
            interpret=self.kernel_interpret,
        )
        n_nl_slots = sum(
            (1 if sp.slice_offset is None else 0) + 2 + len(sp.param_shapes)
            for sp in nl_specs
        )
        self.fused_grad_eval_dtype = eval_dtype
        return (
            "sharded", fn_a, fn_b,
            tuple(flat[:n_nl_slots]), tuple(flat[n_nl_slots:]), preps,
        )

    def fused_gradient(self, state, temperature):
        fg = self._fused_gradient
        if not (isinstance(fg, tuple) and fg and fg[0] == "sharded"):
            return super().fused_gradient(state, temperature)
        _, fn_a, fn_b, nl_flat, lin_flat, preps = fg
        nl_flat = self._splice_preps(nl_flat, preps, state.mu)
        vdmu, vdd, vdo = fn_a(
            state.mu, state.precision.diag, state.precision.off,
            temperature, *nl_flat,
        )
        # THE psum: the all-reduce replacing the reference's OpenMP
        # critical-section joint assembly (ngd/NGD-GH-impl.h:39-51)
        vdmu = lax.psum(vdmu, self.axis)
        vdd = lax.psum(vdd, self.axis)
        vdo = lax.psum(vdo, self.axis)
        covd, covo, ld, dpd, dpo, dmu, dfb = fn_b(
            state.mu, state.precision.diag, state.precision.off,
            temperature, vdmu, vdd, vdo, *lin_flat,
        )
        return covd, covo, ld, BlockTridiag(dpd, dpo), dmu, dfb

    def reduce_fc(self, fc_tuple):
        n_nl = len(self.graph.nonlinear)
        nl, lin = fc_tuple[:n_nl], fc_tuple[n_nl:]
        total = jnp.zeros(())
        if nl:
            total = total + lax.psum(sum(jnp.sum(f) for f in nl), self.axis)
        if lin:
            # linear factors are replicated within the fp group — no psum
            total = total + sum(jnp.sum(f) for f in lin)
        return total

    def reduce_trial_costs(self, trial_lds, fc_t):
        """Fused-trial costs under fp sharding: the kernel evaluated this
        device's nonlinear shard only — psum those sums over fp; the
        linear batches and the chain logdet are fp-replicated."""
        n_nl = len(self.graph.nonlinear)
        nl, lin = fc_t[:n_nl], fc_t[n_nl:]
        total = 0.5 * trial_lds
        if nl:
            total = total + lax.psum(
                sum(jnp.sum(f, axis=-1) for f in nl), self.axis
            )
        if lin:
            total = total + sum(jnp.sum(f, axis=-1) for f in lin)
        return total

    def ngd_gradients(self, mu, cov_diag, cov_off, temperature,
                      eval_dtype=None):
        n, s = mu.shape
        vdmu = jnp.zeros_like(mu)
        vddmu = BlockTridiag.zeros(n, s, mu.dtype)
        for fb in self.graph.nonlinear:
            mu_k, cov_k = gather_marginals(
                fb.start, fb.nb, mu, cov_diag, cov_off
            )
            e_phi, e_xmu, e_xxt = mm.batch_moments(
                fb, mu_k, cov_k, use_pallas=False, eval_dtype=eval_dtype,
                quad_impl=self.quad_impl,
            )
            vd, vdd = mm.ngd_local_gradients(
                e_phi, e_xmu, e_xxt, cov_k, temperature
            )
            vdmu, vddmu = scatter_gradients(fb.start, fb.nb, vd, vdd, vdmu, vddmu)
        vdmu = lax.psum(vdmu, self.axis)
        vddmu = BlockTridiag(
            lax.psum(vddmu.diag, self.axis), lax.psum(vddmu.off, self.axis)
        )
        for lb in self.graph.linear:
            mu_k, _ = gather_marginals(lb.start, lb.nb, mu, cov_diag, cov_off)
            vd, vdd = mm.linear_local_gradients(
                lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
                mu_k, temperature,
            )
            vdmu, vddmu = scatter_gradients(lb.start, lb.nb, vd, vdd, vdmu, vddmu)
        return vdmu, vddmu

    def prox_gradients(self, mu, cov_diag, cov_off, step_size):
        from ..inference.gvi import prox_gradients

        nl_graph = replace(self.graph, linear=())
        lin_graph = replace(self.graph, nonlinear=())
        dmu_nl, dprec_nl = prox_gradients(
            nl_graph, mu, cov_diag, cov_off, step_size, self.quad_impl
        )
        dmu = lax.psum(dmu_nl, self.axis)
        dprec = BlockTridiag(
            lax.psum(dprec_nl.diag, self.axis),
            lax.psum(dprec_nl.off, self.axis),
        )
        dmu_l, dprec_l = prox_gradients(
            lin_graph, mu, cov_diag, cov_off, step_size
        )
        return dmu + dmu_l, dprec + dprec_l


def optimize_sharded(
    graph_b,
    state_b,
    config: GVIConfig,
    mesh: Mesh,
    method: str = "ngd",
    check_vma: bool = True,
) -> tuple[GaussianState, GVIHistory]:
    """The FULL GVI loop (identical semantics to ``optimize``), SPMD over
    (dp, fp).

    ``graph_b``/``state_b`` carry a leading problem axis (sharded over dp);
    each nonlinear batch's K axis is sharded over fp.  Returns the batched
    final state and per-problem history — trajectories match a vmapped
    ``optimize`` run up to floating-point reassociation of the psum.

    "auto" impls resolve against the MESH platform (lanes Pallas kernels
    on TPU meshes — compiled per shard; scan paths on CPU meshes), see
    :func:`resolve_sharded_impls`.  ``check_vma=False`` disables
    shard_map's varying-axes type system — needed only to run the lanes
    kernels in Pallas INTERPRET mode under shard_map (CPU-mesh validation;
    jax 0.9 limitation).
    """
    config = resolve_sharded_impls(config, mesh, graph_b.num_states)
    graph_spec = _graph_specs(graph_b, batched=True)
    state_spec = _state_spec(batched=True)
    hist_spec = _history_spec(graph_b)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_spec, state_spec),
        out_specs=(state_spec, hist_spec),
        check_vma=check_vma,
    )
    def run(graph_loc, state_loc):
        # the factor K axis is sharded over fp, so a shard's local `start`
        # no longer satisfies start == slice_offset + arange(K_local) for
        # shards > 0: null the now-wrong static metadata
        graph_loc = _null_nonlinear_slice_offsets(graph_loc)

        def one(graph_i, state_i):
            engine = FactorShardEngine(
                graph_i, config, fp_size=mesh.shape["fp"]
            )
            return run_gvi(engine, state_i, config, method)

        return jax.vmap(one)(graph_loc, state_loc)

    state, hist = jax.jit(run)(graph_b, state_b)
    return state, hist._replace(
        factor_costs=concat_factor_costs(
            hist.factor_costs, config.niters, state.mu.dtype
        )
    )


def sharded_ngd_step(graph_b, state_b, config, mesh: Mesh, temperature=1.0,
                     method: str = "ngd"):
    """One NGD/prox step, SPMD over (dp, fp), at a fixed temperature.

    Kept as the single-step entry point (the multi-iteration loop is
    :func:`optimize_sharded`).  Returns the updated batched state and the
    per-problem cost at the top of the step.
    """
    cfg = replace(
        config,
        niters=1,
        temperature=float(temperature),
        # a single fixed-temperature step: no scheduled switch, and an
        # exhausted line search must not change the temperature
        niters_lowtemp=2**30,
        high_temperature=float(temperature),
    )
    state, hist = optimize_sharded(graph_b, state_b, cfg, mesh, method)
    return state, hist.cost[:, 0]

"""On-device regression gates (VERDICT r3 item 6).

The 230+-test unit suite runs on CPU/f64; these tests run the COMPILED TPU
paths and are the standing gate against device-only regressions (the §19
lesson: a kernel VMEM-budget bug shipped in round 1 and survived two rounds
because the device paths were only exercised by manual bench sessions).

Usage (one process, one remote-compile warmup):

    GVI_DEVICE_TESTS=1 python -m pytest tests/device/ -q -n 0

Under the normal `pytest tests/` invocation the session backend is cpu
(tests/conftest.py) and everything here SKIPS.  Run at the top of every
bench session; record the outcome in PROGRESS.jsonl / the session log.

The checks mirror scripts/tpu_smoke.py (kept as a standalone runner) plus
compile-coverage for every kernel shape class that has bitten before:
multi-grid chain calls, the chunked single-grid mode, the fused trial and
fused gradient kernels at the bench shape.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="device gates need a TPU backend (GVI_DEVICE_TESTS=1)",
)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


@pytest.fixture(scope="session", autouse=True)
def warmup():
    """Pay the per-process remote-compile session warmup once."""
    sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))


def _chain_problem(num_states=16, dim_x=1, gh_degree=4, seed=0):
    from gaussianvi_tpu.examples.chain_estimation import (
        build_chain_estimation,
    )

    return build_chain_estimation(
        num_states=num_states, dim_x=dim_x, gh_degree=gh_degree, seed=seed
    )


class TestOptimizerPaths:
    def test_scan_chain_ngd(self):
        from gaussianvi_tpu.inference import GVIConfig, optimize

        graph, init, _ = _chain_problem()
        cfg = GVIConfig(niters=5, niters_lowtemp=5, step_size_base=0.9,
                        chain_impl="seq")
        _, hist = optimize(graph, init, cfg, method="ngd")
        cost = np.asarray(hist.cost)
        assert np.isfinite(cost).all() and cost[-1] < cost[0]

    def test_lanes_chain_ngd_reaches_scan_basin(self):
        from gaussianvi_tpu.inference import GVIConfig, optimize

        graph, init, _ = _chain_problem()
        cfg_s = GVIConfig(niters=5, niters_lowtemp=5, step_size_base=0.9,
                          chain_impl="seq")
        cfg_l = GVIConfig(niters=5, niters_lowtemp=5, step_size_base=0.9,
                          chain_impl="lanes")
        _, hist_s = optimize(graph, init, cfg_s, method="ngd")
        _, hist_l = optimize(graph, init, cfg_l, method="ngd")
        c_scan, c_lanes = float(hist_s.cost[-1]), float(hist_l.cost[-1])
        # f32 accept decisions can flip between impls; gate the basin
        assert np.isfinite(c_lanes) and c_lanes < c_scan * 1.05 + 1e-3


class TestKernelOracles:
    def test_chain_lanes_vs_scan(self):
        from gaussianvi_tpu.kernels.chain_lanes import (
            gbp_covariance_logdet_lanes,
        )
        from gaussianvi_tpu.ops.blocktridiag import (
            BlockTridiag,
            gbp_covariance_logdet,
        )

        rng = np.random.default_rng(0)
        diag = rng.standard_normal((256, 16, 4, 4)).astype("float32")
        diag = diag @ diag.transpose(0, 1, 3, 2) + 12 * np.eye(
            4, dtype="float32"
        )
        off = (0.5 * rng.standard_normal((256, 15, 4, 4))).astype("float32")
        cd, co, ld = jax.jit(gbp_covariance_logdet_lanes)(
            jnp.asarray(diag), jnp.asarray(off)
        )
        cd0, co0, ld0 = jax.jit(
            jax.vmap(lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o)))
        )(jnp.asarray(diag), jnp.asarray(off))
        assert float(jnp.abs(cd - cd0).max()) < 1e-3
        assert float(jnp.abs(ld - ld0).max()) < 1e-2

    @pytest.mark.parametrize("n,b", [(256, 256), (512, 200)])
    def test_chain_lanes_large_n_compiles(self, n, b):
        """The §19 regression class: multi-grid and chunked single-grid
        chain shapes must compile AND match the scan oracle (the VMEM
        budget bug produced a compile-time scoped-vmem OOM that only a
        device run catches)."""
        from gaussianvi_tpu.kernels.chain_lanes import (
            gbp_covariance_logdet_lanes,
        )
        from gaussianvi_tpu.ops.blocktridiag import (
            BlockTridiag,
            gbp_covariance_logdet,
        )

        rng = np.random.default_rng(1)
        s = 4
        diag = rng.standard_normal((b, n, s, s)).astype("float32")
        diag = diag @ diag.transpose(0, 1, 3, 2) + 10 * np.eye(
            s, dtype="float32"
        )
        off = (0.3 * rng.standard_normal((b, n - 1, s, s))).astype("float32")
        cd, co, ld = jax.jit(gbp_covariance_logdet_lanes)(
            jnp.asarray(diag), jnp.asarray(off)
        )
        sync(ld)
        # oracle on a slice (full scan batch is slow on device)
        cd0, co0, ld0 = jax.jit(
            jax.vmap(lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o)))
        )(jnp.asarray(diag[:8]), jnp.asarray(off[:8]))
        assert float(jnp.abs(cd[:8] - cd0).max()) < 1e-3

    def test_quad_lanes_vs_xla_moments(self):
        from gaussianvi_tpu.factors import moments as mm
        from gaussianvi_tpu.kernels.quad_lanes import quad_lanes

        graph, _, _ = _chain_problem()
        fb = graph.nonlinear[0]
        k, d = fb.start.shape[0], fb.dim
        b = 256
        rng = np.random.default_rng(0)
        mu_q = jnp.asarray(rng.standard_normal((b, k, d)), jnp.float32)
        a = rng.standard_normal((b, k, d, d)).astype("float32") * 0.3
        cov_q = jnp.asarray(
            a @ a.transpose(0, 1, 3, 2) + 0.5 * np.eye(d, dtype="float32")
        )
        leaves = tuple(
            jnp.broadcast_to(p[None], (b,) + p.shape)
            for p in jax.tree.leaves(fb.params)
        )
        struct = jax.tree.structure(fb.params)
        q = jax.jit(lambda m, c, *ps: quad_lanes(
            m, c, fb.nodes, fb.weights, fb.lanes_cost, ps, True))(
            mu_q, cov_q, *leaves)
        ref = jax.jit(jax.vmap(lambda m, c, *ps: mm.gh_moments(
            fb.nodes, fb.weights, m, c, fb.cost_fn,
            jax.tree.unflatten(struct, list(ps)))))(mu_q, cov_q, *leaves)
        errs = [float(jnp.abs(x - y).max()) for x, y in zip(q, ref)]
        assert max(errs) < 1e-3

    def test_fused_gradient_vs_separate(self):
        """Compiled fused gradient kernel at the bench shape class."""
        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.engine import LocalEngine

        graph, init, _ = _chain_problem(num_states=32, dim_x=2)
        eng = LocalEngine(graph, GVIConfig(chain_impl="lanes"))
        assert eng.fused_gradient_ready
        t = jnp.asarray(1.0, jnp.float32)
        covd, covo, ld, dprec, dmu, dfb = jax.jit(
            lambda s: eng.fused_gradient(s, t)
        )(init)
        cd, co, ld2 = eng.cov_logdet(init.precision)
        vdmu, vddmu = eng.ngd_gradients(init.mu, cd, co, t)
        dprec2 = vddmu - init.precision
        _, dfb2 = eng.solve_pair(vddmu, init.precision, -vdmu)
        assert float(jnp.abs(covd - cd).max()) < 1e-4
        assert float(jnp.abs(dprec.diag - dprec2.diag).max()) < 1e-2
        assert float(jnp.abs(dfb - dfb2).max()) < 1e-3


class TestShardMapLanes:
    def test_compiled_lanes_under_shard_map(self):
        """The lanes chain kernel COMPILED inside shard_map under
        check_vma=True (the multi-chip fast path; a 1x1 TPU mesh exercises
        the exact lowering a multi-chip mesh uses per shard)."""
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        from gaussianvi_tpu.kernels.chain_lanes import (
            gbp_covariance_logdet_lanes_single,
        )
        from gaussianvi_tpu.ops.blocktridiag import (
            BlockTridiag,
            gbp_covariance_logdet,
        )

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "fp"))
        rng = np.random.default_rng(0)
        b, n, s = 8, 6, 3
        d = rng.standard_normal((b, n, s, s)).astype("float32")
        d = d @ np.swapaxes(d, -1, -2) + 6 * np.eye(s, dtype="float32")
        o = (0.3 * rng.standard_normal((b, n - 1, s, s))).astype("float32")
        d, o = jnp.asarray(d), jnp.asarray(o)

        @partial(jax.shard_map, mesh=mesh, in_specs=(P("dp"), P("dp")),
                 out_specs=(P("dp"), P("dp"), P("dp")))
        def run(dl, ol):
            return jax.vmap(
                lambda dd, oo: gbp_covariance_logdet_lanes_single(
                    BlockTridiag(dd, oo)
                )
            )(dl, ol)

        cd, co, ld = jax.jit(run)(d, o)
        cd0, _, ld0 = jax.jit(jax.vmap(
            lambda dd, oo: gbp_covariance_logdet(BlockTridiag(dd, oo))
        ))(d, o)
        assert float(jnp.abs(cd - cd0).max()) < 1e-4
        assert float(jnp.abs(ld - ld0).max()) < 1e-3

    def test_compiled_split_gradient_pair(self):
        """The fp-sharded split fused-gradient pair (accum -> psum ->
        solve) COMPILED under shard_map with check_vma=True on a 1x1 TPU
        mesh, forced onto the fp>=2 code path (fp_size=2 with a size-1 fp
        axis: the psum is an identity and the shard holds every factor, so
        the result must match the local single-kernel fused gradient)."""
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.engine import LocalEngine
        from gaussianvi_tpu.parallel.sharding import (
            FactorShardEngine,
            _graph_specs,
            _null_nonlinear_slice_offsets,
            _state_spec,
            stack_problems,
        )

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "fp"))
        cfg = GVIConfig(chain_impl="lanes", quad_impl="lanes")
        g, s0, _ = _chain_problem(num_states=8, dim_x=1, gh_degree=3)
        graph_b, state_b = stack_problems([g], [s0])
        gspec = _graph_specs(graph_b, batched=True)
        sspec = _state_spec(batched=True)

        @partial(jax.shard_map, mesh=mesh, in_specs=(gspec, sspec),
                 out_specs=(P("dp"),) * 7, check_vma=True)
        def run(graph_loc, state_loc):
            graph_loc = _null_nonlinear_slice_offsets(graph_loc)

            def one(gi, si):
                eng = FactorShardEngine(gi, cfg, fp_size=2)
                assert eng._fused_gradient[0] == "sharded"
                covd, covo, ld, dprec, dmu, dfb = eng.fused_gradient(
                    si, jnp.asarray(1.0, si.mu.dtype)
                )
                return covd, covo, ld, dprec.diag, dprec.off, dmu, dfb

            return jax.vmap(one)(graph_loc, state_loc)

        out_sh = jax.jit(run)(graph_b, state_b)
        sync(out_sh[5])
        eng_l = LocalEngine(g, cfg)
        out_l = eng_l.fused_gradient(s0, jnp.asarray(1.0, jnp.float32))
        out_l = (out_l[0], out_l[1], out_l[2], out_l[3].diag, out_l[3].off,
                 out_l[4], out_l[5])
        for a, b in zip(out_sh, out_l):
            assert float(jnp.abs(jnp.asarray(a)[0] - b).max()) < 1e-4

    def test_sharded_optimize_lanes_on_tpu_mesh(self):
        """optimize_sharded resolves 'auto' to the lanes kernels on a TPU
        mesh and matches the local run."""
        from gaussianvi_tpu.inference import GVIConfig, optimize
        from gaussianvi_tpu.parallel.sharding import (
            optimize_sharded,
            resolve_sharded_impls,
            stack_problems,
        )
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "fp"))
        cfg = GVIConfig(niters=3, niters_lowtemp=3, step_size_base=0.9)
        resolved = resolve_sharded_impls(cfg, mesh)
        assert resolved.chain_impl == "lanes"
        assert resolved.quad_impl == "lanes"
        graphs, states = [], []
        for seed in range(2):
            g, s0, _ = _chain_problem(num_states=8, dim_x=1, gh_degree=3,
                                      seed=seed)
            graphs.append(g)
            states.append(s0)
        graph_b, state_b = stack_problems(graphs, states)
        st_sh, hist_sh = optimize_sharded(graph_b, state_b, cfg, mesh)
        for i, (g, s0) in enumerate(zip(graphs, states)):
            _, hist_l = optimize(g, s0, resolved, method="ngd")
            rel = np.abs(
                np.asarray(hist_sh.cost[i]) - np.asarray(hist_l.cost)
            ) / np.abs(np.asarray(hist_l.cost))
            assert rel.max() < 1e-4


class TestTimeShardGate:
    def test_time_sharded_optimize_on_sp_mesh(self):
        """optimize_time_sharded COMPILED on a 1-device sp mesh (the
        per-shard lowering a multi-device sp mesh uses) matches the local
        run — the sp sibling of the fp gates above (VERDICT r4 item 5)."""
        from jax.sharding import Mesh

        from gaussianvi_tpu.inference import GVIConfig, optimize
        from gaussianvi_tpu.parallel.time_sharding import (
            optimize_time_sharded,
            to_chain_layout,
        )

        g, s0, _ = _chain_problem(num_states=8, dim_x=1, gh_degree=3)
        chain = to_chain_layout(g)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
        cfg = GVIConfig(niters=3, niters_lowtemp=3, step_size_base=0.9)
        st_t, hist_t = optimize_time_sharded(chain, s0, cfg, mesh)
        sync(hist_t.cost)
        _, hist_l = optimize(g, s0, cfg, method="ngd")
        rel = np.abs(
            np.asarray(hist_t.cost) - np.asarray(hist_l.cost)
        ) / np.abs(np.asarray(hist_l.cost))
        assert rel.max() < 1e-4


class TestE2ENumericsGates:
    """f32 device trajectory vs f64 host oracle — the composed-path gate
    that catches precision-class regressions a single kernel check misses
    (e.g. the round-2 DEFAULT-matmul-precision bug)."""

    def test_chain_estimation_10iter_vs_f64(self):
        from gaussianvi_tpu.inference import GVIConfig, optimize

        cfg10 = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            g64, s64, _ = _chain_problem(num_states=32, dim_x=2)
            _, hist64 = optimize(g64, s64, cfg10, method="ngd")
            cost64 = np.asarray(hist64.cost, dtype=np.float64)
        g32, s32, _ = _chain_problem(num_states=32, dim_x=2)
        _, hist32 = optimize(g32, s32, cfg10, method="ngd")
        cost32 = np.asarray(hist32.cost, dtype=np.float64)
        rel = np.abs(cost32 - cost64) / np.maximum(np.abs(cost64), 1e-12)
        assert np.isfinite(cost32).all()
        assert rel.max() < 1e-3

    def test_separate_path_no_accept_collapse_b1024(self):
        """PERF §27's residual failure class, now a standing gate: on the
        SEPARATE batched-trial path (fused kernels off) the f32
        signed-weight sparse-GH sum used to cancel into huge negative trial
        costs on ~8/1024 near-singular problems and the line search
        accepted them.  The quadrature cancellation-trust guard
        (kernels/quad_lanes._cancel_tol) must reject those trials: every
        final cost stays finite and positive (healthy runs end ~3e2; the
        collapses ended at ~-1e4)."""
        import sys

        sys.path.insert(0, ".")
        from bench import build_batch
        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph_b, state_b = build_batch(1024, 32, 2, 4)
        cfg = GVIConfig(
            niters=10, niters_lowtemp=10, step_size_base=0.9,
            chain_impl="lanes", fused_trials="off", fused_gradient="off",
            linesearch="batched",
        )
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost
        ))
        costs = np.asarray(run(graph_b, state_b))          # [B, niters]
        final = costs[:, -1]
        n_collapsed = int(np.sum(final < 0))
        assert n_collapsed == 0, (
            f"{n_collapsed}/1024 collapsed (min {final.min():.1f})"
        )
        assert np.isfinite(final).all()

    def test_planar_planner_vs_f64(self):
        """The planning workloads run the separate-kernel path (SDF prep
        disqualifies the fused kernels) — the PERF §14 accept-noise class."""
        from gaussianvi_tpu.examples.planar_planning import (
            build_planar_planning,
        )
        from gaussianvi_tpu.inference import optimize

        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            g64p, i64p, cfg_p, _ = build_planar_planning(gh_degree=3)
            _, h64p = optimize(g64p, i64p, cfg_p, method="ngd")
            c64p = float(h64p.cost[-1])
        g32p, i32p, cfg_p32, _ = build_planar_planning(gh_degree=3)
        _, h32p = optimize(g32p, i32p, cfg_p32, method="ngd")
        c32p = float(h32p.cost[-1])
        relp = abs(c32p - c64p) / max(abs(c64p), 1e-9)
        assert np.isfinite(c32p) and relp < 2e-2

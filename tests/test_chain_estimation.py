"""Multi-state chain inference: linear-Gaussian exactness + nonlinear smoke.

For a purely linear-Gaussian factor graph, Gaussian VI is exact: the
converged q must equal the true posterior N(H^{-1} b, H^{-1}) where H is the
scattered sum of factor Hessians.  This is a stronger property test than
anything the reference ships, and it validates the full joint pipeline
(scatter, GBP, solve, line search) at once.
"""

import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.examples.chain_estimation import (
    build_chain_estimation,
    run_chain_estimation,
)
from gaussianvi_tpu.factors.priors import fixed_prior, minimum_acc_prior
from gaussianvi_tpu.inference import (
    FactorGraph,
    GaussianState,
    GVIConfig,
    optimize,
)
from gaussianvi_tpu.ops import BlockTridiag


def dense_posterior(linear_batches, num_states, state_dim):
    """Exact Gaussian posterior for linear factors: H, b from
    -log p = sum C ||Lam x - Psi mu_t||^2_{P}  =>  H = sum 2C Lam^T P Lam."""
    d = num_states * state_dim
    h = np.zeros((d, d))
    b = np.zeros(d)
    for lb in linear_batches:
        lam = np.asarray(lb.lam)
        psi = np.asarray(lb.psi)
        tp = np.asarray(lb.target_prec)
        tmu = np.asarray(lb.target_mu)
        cst = np.asarray(lb.constant)
        for k in range(lb.num_factors):
            start = int(lb.start[k]) * state_dim
            sl = slice(start, start + lb.nb * state_dim)
            a = 2.0 * cst[k] * lam[k].T @ tp[k] @ lam[k]
            rhs = 2.0 * cst[k] * lam[k].T @ tp[k] @ (psi[k] @ tmu[k])
            h[sl, sl] += a
            b[sl] += rhs
    mean = np.linalg.solve(h, b)
    return mean, h


class TestLinearGaussianExactness:
    def test_converges_to_exact_posterior(self):
        num_states, dim_x, dt = 8, 1, 0.2
        state_dim = 2 * dim_x
        rng = np.random.default_rng(5)
        anchor_mu = rng.standard_normal(state_dim)
        anchor = fixed_prior(0, anchor_mu, 0.5 * np.eye(state_dim))
        gp = minimum_acc_prior(np.eye(dim_x), dt, num_states)
        # linear position "measurements" as an extra anchor on every state
        meas_mu = rng.standard_normal((num_states, state_dim))
        meas = fixed_prior(0, meas_mu[0], 2.0 * np.eye(state_dim))
        import jax
        meas = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)
            if isinstance(xs[0], jnp.ndarray) and xs[0].ndim > 0
            else xs[0],
            *[fixed_prior(i, meas_mu[i], 2.0 * np.eye(state_dim))
              for i in range(num_states)],
        )
        graph = FactorGraph(
            num_states=num_states, state_dim=state_dim,
            linear=(anchor, gp, meas),
        )
        init = GaussianState(
            jnp.zeros((num_states, state_dim)),
            BlockTridiag.identity(num_states, state_dim, 5.0),
        )
        # high_temperature=1.0 so the backtracking-exhaustion escalation at
        # the optimum (GVI-GH-impl.h:100-115) is a no-op and q* stays the
        # untempered posterior.
        config = GVIConfig(
            niters=30, niters_lowtemp=30, step_size_base=0.9,
            high_temperature=1.0,
        )
        final, hist = optimize(graph, init, config, method="ngd")

        mean_exact, h_exact = dense_posterior(
            graph.linear, num_states, state_dim
        )
        np.testing.assert_allclose(
            np.asarray(final.mu).reshape(-1), mean_exact, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(final.precision.to_dense()),
            h_exact,
            rtol=1e-5, atol=1e-6,
        )

    def test_cost_decreases(self):
        num_states = 8
        _, hist = run_chain_estimation(
            "ngd", num_states=num_states, dim_x=1, dt=0.1
        )
        cost = np.asarray(hist.cost)
        assert cost[-1] < cost[0]
        # monotone wherever a step was accepted
        acc = np.asarray(hist.accepted_step) > 0
        diffs = np.diff(cost)
        assert np.all(diffs[acc[:-1]] < 1e-12)


class TestNonlinearChain:
    def test_ngd_runs_and_improves(self):
        final, hist = run_chain_estimation("ngd", num_states=12, dim_x=2)
        assert np.isfinite(np.asarray(hist.cost)).all()
        assert hist.cost[-1] < hist.cost[0]
        assert np.isfinite(np.asarray(final.mu)).all()

    def test_prox_runs_and_improves(self):
        """BW-proximal descent is a small-step method: the JKO step is
        first-order in the factor curvature, so the step size must sit below
        2/L (here measurement precision ~4)."""
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )

        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4,
            meas_sigma=0.5, anchor_cov=0.5,
        )
        config = GVIConfig(
            niters=20, niters_lowtemp=20, step_size_base=0.2
        )
        final, hist = optimize(graph, init, config, method="prox")
        assert np.isfinite(np.asarray(hist.cost)).all()
        assert hist.cost[-1] < hist.cost[0]

    def test_posterior_tracks_truth(self):
        """Converged position means should be near the simulated trajectory."""
        from gaussianvi_tpu.examples.chain_estimation import simulate_trajectory

        num_states, dim_x, dt = 16, 1, 0.1
        final, _ = run_chain_estimation(
            "ngd", num_states=num_states, dim_x=dim_x, dt=dt
        )
        pos, _, _, _, _ = simulate_trajectory(num_states, dim_x, dt, seed=0)
        est = np.asarray(final.mu[:, :dim_x])
        assert np.abs(est - pos).max() < 0.2


class TestProxNaNGuard:
    def test_prox_state_stays_finite_on_hard_problem(self):
        """Prox's exhausted line search takes the LAST trial (reference
        semantics); when even that trial's cost is NaN the state must not
        be poisoned — the iterate freezes instead (the reference's SPD
        checks, proxgd/ProxGVIFactorizedBaseGH.h:192-215, play this role
        upstream)."""
        import jax.numpy as jnp
        import numpy as np

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph, init, _ = build_chain_estimation(
            num_states=32, dim_x=2, gh_degree=4, seed=0
        )
        # NGD-tuned config: large step, JKO proposals go non-SPD -> NaN costs
        cfg = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
        st, hist = optimize(graph, init, cfg, method="prox")
        assert np.isfinite(np.asarray(st.mu)).all()
        assert np.isfinite(np.asarray(st.precision.diag)).all()


class TestEMAProposal:
    def test_alpha_one_is_plain_update(self):
        import jax.numpy as jnp
        import numpy as np

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=1, gh_degree=4, seed=1
        )
        cfg_plain = GVIConfig(niters=3, step_size_base=0.7)
        cfg_ema1 = GVIConfig(niters=3, step_size_base=0.7, ema_alpha=1.0)
        st_a, _ = optimize(graph, init, cfg_plain)
        st_b, _ = optimize(graph, init, cfg_ema1)
        np.testing.assert_array_equal(
            np.asarray(st_a.mu), np.asarray(st_b.mu)
        )

    def test_half_alpha_halves_first_step(self):
        """Iteration 1: same accept decision and direction, so
        mu_ema - mu0 = alpha * (mu_plain - mu0) exactly
        (GVI-GH-Cuda-impl.h:112-114)."""
        import numpy as np

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=1, gh_degree=4, seed=1
        )
        st_p, _ = optimize(graph, init, GVIConfig(niters=1, step_size_base=0.7))
        st_e, _ = optimize(
            graph, init, GVIConfig(niters=1, step_size_base=0.7, ema_alpha=0.5)
        )
        mu0 = np.asarray(init.mu)
        np.testing.assert_allclose(
            np.asarray(st_e.mu) - mu0,
            0.5 * (np.asarray(st_p.mu) - mu0),
            rtol=1e-6,
        )

    def test_ema_run_converges(self):
        import numpy as np

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph, init, _ = build_chain_estimation(
            num_states=16, dim_x=1, gh_degree=4, seed=2
        )
        cfg = GVIConfig(niters=12, niters_lowtemp=12, step_size_base=0.9,
                        ema_alpha=0.7)
        st, hist = optimize(graph, init, cfg)
        c = np.asarray(hist.cost)
        assert np.isfinite(np.asarray(st.mu)).all()
        assert c[-1] < c[0]


class TestReducedPrecisionMoments:
    def _setup(self):
        import jax.numpy as jnp

        from gaussianvi_tpu.examples.chain_estimation import range_cost
        from gaussianvi_tpu.quadrature.table import get_rule

        nodes, weights = (jnp.asarray(a) for a in get_rule(4, 4))
        k = 8
        mu = jnp.linspace(1.0, 2.0, 4 * k).reshape(k, 4)
        cov = jnp.broadcast_to(0.05 * jnp.eye(4), (k, 4, 4))
        params = {
            "r": jnp.linspace(2.0, 4.0, k),
            "beacon": jnp.broadcast_to(jnp.asarray([-1.0, -1.0]), (k, 2)),
            "sig_r_sq": jnp.full((k,), 0.01),
        }
        return nodes, weights, mu, cov, params, range_cost

    @staticmethod
    def _rel(a, b):
        import numpy as np

        return np.abs(np.asarray(a) - np.asarray(b)) / np.maximum(
            np.abs(np.asarray(b)), 1e-6
        )

    def test_centered_quantization_accuracy(self):
        """Centered sigma-offset quantization error envelope.

        The round-1 study found full-bf16 phi evaluation hits catastrophic
        cancellation in residual-style costs (worst ~10% E[phi] error).
        The centered mode quantizes only the OFFSET from the marginal mean
        (moments._sigma_diffs), evaluating phi in working precision — the
        measured envelope on the same residual cost drops to the bf16
        offset-rounding floor (~3e-3 worst, ~7e-4 median), and fp16 stays
        under 1e-4.  Pinned here."""
        import jax.numpy as jnp
        import numpy as np

        from gaussianvi_tpu.factors.moments import gh_moments

        nodes, weights, mu, cov, params, range_cost = self._setup()
        full = gh_moments(nodes, weights, mu, cov, range_cost, params)
        bf16 = gh_moments(
            nodes, weights, mu, cov, range_cost, params,
            eval_dtype=jnp.bfloat16,
        )
        rel = self._rel(bf16[0], full[0])
        assert rel.max() < 5e-3
        assert np.median(rel) < 2e-3
        fp16 = gh_moments(
            nodes, weights, mu, cov, range_cost, params,
            eval_dtype=jnp.float16,
        )
        assert self._rel(fp16[0], full[0]).max() < 5e-4

    def test_no_catastrophic_cancellation_far_from_origin(self):
        """The exact failure mode of the absolute-bf16 mode: means far from
        the origin (|mu| >> offsets).  Centered quantization is immune."""
        import jax.numpy as jnp

        from gaussianvi_tpu.factors.moments import gh_moments

        nodes, weights, mu, cov, params, range_cost = self._setup()
        mu_far = mu + 100.0
        full = gh_moments(nodes, weights, mu_far, cov, range_cost, params)
        bf16 = gh_moments(
            nodes, weights, mu_far, cov, range_cost, params,
            eval_dtype=jnp.bfloat16,
        )
        assert self._rel(bf16[0], full[0]).max() < 1e-6

    def test_bf16_optimizer_converges_same_basin(self):
        import numpy as np

        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.inference.optimize import optimize

        graph, init, _ = build_chain_estimation(
            num_states=16, dim_x=2, gh_degree=4, seed=4
        )
        cfg_f = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
        cfg_b = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                          moments_eval_dtype="bfloat16")
        st_f, h_f = optimize(graph, init, cfg_f)
        st_b, h_b = optimize(graph, init, cfg_b)
        cf, cb = float(h_f.cost[-1]), float(h_b.cost[-1])
        assert np.isfinite(np.asarray(st_b.mu)).all()
        # same basin within a few percent of the converged cost
        assert abs(cb - cf) / abs(cf) < 0.1

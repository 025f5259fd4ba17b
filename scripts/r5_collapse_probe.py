"""Dissect the residual separate-path accept-collapses (device gate
test_separate_path_no_accept_collapse_b1024, PERF section 27).

Runs the gate's exact configuration, finds the collapsed problems, and for
each: the iteration where the cost first went negative, the per-factor
nonlinear E[phi] (tot, sum|w phi|) of the ACCEPTED trial at the previous
iterate, the linear costs and 0.5*logdet — to establish WHICH term carries
the garbage (per-factor negative estimates would be caught by the nonneg
guard; a positive-garbage E[phi] against a genuinely negative logdet
needs a different fix).

    python scripts/r5_collapse_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    float(jnp.sum(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128))))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    graph_b, state_b = build_batch(1024, 32, 2, 4)
    cfg = GVIConfig(
        niters=10, niters_lowtemp=10, step_size_base=0.9,
        chain_impl="lanes", fused_trials="off", fused_gradient="off",
        linesearch="batched",
    )
    def _slim(g, s):
        # returning the full history OOMs the 16M scoped-vmem stack at
        # this width; keep only what the analysis needs
        st, hist = optimize(g, s, cfg, method="ngd")
        return st.mu, st.precision.diag, st.precision.off, hist.cost

    run = jax.jit(jax.vmap(_slim))
    mu_f, pd_f, po_f, cost_f = run(graph_b, state_b)
    costs = np.asarray(cost_f)                         # [B, 20]
    final = costs[:, -1]
    bad = np.where(final < 0)[0]
    print(f"collapapsed: {len(bad)}/1024 -> {bad.tolist()}", flush=True)
    if not len(bad):
        return

    # components at the FINAL state of each collapsed problem, f32 device
    # vs f64 host
    from gaussianvi_tpu.inference.gvi import factor_costs
    from gaussianvi_tpu.ops.blocktridiag import gbp_covariance_logdet
    from gaussianvi_tpu.factors import moments as mm
    from gaussianvi_tpu.inference.graph import gather_marginals

    for i in bad[:4]:
        i = int(i)
        g1 = jax.tree.map(lambda x: x[i], graph_b)
        mu = np.asarray(mu_f[i])
        pd = np.asarray(pd_f[i])
        po = np.asarray(po_f[i])
        it_neg = int(np.argmax(costs[i] < 0))
        print(f"\nproblem {i}: first negative at iter {it_neg}; "
              f"cost trail {costs[i][max(0, it_neg-2):it_neg+2]}", flush=True)

        for tag, dt in (("f32", np.float32), ("f64", np.float64)):
            with jax.enable_x64(dt == np.float64):
                g_t = jax.tree.map(
                    lambda x: jnp.asarray(np.asarray(x, dt))
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                    else jnp.asarray(x), g1
                )
                mu_t = jnp.asarray(mu.astype(dt))
                from gaussianvi_tpu.ops.blocktridiag import BlockTridiag

                prec = BlockTridiag(jnp.asarray(pd.astype(dt)),
                                    jnp.asarray(po.astype(dt)))
                cd, co, ld = gbp_covariance_logdet(prec)
                fb = g_t.nonlinear[0]
                mu_k, cov_k = gather_marginals(
                    fb.start, fb.nb, mu_t, cd, co, fb.slice_offset
                )
                diff = mm._sigma_diffs(fb.nodes, cov_k)
                phi = mm.eval_phi(
                    fb.cost_fn, diff + mu_k[:, None, :], fb.params
                )
                wphi = phi * fb.weights[None, :]
                tot = np.asarray(jnp.sum(wphi, axis=-1))
                absum = np.asarray(jnp.sum(jnp.abs(wphi), axis=-1))
                fc = factor_costs(g_t, mu_t, cd, co, jnp.asarray(1.0, dt))
                print(
                    f"  [{tag}] total fc {float(jnp.sum(fc)):.4g}  "
                    f"0.5ld {0.5 * float(ld):.4g}  "
                    f"nl sum {tot.sum():.4g}  "
                    f"worst tot {tot.min():.4g}  "
                    f"max absum {absum.max():.4g}  "
                    f"min |tot|/absum "
                    f"{(np.abs(tot) / np.maximum(absum, 1e-30)).min():.3g}",
                    flush=True,
                )


if __name__ == "__main__":
    main()

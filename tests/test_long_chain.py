"""Long-chain stress: N=256 exercises the assoc (log-depth) path via the
auto threshold and checks numerical health at scale."""

import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig, optimize
from gaussianvi_tpu.ops.blocktridiag import gbp_covariance_logdet
from gaussianvi_tpu.ops.parallel_chain import gbp_covariance_logdet_assoc
from tests.test_blocktridiag import random_spd_btd


class TestLongChain:
    def test_assoc_matches_seq_at_scale(self):
        A = random_spd_btd(256, 4, seed=0)
        cd0, co0, ld0 = gbp_covariance_logdet(A)
        cd1, co1, ld1 = gbp_covariance_logdet_assoc(A)
        np.testing.assert_allclose(cd1, cd0, atol=1e-10)
        np.testing.assert_allclose(ld1, ld0, rtol=1e-12)

    def test_optimize_long_chain(self):
        graph, init, _ = build_chain_estimation(
            num_states=256, dim_x=1, gh_degree=3
        )
        config = GVIConfig(niters=3, niters_lowtemp=3, step_size_base=0.9)
        # auto threshold (128) -> assoc path
        assert config.chain_impl == "auto"
        final, hist = optimize(graph, init, config, method="ngd")
        cost = np.asarray(hist.cost)
        assert np.isfinite(cost).all()
        assert cost[-1] < cost[0]
        assert bool(jnp.isfinite(final.mu).all())

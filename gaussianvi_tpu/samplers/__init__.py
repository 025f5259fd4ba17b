from .hmc import HMCResult, hmc, run_chains
from .nuts import NUTSResult, nuts, nuts_chains
from .smc import SMCResult, smc_adaptive
from .target import make_log_density, neg_log_prob
from .diagnostics import ess, rank_normalized_rhat, split_rhat, summarize
from .validate import validate_posterior

__all__ = [
    "hmc", "run_chains", "HMCResult",
    "nuts", "nuts_chains", "NUTSResult",
    "smc_adaptive", "SMCResult",
    "neg_log_prob", "make_log_density",
    "validate_posterior",
    "ess", "rank_normalized_rhat", "split_rhat", "summarize",
]

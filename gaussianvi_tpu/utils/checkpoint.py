"""Checkpoint / resume of an optimization run.

The reference has no mid-run checkpointing (SURVEY.md section 5.4 — only
end-of-run CSVs and cereal-serialized quadrature tables).  Here a run can be
snapshotted and resumed exactly: the checkpoint holds the COMPLETE loop
state — (mu, precision blocks, iteration counter, temperature, is_lowtemp,
converged) — via orbax when available, with an ``npz`` fallback so the
capability never depends on the optional dep.  The carried chain/quadrature
fields (covariance, logdet, factor expectations) are deterministic functions
of (mu, Lambda) and are recomputed on resume by
:func:`..inference.optimize.make_gvi_init`, which reproduces the
uninterrupted carry exactly; resuming through
:func:`..inference.optimize.optimize_from` therefore matches the
uninterrupted trajectory even across a temperature escalation or a
convergence freeze (tests/test_resume.py).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..inference.graph import GaussianState
from ..inference.optimize import LoopState
from ..ops.blocktridiag import BlockTridiag


def save_checkpoint(
    path: str,
    state: GaussianState,
    iteration: int = 0,
    temperature: float = 1.0,
    is_lowtemp: bool = True,
    converged: bool = False,
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        mu=np.asarray(state.mu),
        prec_diag=np.asarray(state.precision.diag),
        prec_off=np.asarray(state.precision.off),
        iteration=np.asarray(iteration),
        temperature=np.asarray(temperature),
        is_lowtemp=np.asarray(is_lowtemp),
        converged=np.asarray(converged),
    )
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, dtype=None):
    """Returns ``(state, iteration, temperature, is_lowtemp)`` —
    the original 4-tuple for compatibility; use :func:`load_loop_state`
    for the full resume payload including the converged flag."""
    state, it, loop = load_loop_state(path, dtype)
    return state, it, float(loop.temperature), bool(loop.is_lowtemp)


def load_loop_state(
    path: str, dtype=None
) -> tuple[GaussianState, int, LoopState]:
    """Full resume payload: ``(state, iteration, LoopState)`` — feed the
    latter two to ``optimize_from(..., start_iteration=it,
    loop_state=loop)``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        mu = jnp.asarray(data["mu"], dtype)
        state = GaussianState(
            mu,
            BlockTridiag(
                jnp.asarray(data["prec_diag"], dtype),
                jnp.asarray(data["prec_off"], dtype),
            ),
        )
        # checkpoints from before the full-state format lack `converged`
        conv = bool(data["converged"]) if "converged" in data else False
        loop = LoopState(
            jnp.asarray(float(data["temperature"]), mu.dtype),
            jnp.asarray(bool(data["is_lowtemp"])),
            jnp.asarray(conv),
        )
        return state, int(data["iteration"]), loop


def save_checkpoint_orbax(path: str, state: GaussianState, **meta) -> str:
    """Orbax-backed variant (async-capable, multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "mu": state.mu,
        "prec_diag": state.precision.diag,
        "prec_off": state.precision.off,
        "meta": {k: jnp.asarray(v) for k, v in meta.items()},
    }
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    state = GaussianState(
        jnp.asarray(payload["mu"]),
        BlockTridiag(
            jnp.asarray(payload["prec_diag"]), jnp.asarray(payload["prec_off"])
        ),
    )
    return state, {k: np.asarray(v) for k, v in payload.get("meta", {}).items()}

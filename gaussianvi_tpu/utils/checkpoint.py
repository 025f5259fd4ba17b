"""Checkpoint / resume of an optimization run.

The reference has no mid-run checkpointing (SURVEY.md section 5.4 — only
end-of-run CSVs and cereal-serialized quadrature tables).  Here a run can be
snapshotted and resumed exactly: the checkpoint holds (mu, precision blocks,
iteration counter, temperature state) via orbax when available, with an
``npz`` fallback so the capability never depends on the optional dep.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..inference.graph import GaussianState
from ..ops.blocktridiag import BlockTridiag


def save_checkpoint(
    path: str,
    state: GaussianState,
    iteration: int = 0,
    temperature: float = 1.0,
    is_lowtemp: bool = True,
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
    )
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, dtype=None):
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
        return (
            state,
            int(data["iteration"]),
            float(data["temperature"]),
            bool(data["is_lowtemp"]),
        )


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

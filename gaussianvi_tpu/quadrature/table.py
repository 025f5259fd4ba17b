"""Quadrature-table build/save/load.

The reference tabulates (dim, degree) -> (zero-mean nodes, weights) offline
through a MATLAB-compiled ``nwspgr`` and cereal-serializes the map
(quadrature/saveSparseGHWeightMap.h:15-52, generateSpGHWeights.h:23-84); every
runtime consumer only loads it (quadrature/SparseGaussHermite.h:94-114).

Here the table is generated natively (NumPy Smolyak in :mod:`.smolyak`, or the
C++ generator in ``csrc/spgh.cpp`` — same algorithm, cross-validated in
tests) and cached as an ``.npz``.  At runtime a rule is a pair of static-shape
arrays handed to jitted code once; sigma-point placement happens on device.
"""

from __future__ import annotations

import os

import numpy as np

from .gauss_hermite import gh_tensor_grid
from .smolyak import MAX_DEGREE_SCHEDULE, sparse_gh

_DEFAULT_TABLE = os.path.join(
    os.path.dirname(__file__), "data", "sparse_gh_table.npz"
)

# lazily-opened view of the committed artifact; None until first use,
# False if the file is absent (then rules are generated on the fly)
_TABLE_FILE = None


def _table_lookup(dim: int, degree: int):
    """(nodes, weights) from the committed artifact, or None.

    The npz is kept open and entries are decompressed per key on demand —
    a cold-process rule fetch touches only the requested arrays, not the
    whole 9 MB table (the reference equivalently cereal-loads its
    pretabulated map once, quadrature/SparseGaussHermite.h:94-114).
    """
    global _TABLE_FILE
    if _TABLE_FILE is None:
        try:
            _TABLE_FILE = np.load(_DEFAULT_TABLE)
        except OSError:
            _TABLE_FILE = False
    if _TABLE_FILE is False:
        return None
    key = f"nodes_{dim}_{degree}"
    if key not in _TABLE_FILE.files:
        return None
    return _TABLE_FILE[key], _TABLE_FILE[f"weights_{dim}_{degree}"]


def get_rule(dim: int, degree: int, kind: str = "sparse") -> tuple[np.ndarray, np.ndarray]:
    """Return ``(nodes [M, dim], weights [M])`` for N(0, I_dim).

    ``kind='sparse'`` gives the Smolyak rule (exact to total order 2*degree-1);
    ``kind='full'`` the degree**dim tensor grid.  Sparse rules covered by the
    committed table artifact are read from it; anything else is generated.
    """
    if kind == "sparse":
        hit = _table_lookup(dim, degree)
        if hit is not None:
            return hit
        return sparse_gh(dim, degree)
    if kind == "full":
        return gh_tensor_grid(degree, dim)
    raise ValueError(f"unknown quadrature kind {kind!r}")


def build_table(schedule: dict[int, int] | None = None) -> dict[str, np.ndarray]:
    """Generate the full (dim, degree) table per the reference schedule."""
    schedule = schedule or MAX_DEGREE_SCHEDULE
    table: dict[str, np.ndarray] = {}
    for dim, max_deg in schedule.items():
        for deg in range(1, max_deg + 1):
            nodes, weights = sparse_gh(dim, deg)
            table[f"nodes_{dim}_{deg}"] = nodes
            table[f"weights_{dim}_{deg}"] = weights
    return table


def save_table(path: str = _DEFAULT_TABLE, schedule: dict[int, int] | None = None) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **build_table(schedule))
    return path


def verify_table(
    path: str = _DEFAULT_TABLE,
    sample: list[tuple[int, int]] | None = None,
    atol: float = 1e-12,
) -> None:
    """Staleness check: regenerate a sample of entries and compare against
    the saved artifact; raises AssertionError on drift (the generator and
    the committed table must never disagree)."""
    sample = sample or [(1, 10), (2, 6), (5, 2), (6, 3), (10, 3), (20, 2)]
    with np.load(path) as data:
        for dim, deg in sample:
            nodes, weights = sparse_gh(dim, deg)
            saved_n = data[f"nodes_{dim}_{deg}"]
            saved_w = data[f"weights_{dim}_{deg}"]
            if saved_n.shape != nodes.shape or not (
                np.allclose(saved_n, nodes, atol=atol)
                and np.allclose(saved_w, weights, atol=atol)
            ):
                raise AssertionError(
                    f"table entry (dim={dim}, deg={deg}) is stale — "
                    f"rebuild with save_table()"
                )


def load_table(path: str = _DEFAULT_TABLE) -> dict[tuple[int, int], tuple[np.ndarray, np.ndarray]]:
    """Load a saved table as a {(dim, degree): (nodes, weights)} dict."""
    with np.load(path) as data:
        out: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for key in data.files:
            if not key.startswith("nodes_"):
                continue
            _, dim, deg = key.split("_")
            out[(int(dim), int(deg))] = (
                data[key], data[f"weights_{dim}_{deg}"]
            )
    return out

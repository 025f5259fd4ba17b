"""SDF map IO + occupancy->SDF generation (helpers/CudaOperation.h:255-300
save/load parity) and the 3-D point-robot planning example
(CudaOperation_3dpR, CudaOperation.h:612-680)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussianvi_tpu.factors.sdf import PlanarSDF, SDF3D
from gaussianvi_tpu.factors.sdf_io import (
    _edt,
    _edt_numpy,
    load_sdf,
    save_sdf,
    sdf_from_occupancy,
)


def _brute_edt(mask):
    """O(n^2) exact Euclidean distance to the nearest True cell."""
    pts = np.argwhere(mask)
    out = np.zeros(mask.shape)
    for idx in np.ndindex(mask.shape):
        out[idx] = np.sqrt(((pts - np.asarray(idx)) ** 2).sum(-1).min())
    return out


class TestEDT:
    def test_numpy_edt_matches_brute_force_2d(self):
        rng = np.random.default_rng(0)
        mask = rng.random((13, 17)) < 0.15
        mask[0, 0] = True  # ensure non-empty
        np.testing.assert_allclose(_edt_numpy(mask), _brute_edt(mask), atol=1e-9)

    def test_numpy_edt_matches_brute_force_3d(self):
        rng = np.random.default_rng(1)
        mask = rng.random((6, 7, 8)) < 0.1
        mask[2, 3, 4] = True
        np.testing.assert_allclose(_edt_numpy(mask), _brute_edt(mask), atol=1e-9)

    def test_scipy_and_numpy_paths_agree(self):
        pytest.importorskip("scipy")
        rng = np.random.default_rng(2)
        mask = rng.random((20, 20)) < 0.2
        mask[5, 5] = True
        np.testing.assert_allclose(
            _edt(mask, use_scipy=True), _edt(mask, use_scipy=False), atol=1e-9
        )

    def test_empty_mask(self):
        assert (_edt(np.zeros((4, 4), bool)) == 0).all()


class TestOccupancyToSDF:
    def test_signs_and_scale_2d(self):
        occ = np.zeros((11, 11), bool)
        occ[4:7, 4:7] = True
        sdf = sdf_from_occupancy(occ, cell_size=0.5)
        assert isinstance(sdf, PlanarSDF)
        d = np.asarray(sdf.data)
        assert d[5, 5] < 0          # deep inside the obstacle
        assert d[0, 0] > 0          # far outside
        # center of a 3x3 block: nearest free cell is 2 cells away
        np.testing.assert_allclose(d[5, 5], -2 * 0.5)
        # the cell just outside the block face: 1 cell from the obstacle...
        np.testing.assert_allclose(d[5, 3], 1 * 0.5)

    def test_3d_kind(self):
        occ = np.zeros((5, 5, 5), bool)
        occ[2, 2, 2] = True
        sdf = sdf_from_occupancy(occ, cell_size=1.0)
        assert isinstance(sdf, SDF3D)
        d = np.asarray(sdf.data)
        np.testing.assert_allclose(d[2, 2, 3], 1.0)
        np.testing.assert_allclose(d[2, 2, 2], -1.0)

    def test_bad_ndim(self):
        with pytest.raises(ValueError, match="2-D or 3-D"):
            sdf_from_occupancy(np.zeros(4, bool), 1.0)


class TestSDFRoundTrip:
    def test_planar_roundtrip(self, tmp_path):
        occ = np.zeros((9, 13), bool)
        occ[3:5, 6:9] = True
        sdf = sdf_from_occupancy(occ, 0.25, origin=(1.0, -2.0))
        path = tmp_path / "field.npz"
        save_sdf(path, sdf)
        back = load_sdf(path)
        assert isinstance(back, PlanarSDF)
        np.testing.assert_array_equal(np.asarray(back.data), np.asarray(sdf.data))
        np.testing.assert_array_equal(
            np.asarray(back.origin), np.asarray(sdf.origin)
        )
        np.testing.assert_array_equal(
            np.asarray(back.cell_size), np.asarray(sdf.cell_size)
        )

    def test_3d_roundtrip_and_interp(self, tmp_path):
        occ = np.zeros((6, 6, 6), bool)
        occ[2:4, 2:4, 2:4] = True
        sdf = sdf_from_occupancy(occ, 1.0)
        path = tmp_path / "f3.npz"
        save_sdf(path, sdf)
        back = load_sdf(path)
        assert isinstance(back, SDF3D)
        pts = jnp.asarray([[0.5, 0.5, 0.5], [2.5, 2.5, 2.5]])
        np.testing.assert_allclose(
            np.asarray(back.signed_distance(pts)),
            np.asarray(sdf.signed_distance(pts)),
        )


class TestPoint3DPlanning:
    def test_example_end_to_end(self, tmp_path):
        from gaussianvi_tpu.examples.point3d_planning import (
            build_point3d_planning,
        )
        from gaussianvi_tpu.inference import optimize
        from gaussianvi_tpu.inference.validate import validate_graph

        graph, init, config, sdf = build_point3d_planning(
            num_states=15, map_file=tmp_path / "map.npz"
        )
        validate_graph(graph, init)
        final, hist = optimize(graph, init, config, method="ngd")
        cost = np.asarray(hist.cost)
        assert np.all(np.isfinite(cost))
        assert cost[-1] < cost[0]
        # straight-line init passes through the box; the solution must not
        mu = np.asarray(final.mu)
        sd = np.asarray(sdf.signed_distance(jnp.asarray(mu[:, :3])))
        init_sd = np.asarray(
            sdf.signed_distance(jnp.asarray(np.asarray(init.mu)[:, :3]))
        )
        assert init_sd.min() < 0  # the init really collides
        assert sd.min() > 0.0     # the plan clears the obstacle
        # endpoints anchored
        np.testing.assert_allclose(mu[0, :3], [1.0, 1.0, 4.5], atol=0.2)
        np.testing.assert_allclose(mu[-1, :3], [8.5, 8.5, 4.5], atol=0.2)

"""External (FRE-NCtools supergrid) grid ingestion tests: write our own
gnomonic supergrid as six FRE-style tile files, load them back through
MetricTerms.from_external, and require equivalence with the generated grid
(the reference's external-vs-generated equivalence test,
tests/mpi_54rank/test_ext_grid/test_external_grid.py:24-60)."""

import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.gnomonic import chart_to_sphere
from pace_tpu.utils import netcdf3


def _write_fre_tiles(tmp_path, n):
    """Six supergrid tile files with x/y in degrees, shape (2n+1, 2n+1)."""
    pattern = str(tmp_path / "grid.tile{tile}.nc")
    coords = np.arange(2 * n + 1) / 2.0  # chart cell units 0..n step 0.5
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    for t in range(6):
        xyz = chart_to_sphere(t, gy, gx, n)
        lon = np.rad2deg(np.arctan2(xyz[..., 1], xyz[..., 0])) % 360.0
        lat = np.rad2deg(np.arcsin(np.clip(xyz[..., 2], -1, 1)))
        f = netcdf3.NetCDF3File(
            dims={"nyp": 2 * n + 1, "nxp": 2 * n + 1},
            variables={
                "x": netcdf3.Variable(("nyp", "nxp"), lon, {"units": "degrees"}),
                "y": netcdf3.Variable(("nyp", "nxp"), lat, {"units": "degrees"}),
            },
            attrs={},
        )
        netcdf3.write(pattern.format(tile=t + 1), f)
    return pattern


@pytest.mark.parametrize("layout", [(1, 1), (2, 2)])
def test_external_matches_generated(tmp_path, layout):
    n = 12
    pattern = _write_fre_tiles(tmp_path, n)
    spec = GridSpec(n_tile=n, npz=4, layout=layout)
    gen = MetricTerms.generate(spec)
    ext = MetricTerms.from_external(pattern, spec)
    for name in ("area", "dx", "dy", "dxc", "dyc", "lat_agrid", "lon_agrid"):
        a = np.asarray(getattr(gen, name))
        b = np.asarray(getattr(ext, name))
        # positions round-trip through degrees; most fields agree to ~1e-14
        # rel, area has isolated ~3e-8 rel outliers where a degenerate corner
        # cell flips across the sanitize threshold
        assert np.allclose(a, b, rtol=1e-6, atol=1e-6), name


def test_external_shape_mismatch_raises(tmp_path):
    pattern = _write_fre_tiles(tmp_path, 6)
    spec = GridSpec(n_tile=12, npz=4, layout=(1, 1))
    with pytest.raises(ValueError, match="supergrid shape"):
        MetricTerms.from_external(pattern, spec)


def test_driver_grid_config_external(tmp_path):
    from pace_tpu.driver.grid import GeneratedGridConfig, GridConfig

    n = 12
    pattern = _write_fre_tiles(tmp_path, n)
    cfg = GridConfig(
        type="external", config=GeneratedGridConfig(tile_paths=pattern)
    )
    mt = cfg.get_metric_terms(n, 4, (1, 1))
    assert np.isfinite(np.asarray(mt.area)).all()

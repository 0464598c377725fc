import numpy as np
import pytest

from pace_tpu.constants import PI, RADIUS, OMEGA
from pace_tpu.grid import GridSpec, MetricTerms, analytic_hybrid
from pace_tpu.grid import eta as _eta_unused  # noqa: F401

H = 3


@pytest.fixture(scope="module")
def mt12():
    return MetricTerms.generate(GridSpec(n_tile=12, npz=10, layout=(1, 1)))


def interiors(arr, extra_y=0, extra_x=0):
    return arr[:, H:arr.shape[1] - H, H:arr.shape[2] - H]


def test_total_area_is_sphere(mt12):
    total = interiors(mt12.area).sum()
    np.testing.assert_allclose(total, 4 * PI * RADIUS**2, rtol=1e-9)


def test_dual_area_covers_sphere(mt12):
    """Sum of area_c over each tile's owned corners covers the sphere.

    Ownership convention for the sum: count interior corners once, tile-edge
    corners 1/2 (shared by 2 tiles), cube corners 1/3.
    """
    n = 12
    w = np.ones((n + 1, n + 1))
    w[0, :] = w[-1, :] = 0.5
    w[:, 0] = w[:, -1] = 0.5
    for jc in (0, -1):
        for ic in (0, -1):
            w[jc, ic] = 1.0 / 3.0
    total = 0.0
    for t in range(6):
        total += (mt12.area_c[t, H:H + n + 1, H:H + n + 1] * w).sum()
    np.testing.assert_allclose(total, 4 * PI * RADIUS**2, rtol=1e-9)


def test_lengths_positive_and_sane(mt12):
    n = 12
    typical = 2 * PI * RADIUS / (4 * n)  # quarter-circumference / n
    for name in ("dx", "dy", "dxa", "dya", "dxc", "dyc"):
        arr = getattr(mt12, name)
        assert (arr > 0).all(), name
        interior = arr[:, H:-H, H:-H]
        assert interior.min() > 0.3 * typical, name
        assert interior.max() < 2.0 * typical, name


def test_halo_metric_values_match_neighbor_interior(mt12):
    """Ghost dx values must equal the neighbor tile's own edge lengths.

    Tile 0's east halo columns, away from corners, physically lie on tile 1;
    with no rotation across that edge (adjacency 0E-1W), ghost dx columns of
    tile 0 equal tile 1's west interior dx columns.
    """
    n = 12
    ghost = mt12.dx[0, H:H + n + 1, H + n:H + n + 3]
    src = mt12.dx[1, H:H + n + 1, H:H + 3]
    np.testing.assert_allclose(ghost, src, rtol=1e-12)


def test_angles_range(mt12):
    # equiangular gnomonic: |cosa| up to 0.5 exactly at cube corners
    assert np.abs(interiors(mt12.cosa_s)).max() < 0.55
    # interior angles stay >= 60 degrees (sin >= 0.866 at cube corners);
    # folded corner-ghost zones are geometrically degenerate and excluded
    assert (mt12.sin_sg[:, :, H:-H, H:-H] > 0.86).all()
    assert (np.abs(mt12.cos_sg) <= 1.0).all()
    # at cube corners the grid angle is 120 degrees: cos = -0.5 (sign depends
    # on orientation of the two axes) at the 8 corner points
    corner_cosa = [mt12.cosa[0, H, H], mt12.cosa[0, H + 12, H + 12]]
    for cc in corner_cosa:
        np.testing.assert_allclose(abs(cc), 0.5, atol=0.02)


def test_basis_vectors_unit_and_tangent(mt12):
    for e in (mt12.ec1, mt12.ec2):
        np.testing.assert_allclose(
            np.linalg.norm(e, axis=-1), 1.0, atol=1e-12
        )
    # tangent to the sphere: orthogonal to position
    dots = np.sum(mt12.ec1 * mt12.xyz_center, axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-10)


def test_coriolis(mt12):
    assert np.abs(mt12.f0).max() <= 2 * OMEGA + 1e-12
    # polar tile center should be near max
    assert np.abs(mt12.f0[2]).max() > 1.9 * OMEGA


def test_decomposition_independence():
    mt1 = MetricTerms.generate(GridSpec(n_tile=12, npz=5, layout=(1, 1)))
    mt2 = MetricTerms.generate(GridSpec(n_tile=12, npz=5, layout=(2, 2)))
    ns = 6
    for t in range(6):
        for py in range(2):
            for px in range(2):
                s = (t * 2 + py) * 2 + px
                np.testing.assert_allclose(
                    mt2.area[s, H:-H, H:-H],
                    mt1.area[t, H + py * ns:H + (py + 1) * ns, H + px * ns:H + (px + 1) * ns],
                    rtol=1e-12,
                )
                np.testing.assert_allclose(
                    mt2.lat_agrid[s, H:-H, H:-H],
                    mt1.lat_agrid[t, H + py * ns:H + (py + 1) * ns, H + px * ns:H + (px + 1) * ns],
                    rtol=0,
                    atol=1e-12,
                )


def test_schmidt_stretch_concentrates_resolution():
    spec = GridSpec(
        n_tile=12,
        npz=5,
        layout=(1, 1),
        stretch_factor=3.0,
        lon_target=180.0,
        lat_target=-35.0,
    )
    mt = MetricTerms.generate(spec)
    base = MetricTerms.generate(GridSpec(n_tile=12, npz=5, layout=(1, 1)))
    # total area preserved
    np.testing.assert_allclose(
        interiors(mt.area).sum(), 4 * PI * RADIUS**2, rtol=1e-9
    )
    # minimum cell much smaller than unstretched minimum
    assert interiors(mt.area).min() < 0.25 * interiors(base.area).min()
    # smallest cells are near the target point
    s_min, j_min, i_min = np.unravel_index(
        np.argmin(interiors(mt.area)), interiors(mt.area).shape
    )
    lat_min = mt.lat_agrid[s_min, H + j_min, H + i_min]
    lon_min = mt.lon_agrid[s_min, H + j_min, H + i_min]
    assert abs(np.rad2deg(lat_min) - (-35.0)) < 15.0
    assert abs(((np.rad2deg(lon_min) - 180.0 + 180) % 360) - 180) < 15.0


def test_doubly_periodic_grid():
    spec = GridSpec(
        n_tile=16, npz=5, layout=(1, 1), grid_type=4, dx_const=500.0,
        dy_const=600.0, deglat=42.0,
    )
    mt = MetricTerms.generate(spec)
    assert (mt.area == 500.0 * 600.0).all()
    assert (mt.sina == 1.0).all()
    np.testing.assert_allclose(mt.f0, 2 * OMEGA * np.sin(np.deg2rad(42.0)))


def test_analytic_eta_monotone():
    for npz in (10, 63, 79, 91):
        c = analytic_hybrid(npz)
        assert c.npz == npz
        for ps in (50000.0, 101325.0):
            pe = c.pressure_interfaces(np.array(ps))
            assert (np.diff(pe, axis=0) > 0).all()
        assert c.bk[0] == 0.0 and c.bk[-1] == 1.0
        assert c.ak[0] > 0


def test_eta_from_reference_restart_file():
    import os

    path = "/root/reference/tests/main/data/c12_restart/fv_core.res.nc"
    if not os.path.exists(path):
        pytest.skip("reference data not available")
    from pace_tpu.grid.eta import from_file

    c = from_file(path)
    assert c.npz == 63
    c.validate()

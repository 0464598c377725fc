import numpy as np
import pytest

from pace_tpu.parallel import topology as topo


@pytest.fixture(scope="module")
def cube():
    return topo.cubed_sphere_topology()


def test_adjacency_complete_and_symmetric(cube):
    assert cube.n_tiles == 6
    assert len(cube.adjacency) == 24
    for (t, e), rel in cube.adjacency.items():
        back = cube.adjacency[(rel.neighbor_tile, rel.neighbor_edge)]
        assert back.neighbor_tile == t
        assert back.neighbor_edge == e
        assert back.flip == rel.flip


def test_each_edge_shared_by_two_tiles(cube):
    # 24 directed relations = 12 undirected cube edges
    pairs = set()
    for (t, e), rel in cube.adjacency.items():
        pairs.add(frozenset([(t, e), (rel.neighbor_tile, rel.neighbor_edge)]))
    assert len(pairs) == 12


def test_affine_maps_preserve_3d_edge_points(cube):
    """Points on a shared edge map to the identical 3D cube-surface location."""
    n = 12
    for (t, e), rel in cube.adjacency.items():
        A, b = cube.edge_affine(t, e, n)
        # parameterize points along the edge in cell units
        s = np.linspace(0.0, n, 7)
        if e in (topo.EDGE_W, topo.EDGE_E):
            x = np.full_like(s, 0.0 if e == topo.EDGE_W else float(n))
            y = s
        else:
            y = np.full_like(s, 0.0 if e == topo.EDGE_S else float(n))
            x = s
        y2 = A[0, 0] * y + A[0, 1] * x + b[0]
        x2 = A[1, 0] * y + A[1, 1] * x + b[1]
        p1 = topo.cube_surface_point(t, y, x, n=n)
        p2 = topo.cube_surface_point(rel.neighbor_tile, y2, x2, n=n)
        np.testing.assert_allclose(p1, p2, atol=1e-12)


def test_resolve_interior_points_unchanged(cube):
    n = 12
    y = np.array([0.5, 3.5, 11.5, 0.0, 12.0])
    x = np.array([0.5, 7.5, 11.5, 5.0, 12.0])
    t = np.zeros(5, dtype=int)
    t2, y2, x2, A, valid = cube.resolve_points(t, y, x, n)
    assert valid.all()
    np.testing.assert_array_equal(t2, t)
    np.testing.assert_allclose(y2, y)
    np.testing.assert_allclose(x2, x)
    np.testing.assert_allclose(A, np.broadcast_to(np.eye(2), (5, 2, 2)))


def test_resolve_ghost_points_land_inside(cube):
    """All ghost points up to depth 3 resolve to valid in-domain points."""
    n = 12
    h = 3
    coords = np.arange(-h, n + h) + 0.5
    jj, ii = np.meshgrid(coords, coords, indexing="ij")
    for t in range(6):
        for fold in ("x", "y"):
            t2, y2, x2, A, valid = cube.resolve_points(
                np.full(jj.shape, t), jj, ii, n, corner_fold=fold
            )
            assert valid.all()
            # all resolved points are proper cell centers
            assert np.allclose(y2 - np.floor(y2), 0.5)
            assert np.allclose(x2 - np.floor(x2), 0.5)
            # rotations are exact signed permutations
            det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
            np.testing.assert_allclose(det, 1.0)


def test_resolve_edge_ghosts_are_physical_neighbors(cube):
    """Depth-1 ghost cells across an edge resolve to the 3D-nearest foreign cell.

    Non-circular validation: the resolved source cell's 3D position must be the
    closest cell center (on any other tile) to the shared-edge segment location,
    at roughly half-cell distance.
    """
    n = 6
    # all cell centers on all tiles, on the cube surface
    c = np.arange(n) + 0.5
    yy, xx = np.meshgrid(c, c, indexing="ij")
    centers = np.array(
        [topo.cube_surface_point(t, yy, xx, n=n) for t in range(6)]
    )  # (6, n, n, 3)
    for t in range(6):
        # ghost row just east of tile t: (y=j+0.5, x=n+0.5)
        y = c.copy()
        x = np.full_like(y, n + 0.5)
        t2, y2, x2, _A, valid = cube.resolve_points(np.full(n, t), y, x, n)
        assert valid.all()
        for k in range(n):
            src_pos = topo.cube_surface_point(int(t2[k]), y2[k], x2[k], n=n)
            # edge segment location in 3D on tile t
            edge_pt = topo.cube_surface_point(t, y[k], float(n), n=n)
            # nearest foreign cell center to this edge point
            d = np.linalg.norm(centers - edge_pt, axis=-1)
            d[t] = np.inf  # exclude own tile
            best = np.unravel_index(np.argmin(d), d.shape)
            best_pos = centers[best]
            np.testing.assert_allclose(src_pos, best_pos, atol=1e-12)


def test_doubly_periodic_resolution():
    per = topo.doubly_periodic_topology()
    n = 8
    t = np.zeros(4, dtype=int)
    y = np.array([-0.5, 8.5, 3.5, -1.5])
    x = np.array([3.5, 3.5, -0.5, -2.5])
    t2, y2, x2, A, valid = per.resolve_points(t, y, x, n)
    assert valid.all()
    np.testing.assert_allclose(y2, [7.5, 0.5, 3.5, 6.5])
    np.testing.assert_allclose(x2, [3.5, 3.5, 7.5, 5.5])
    np.testing.assert_allclose(A, np.broadcast_to(np.eye(2), (4, 2, 2)))

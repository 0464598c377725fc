import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.parallel import (
    CubedSpherePartitioner,
    HaloExchanger,
    TilePartitioner,
    cube_surface_point,
    cubed_sphere_topology,
    doubly_periodic_topology,
)

H = 3


def make_exchanger(n_tile=12, layout=(1, 1), topo=None):
    topo = topo or cubed_sphere_topology()
    part = CubedSpherePartitioner(TilePartitioner(layout))
    return HaloExchanger(topo, part, n_tile, n_halo=H)


def smooth_field(pos):
    """Smooth scalar function of 3D cube-surface position."""
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    return np.sin(1.3 * x) + 0.7 * np.cos(2.1 * y) * z + 0.3 * x * y


def fill_tile_centers(ex, n):
    """(S, Y, X) array with interiors = smooth field at cell centers."""
    topo = ex.topology
    ly, lx = ex.partitioner.layout
    ny, nx = ex.shard_shape("center")
    q = np.zeros((ex.n_shards, ny, nx))
    c = np.arange(n) + 0.5
    yy, xx = np.meshgrid(c, c, indexing="ij")
    for s in range(ex.n_shards):
        t, py, px = ex._shard_info(s)
        gy = yy[py * ex.nsy:(py + 1) * ex.nsy, px * ex.nsx:(px + 1) * ex.nsx]
        gx = xx[py * ex.nsy:(py + 1) * ex.nsy, px * ex.nsx:(px + 1) * ex.nsx]
        pos = cube_surface_point(t, gy, gx, n=n)
        q[s, H:H + ex.nsy, H:H + ex.nsx] = smooth_field(pos)
    return q


def test_doubly_periodic_scalar_matches_roll():
    """On the periodic single tile, halo exchange must equal wraparound pad."""
    n = 8
    ex = make_exchanger(n_tile=n, topo=doubly_periodic_topology())
    rng = np.random.RandomState(0)
    interior = rng.rand(n, n)
    q = np.zeros((1, n + 2 * H, n + 2 * H))
    q[0, H:-H, H:-H] = interior
    out = np.asarray(ex.update_scalar(jnp.asarray(q)))
    expected = np.pad(interior, H, mode="wrap")
    np.testing.assert_allclose(out[0], expected)


def test_cubed_sphere_scalar_depth1_physical():
    """Depth-1 halo values equal the field at the 3D-nearest foreign cell."""
    n = 12
    ex = make_exchanger(n_tile=n)
    q = fill_tile_centers(ex, n)
    out = np.asarray(ex.update_scalar(jnp.asarray(q)))
    c = np.arange(n) + 0.5
    yy, xx = np.meshgrid(c, c, indexing="ij")
    centers = np.array([cube_surface_point(t, yy, xx, n=n) for t in range(6)])
    values = np.array([smooth_field(centers[t]) for t in range(6)])
    for t in range(6):
        # east edge, depth-1 ghosts (excluding corner rows)
        for j in range(n):
            ghost = out[t, H + j, H + n]  # first ghost column east
            edge_pt = cube_surface_point(t, j + 0.5, float(n), n=n)
            d = np.linalg.norm(centers - edge_pt, axis=-1)
            d[t] = np.inf
            best = np.unravel_index(np.argmin(d), d.shape)
            np.testing.assert_allclose(ghost, values[best], err_msg=f"t={t} j={j}")


def test_scalar_halo_interior_unchanged():
    n = 12
    ex = make_exchanger(n_tile=n)
    q = fill_tile_centers(ex, n)
    out = np.asarray(ex.update_scalar(jnp.asarray(q)))
    np.testing.assert_array_equal(
        out[:, H:-H, H:-H], q[:, H:-H, H:-H]
    )


def test_scalar_halo_with_z_dim():
    n = 12
    ex = make_exchanger(n_tile=n)
    q2d = fill_tile_centers(ex, n)
    nz = 4
    q = np.stack([q2d * (k + 1) for k in range(nz)], axis=1)  # (S, nz, Y, X)
    out = np.asarray(ex.update_scalar(jnp.asarray(q)))
    out0 = np.asarray(ex.update_scalar(jnp.asarray(q2d)))
    for k in range(nz):
        np.testing.assert_allclose(out[:, k], out0 * (k + 1))


def test_decomposition_independence_scalar():
    """(2,2) layout halo-updated field assembled to tile level == (1,1) result."""
    n = 12
    ex1 = make_exchanger(n_tile=n, layout=(1, 1))
    ex2 = make_exchanger(n_tile=n, layout=(2, 2))
    q1 = fill_tile_centers(ex1, n)
    q2 = fill_tile_centers(ex2, n)
    out1 = np.asarray(ex1.update_scalar(jnp.asarray(q1)))
    out2 = np.asarray(ex2.update_scalar(jnp.asarray(q2)))
    # assemble (2,2) interiors and tile-boundary halos to tile level
    ns = n // 2
    for t in range(6):
        tile_full = np.full((n + 2 * H, n + 2 * H), np.nan)
        for py in range(2):
            for px in range(2):
                s = (t * 2 + py) * 2 + px
                # place shard interior
                tile_full[
                    H + py * ns:H + (py + 1) * ns, H + px * ns:H + (px + 1) * ns
                ] = out2[s, H:-H, H:-H]
                # place outer halos where the shard is at the tile boundary
                if py == 0:
                    tile_full[0:H, H + px * ns:H + (px + 1) * ns] = out2[
                        s, 0:H, H:-H
                    ]
                if py == 1:
                    tile_full[-H:, H + px * ns:H + (px + 1) * ns] = out2[
                        s, -H:, H:-H
                    ]
                if px == 0:
                    tile_full[H + py * ns:H + (py + 1) * ns, 0:H] = out2[
                        s, H:-H, 0:H
                    ]
                if px == 1:
                    tile_full[H + py * ns:H + (py + 1) * ns, -H:] = out2[
                        s, H:-H, -H:
                    ]
                # corner halo blocks at the tile corners
                if py == 0 and px == 0:
                    tile_full[0:H, 0:H] = out2[s, 0:H, 0:H]
                if py == 0 and px == 1:
                    tile_full[0:H, -H:] = out2[s, 0:H, -H:]
                if py == 1 and px == 0:
                    tile_full[-H:, 0:H] = out2[s, -H:, 0:H]
                if py == 1 and px == 1:
                    tile_full[-H:, -H:] = out2[s, -H:, -H:]
        np.testing.assert_allclose(tile_full, out1[t], err_msg=f"tile {t}")


def solid_body_components(topo_mod, t, y, x, n, axis, direction):
    """Local wind component of a solid-body rotation V = axis × p̂ at chart
    points, along the normalized local chart direction (∂p/∂x or ∂p/∂y of the
    normalized cube mapping)."""
    eps = 1e-6
    p0 = cube_surface_point(t, y, x, n=n)
    if direction == "x":
        p1 = cube_surface_point(t, y, x + eps, n=n)
    else:
        p1 = cube_surface_point(t, y + eps, x, n=n)

    def norm(p):
        return p / np.linalg.norm(p, axis=-1, keepdims=True)

    e = norm(p1) - norm(p0)
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    v = np.cross(np.broadcast_to(axis, norm(p0).shape), norm(p0))
    return np.sum(v * e, axis=-1)


def test_vector_halo_dgrid_signs():
    """D-grid vector halo: depth-1 ghost values match the source tile's own
    component data with the correct ±/swap (validated via 3D matching of the
    staggered point positions and orientation continuity of the charts)."""
    import pace_tpu.parallel.topology as topo_mod

    n = 12
    ex = make_exchanger(n_tile=n)
    axis = np.array([0.3, -0.5, 0.81])
    # u: x-direction wind at (J, I+0.5); v: y-direction at (J+0.5, I)
    uy, ux = ex.shard_shape("y_interface")
    vy, vx = ex.shard_shape("x_interface")
    u = np.zeros((6, uy, ux))
    v = np.zeros((6, vy, vx))
    for t in range(6):
        Ju, Iu = np.meshgrid(np.arange(n + 1), np.arange(n) + 0.5, indexing="ij")
        u[t, H:H + n + 1, H:H + n] = solid_body_components(
            topo_mod, t, Ju, Iu, n, axis, "x"
        )
        Jv, Iv = np.meshgrid(np.arange(n) + 0.5, np.arange(n + 1), indexing="ij")
        v[t, H:H + n, H:H + n + 1] = solid_body_components(
            topo_mod, t, Jv, Iv, n, axis, "y"
        )
    out_u, out_v = ex.update_vector(jnp.asarray(u), jnp.asarray(v), kind="dgrid")
    out_u, out_v = np.asarray(out_u), np.asarray(out_v)
    # interior unchanged
    np.testing.assert_array_equal(out_u[:, H:H + n + 1, H:H + n], u[:, H:H + n + 1, H:H + n])

    # build global staggered point sets for matching
    all_pts = []  # (tile, comp, J, I, position, value)
    for t in range(6):
        for J in range(n + 1):
            for I in range(n):
                pos = cube_surface_point(t, float(J), I + 0.5, n=n)
                val = u[t, H + J, H + I]
                all_pts.append((t, "u", pos, val))
        for J in range(n):
            for I in range(n + 1):
                pos = cube_surface_point(t, J + 0.5, float(I), n=n)
                val = v[t, H + J, H + I]
                all_pts.append((t, "v", pos, val))
    positions = np.array([p[2] for p in all_pts])
    values = np.array([p[3] for p in all_pts])
    tiles_of = np.array([p[0] for p in all_pts])

    checked = 0
    for t in range(6):
        # depth-1 east ghosts of u (strictly outside, not shared interface)
        for J in range(1, n):  # skip tile-corner-adjacent rows for clarity
            ghost = out_u[t, H + J, H + n]  # u ghost at (J, n+0.5)
            # the physical point: resolve via geometry-free nearest match is
            # ambiguous for the position (ghost coords are chart-specific), so
            # instead check |ghost| equals |some staggered value| at the
            # resolved source and that the sign is orientation-consistent.
            topo = ex.topology
            t2, y2, x2, A, valid = topo.resolve_points(
                np.array([t]), np.array([float(J)]), np.array([n + 0.5]), n
            )
            assert valid[0]
            src_pos = cube_surface_point(int(t2[0]), y2[0], x2[0], n=n)
            d = np.linalg.norm(positions - src_pos, axis=-1)
            best = int(np.argmin(d))
            assert d[best] < 1e-9
            assert tiles_of[best] == t2[0]
            np.testing.assert_allclose(abs(ghost), abs(values[best]), atol=1e-12)
            # orientation consistency: the ghost's x-direction (continued from
            # just inside the edge) must positively project on the source
            # point's own direction times the sign applied.
            e_ghost = _chart_dir(t, float(J) if J > 0 else 0.5, n - 0.5, n, "x")
            comp = all_pts[best][1]
            e_src = _chart_dir(
                int(t2[0]), float(y2[0]), float(x2[0]), n, "x" if comp == "u" else "y"
            )
            sign = 1.0 if ghost * values[best] >= 0 else -1.0
            if abs(values[best]) > 1e-9:
                assert np.dot(e_ghost, sign * e_src) > 0.1, (
                    f"sign inconsistency t={t} J={J}"
                )
            checked += 1
    assert checked > 0


def _chart_dir(t, y, x, n, direction):
    eps = 1e-6
    p0 = cube_surface_point(t, y, x, n=n)
    if direction == "x":
        p1 = cube_surface_point(t, y, x + eps, n=n)
    else:
        p1 = cube_surface_point(t, y + eps, x, n=n)

    def norm(p):
        return p / np.linalg.norm(p)

    e = norm(p1) - norm(p0)
    return e / np.linalg.norm(e)


def test_vector_halo_decomposition_independence():
    n = 12
    axis = np.array([0.1, 0.2, 0.97])
    results = {}
    for layout in [(1, 1), (2, 2)]:
        ex = make_exchanger(n_tile=n, layout=layout)
        ly, lx = layout
        uy, ux = ex.shard_shape("y_interface")
        vy, vx = ex.shard_shape("x_interface")
        u = np.zeros((ex.n_shards, uy, ux))
        v = np.zeros((ex.n_shards, vy, vx))
        import pace_tpu.parallel.topology as topo_mod

        for s in range(ex.n_shards):
            t, py, px = ex._shard_info(s)
            Ju, Iu = np.meshgrid(
                py * ex.nsy + np.arange(ex.nsy + 1),
                px * ex.nsx + np.arange(ex.nsx) + 0.5,
                indexing="ij",
            )
            u[s, H:H + ex.nsy + 1, H:H + ex.nsx] = solid_body_components(
                topo_mod, t, Ju, Iu, n, axis, "x"
            )
            Jv, Iv = np.meshgrid(
                py * ex.nsy + np.arange(ex.nsy) + 0.5,
                px * ex.nsx + np.arange(ex.nsx + 1),
                indexing="ij",
            )
            v[s, H:H + ex.nsy, H:H + ex.nsx + 1] = solid_body_components(
                topo_mod, t, Jv, Iv, n, axis, "y"
            )
        out_u, out_v = ex.update_vector(jnp.asarray(u), jnp.asarray(v))
        results[layout] = (np.asarray(out_u), np.asarray(out_v))
    # compare the tile-boundary halo columns of the (2,2) east-edge shards with
    # the (1,1) result at the same tile-level locations (u component, east halo)
    ns = n // 2
    u1 = results[(1, 1)][0]
    u2 = results[(2, 2)][0]
    for t in range(6):
        for py in range(2):
            s = (t * 2 + py) * 2 + 1  # px=1 shard (east column)
            # shard east halo rows (interior J range only)
            got = u2[s, H:H + ns + 1, -H:]
            expected = u1[t, H + py * ns:H + py * ns + ns + 1, H + n:H + n + H]
            np.testing.assert_allclose(got, expected, err_msg=f"t={t} py={py}")

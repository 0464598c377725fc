"""Tests for d2a2c staggering transforms and C-grid diagnostics against the
analytic fields of a rigid rotation (vorticity 2*omega*(axis . rhat),
divergence 0)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.constants import RADIUS
from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.c_sw import c_sw, corner_vorticity, divergence_corner
from pace_tpu.ops.d2a2c import d2a2c_vect


@pytest.fixture(scope="module")
def setup():
    spec = GridSpec(n_tile=24, npz=3, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    omega_rot = 1e-5

    def vel(p):
        return omega_rot * RADIUS * np.cross(np.broadcast_to(axis, p.shape), p)

    # D-grid covariant winds
    u = jnp.asarray(np.sum(vel(mt.xyz_u) * mt.es1, axis=-1))
    v = jnp.asarray(np.sum(vel(mt.xyz_v) * mt.ew2, axis=-1))
    return spec, mt, grid, axis, omega_rot, vel, u, v


def _int(h):
    return (slice(None), slice(h, -h), slice(h, -h))


def test_d2a2c_contravariant_centers(setup):
    spec, mt, grid, axis, om, vel, u, v = setup
    h = spec.n_halo
    ua, va, uc, vc, ut, vt = d2a2c_vect(u, v, grid)
    # exact contravariant at centers: solve [e1.e1 e1.e2; ...] against covariant
    V = vel(mt.xyz_center)
    ucov = np.sum(V * mt.ec1, axis=-1)
    vcov = np.sum(V * mt.ec2, axis=-1)
    cosa = np.sum(mt.ec1 * mt.ec2, axis=-1)
    sin2 = 1.0 - cosa**2
    ua_ex = (ucov - vcov * cosa) / sin2
    va_ex = (vcov - ucov * cosa) / sin2
    scale = np.abs(ua_ex).max()
    err_u = np.abs(np.asarray(ua)[_int(h)] - ua_ex[_int(h)]).max() / scale
    err_v = np.abs(np.asarray(va)[_int(h)] - va_ex[_int(h)]).max() / scale
    assert err_u < 2e-3 and err_v < 2e-3, (err_u, err_v)

    # C-grid covariant x-wind matches the analytic projection; the max sits
    # at cube corners where the reconstruction is 2nd-order (converges ~ dx^2)
    uc_ex = np.sum(vel(mt.xyz_v) * mt.ew1, axis=-1)
    err = np.abs(np.asarray(uc)[_int(h)][:, :, :-1] - uc_ex[_int(h)][:, :, :-1])
    assert err.max() / scale < 3e-3
    assert np.median(err) / scale < 1e-4


def test_corner_vorticity_rigid_rotation(setup):
    spec, mt, grid, axis, om, vel, u, v = setup
    h = spec.n_halo
    _ua, _va, uc, vc, _ut, _vt = d2a2c_vect(u, v, grid)
    vort = np.asarray(corner_vorticity(uc, vc, grid, absolute=False))
    # exact relative vorticity of rigid rotation: 2*om*(axis . rhat)
    vort_ex = 2.0 * om * np.sum(mt.xyz_corner * axis, axis=-1)
    # interior corners only (skip outermost halo rings)
    sl = (slice(None), slice(h + 1, -h - 1), slice(h + 1, -h - 1))
    err = np.abs(vort[sl] - vort_ex[sl]).max() / (2 * om)
    assert err < 5e-3, err


def test_divergence_corner_rigid_rotation(setup):
    spec, mt, grid, axis, om, vel, u, v = setup
    h = spec.n_halo
    ua, va, _uc, _vc, _ut, _vt = d2a2c_vect(u, v, grid)
    div = np.asarray(divergence_corner(u, v, va, ua, grid))
    sl = (slice(None), slice(h + 1, -h - 1), slice(h + 1, -h - 1))
    assert np.abs(div[sl]).max() / (2 * om) < 2e-2


def test_c_sw_runs_and_preserves_uniform_state(setup):
    """A state at rest with uniform delp/pt must stay exactly at rest."""
    spec, mt, grid, *_ = setup
    h = spec.n_halo
    S = mt.halo.n_shards
    Ys, Xs = mt.halo.nsy + 2 * h, mt.halo.nsx + 2 * h
    u0 = jnp.zeros((S, Ys + 1, Xs))
    v0 = jnp.zeros((S, Ys, Xs + 1))
    delp = jnp.full((S, Ys, Xs), 1000.0)
    pt = jnp.full((S, Ys, Xs), 300.0)
    st = c_sw(u0, v0, delp, pt, grid, mt.halo, dt2=100.0)
    assert np.allclose(np.asarray(st.delpc), 1000.0)
    assert np.allclose(np.asarray(st.ptc), 300.0)
    assert np.abs(np.asarray(st.uc)).max() == 0.0
    assert np.abs(np.asarray(st.vc)).max() == 0.0

"""Dry convective adjustment (fv_sg_adj) tests (reference
DycoreToPhysics do_dry_convective_adjust, driver/pace/driver/driver.py:519-525
driven by the fv_sg_adj namelist timescale)."""

import jax.numpy as jnp
import numpy as np

from pace_tpu.models.shield.physics import (
    TendencyState,
    dry_convective_adjustment,
)


def _column(profile):
    """(1, K, 1, 1) arrays from a list."""
    return jnp.asarray(np.asarray(profile, dtype=np.float64)[None, :, None, None])


def test_stable_column_untouched():
    pt = _column([320.0, 310.0, 300.0, 290.0])  # theta decreasing downward = stable
    q = jnp.zeros((1, 2, 4, 1, 1))
    delp = jnp.ones_like(pt) * 100.0
    pt2, q2 = dry_convective_adjustment(pt, q, delp, dt=600.0, tau=600.0)
    assert np.allclose(np.asarray(pt2), np.asarray(pt))


def test_unstable_pair_mixes_conserving_mass_weighted_theta():
    pt = _column([300.0, 310.0])  # theta increasing downward = unstable
    q = jnp.zeros((1, 1, 2, 1, 1))
    delp = _column([100.0, 300.0])
    pt2, _ = dry_convective_adjustment(pt, q, delp, dt=600.0, tau=600.0)
    pt2 = np.asarray(pt2)[0, :, 0, 0]
    expected = (300.0 * 100.0 + 310.0 * 300.0) / 400.0
    assert abs(pt2[0] - expected) < 1e-10
    assert abs(pt2[1] - expected) < 1e-10
    # mass-weighted mean preserved
    assert abs((pt2 * [100, 300]).sum() - (np.array([300, 310.0]) * [100, 300]).sum()) < 1e-9


def test_relaxation_partial():
    pt = _column([300.0, 310.0])
    q = jnp.zeros((1, 1, 2, 1, 1))
    delp = _column([100.0, 100.0])
    # tau >> dt: only dt/tau of the full adjustment applies
    pt2, _ = dry_convective_adjustment(pt, q, delp, dt=60.0, tau=600.0)
    pt2 = np.asarray(pt2)[0, :, 0, 0]
    full = 305.0
    assert abs(pt2[0] - (300.0 + 0.1 * (full - 300.0))) < 1e-9


def test_moisture_mixed_with_heat():
    pt = _column([300.0, 310.0])
    qv = np.zeros((1, 1, 2, 1, 1))
    qv[0, 0, 1] = 0.02  # moist lower layer
    q = jnp.asarray(qv)
    delp = _column([100.0, 100.0])
    _, q2 = dry_convective_adjustment(pt, q, delp, dt=600.0, tau=600.0)
    q2 = np.asarray(q2)[0, 0, :, 0, 0]
    assert abs(q2[0] - 0.01) < 1e-10 and abs(q2[1] - 0.01) < 1e-10


def test_tendency_state_zeros():
    like = jnp.ones((2, 3, 4, 5))
    t = TendencyState.init_zeros(like)
    assert t.u_dt.shape == like.shape
    assert float(jnp.abs(t.u_dt).max()) == 0.0

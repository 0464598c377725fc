"""Reed-Jablonowski 2012 simple-physics suite unit tests
(models/shield/simple_physics.py — the idealized-TC companion physics;
integration anchor: test_tropical_cyclone.py::test_tc_intensification_curve).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.models.shield.simple_physics import (
    SimplePhysicsConfig,
    _qsat,
    simple_physics_step,
)

CFG = SimplePhysicsConfig()


def _column(K=12, qv0=2.0e-3, u0=15.0):
    S, Y, X = 1, 4, 4
    pe = jnp.broadcast_to(
        jnp.linspace(1.0e4, 1.0e5, K + 1)[None, :, None, None],
        (S, K + 1, Y, X),
    )
    p_mid = 0.5 * (pe[:, 1:] + pe[:, :-1])
    delp = pe[:, 1:] - pe[:, :-1]
    t = jnp.broadcast_to(
        jnp.linspace(210.0, 300.0, K)[None, :, None, None], (S, K, Y, X)
    )
    qv = jnp.full((S, K, Y, X), qv0)
    ua = jnp.full((S, K, Y, X), u0)
    va = jnp.zeros((S, K, Y, X))
    phis = jnp.zeros((S, Y, X))
    return ua, va, t, qv, pe, p_mid, delp, phis


def test_qsat_monotone_in_temperature():
    p = jnp.full((4,), 9.0e4)
    t = jnp.array([260.0, 280.0, 295.0, 302.15])
    qs = np.asarray(_qsat(t, p, CFG))
    assert (np.diff(qs) > 0).all()
    # ~2% at 300 K, 900 hPa — the right order of magnitude
    assert 0.01 < qs[2] < 0.03


def test_condensation_removes_supersaturation_and_rains():
    ua, va, t, qv, pe, p_mid, delp, phis = _column(qv0=0.01)
    dt = 600.0
    _, _, t_new, qv_new, precip = simple_physics_step(
        ua, va, t, qv, pe, p_mid, delp, phis, dt, CFG
    )
    qs = _qsat(t_new, p_mid, CFG)
    # post-adjustment columns are at/below saturation (gamma undershoot ok)
    assert float(jnp.max(qv_new - qs)) < 1.0e-4
    assert float(precip.min()) >= 0.0
    assert float(precip.max()) > 0.0
    # latent heating warmed the condensing levels
    assert float(jnp.max(t_new - t)) > 0.0


def test_surface_fluxes_drive_toward_sst_and_decelerate():
    ua, va, t, qv, pe, p_mid, delp, phis = _column(qv0=1.0e-3, u0=20.0)
    dt = 600.0
    u_dt, v_dt, t_new, qv_new, _ = simple_physics_step(
        ua, va, t, qv, pe, p_mid, delp, phis, dt, CFG
    )
    # drag decelerates the lowest level
    assert float(u_dt[0, -1].mean()) < 0.0
    # ocean moistens and warms the lowest level toward saturation at SST
    assert float((qv_new - qv)[0, -1].mean()) > 0.0
    assert float((t_new - t)[0, -1].mean()) > 0.0
    # wind-speed dependence: stronger winds, stronger moistening (WISHE)
    ua2 = jnp.full_like(ua, 5.0)
    _, _, _, qv_slow, _ = simple_physics_step(
        ua2, va, t, qv, pe, p_mid, delp, phis, dt, CFG
    )
    assert float((qv_new - qv)[0, -1].mean()) > float(
        (qv_slow - qv)[0, -1].mean()
    )


def test_diffusion_conserves_dry_column_mass_weighted_theta():
    """With surface exchange zeroed, PBL diffusion approximately conserves
    the mass-weighted column integrals it diffuses."""
    cfg = SimplePhysicsConfig(c_hq=0.0)  # no surface heat/moisture source
    # qv0 well below qsat at the coldest level (~1e-4 at 210 K, 100 hPa)
    # so the condensation component is inert and diffusion is isolated
    ua, va, t, qv, pe, p_mid, delp, phis = _column(qv0=1.0e-5, u0=10.0)
    dt = 600.0
    _, _, t_new, qv_new, _ = simple_physics_step(
        ua, va, t, qv, pe, p_mid, delp, phis, dt, cfg
    )
    # the flux form telescopes exactly in exact arithmetic; at f32 the
    # mass-weighted theta sums are ~1e7-scale, so allow f32 accumulation
    # roundoff (measured 3.3e-5 relative)
    exner = (p_mid / 1.0e5) ** (2.0 / 7.0)
    th0 = jnp.sum(t / exner * delp, axis=-3)
    th1 = jnp.sum(t_new / exner * delp, axis=-3)
    np.testing.assert_allclose(
        np.asarray(th1), np.asarray(th0), rtol=1e-4
    )
    q0 = jnp.sum(qv * delp, axis=-3)
    q1 = jnp.sum(qv_new * delp, axis=-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), rtol=1e-4)


def test_registered_in_physics_packages():
    from pace_tpu.models.shield.physics import PHYSICS_PACKAGES

    assert "RJ_simple_physics" in PHYSICS_PACKAGES

"""GFS_PBL scheme (pace_tpu/models/shield/pbl.py): tridiagonal solver
correctness, conservation of the implicit diffusion, stable-BL behavior, and
integration through the Physics driver."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.models.shield.pbl import PBLConfig, _tridiag_solve, pbl_step


def test_tridiag_matches_dense_solve():
    rng = np.random.default_rng(0)
    K = 12
    lo = rng.uniform(-0.4, -0.1, (1, K, 2, 3)).astype(np.float64)
    up = rng.uniform(-0.4, -0.1, (1, K, 2, 3)).astype(np.float64)
    lo[:, 0] = 0.0
    up[:, -1] = 0.0
    di = 1.0 - lo - up  # diagonally dominant
    rhs = rng.standard_normal((1, K, 2, 3))
    x = np.asarray(_tridiag_solve(jnp.asarray(lo), jnp.asarray(di),
                                  jnp.asarray(up), jnp.asarray(rhs)))
    for j in range(2):
        for i in range(3):
            m = (np.diag(di[0, :, j, i]) + np.diag(lo[0, 1:, j, i], -1)
                 + np.diag(up[0, :-1, j, i], 1))
            want = np.linalg.solve(m, rhs[0, :, j, i])
            np.testing.assert_allclose(x[0, :, j, i], want, rtol=1e-12)


def _column_setup(K=24, shear=True, unstable=False):
    """An idealized sounding: (S=1, K, Y=2, X=2) columns."""
    S, Y, X = 1, 2, 2
    ps = 1.0e5
    pe = np.linspace(2000.0, ps, K + 1)
    pe = np.broadcast_to(pe[None, :, None, None], (S, K + 1, Y, X)).copy()
    p_mid = 0.5 * (pe[:, 1:] + pe[:, :-1])
    delp = pe[:, 1:] - pe[:, :-1]
    # stable stratification: theta decreasing downward toward 290 K
    theta = 290.0 + 60.0 * (1.0 - p_mid / ps)
    if unstable:
        theta = theta[..., ::-1, :, :].copy()  # theta increasing downward
    t = theta * (p_mid / 1.0e5) ** 0.2859
    qv = np.full_like(t, 5e-3)
    ua = np.zeros_like(t)
    if shear:
        ua = 10.0 * (1.0 - p_mid / ps) + 5.0  # westerlies, shear to surface
    va = np.zeros_like(t)
    j = jnp.asarray
    return (j(ua), j(va), j(t), j(qv), j(pe), j(p_mid), j(delp),
            jnp.zeros((S, Y, X)))


def test_conservation_zero_surface_flux():
    ua, va, t, qv, pe, p_mid, delp, zs = _column_setup()
    cfg = PBLConfig()
    u_dt, v_dt, t_new, qv_new, h = pbl_step(
        ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg
    )
    # moisture: column integral conserved exactly (zero-flux boundaries)
    m0 = float(jnp.sum(qv * delp))
    m1 = float(jnp.sum(qv_new * delp))
    assert abs(m1 - m0) / m0 < 1e-6
    # dry static energy likewise (diffused variable is s = cp T + g z)
    assert np.isfinite(np.asarray(t_new)).all()
    assert float(h.min()) >= 0.0


def test_surface_drag_decelerates_lowest_level():
    ua, va, t, qv, pe, p_mid, delp, zs = _column_setup(shear=True)
    cfg = PBLConfig()
    u_dt, v_dt, t_new, qv_new, h = pbl_step(
        ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg
    )
    sfc_before = float(ua[0, -1, 0, 0])
    sfc_after = sfc_before + 600.0 * float(u_dt[0, -1, 0, 0])
    assert sfc_after < sfc_before  # drag slows the surface wind
    assert sfc_after > 0.0         # but does not reverse it
    # column momentum only decreases (drag is the only sink)
    p0 = float(jnp.sum(ua * delp))
    p1 = float(jnp.sum((ua + 600.0 * u_dt) * delp))
    assert p1 < p0


def test_unstable_column_mixes_deeper():
    res_s = pbl_step(*_column_setup(unstable=False), 600.0, PBLConfig())
    res_u = pbl_step(*_column_setup(unstable=True), 600.0, PBLConfig())
    # statically unstable sounding must diagnose a deeper boundary layer
    assert float(res_u[4].mean()) > float(res_s[4].mean())


def test_prescribed_heat_flux_warms_column():
    args = _column_setup()
    cfg = PBLConfig(sensible_heat_flux=0.1)  # K m/s upward
    _, _, t_new, _, _ = pbl_step(*args, 600.0, cfg)
    t_old = args[2]
    delp = args[6]
    e0 = float(jnp.sum(t_old * delp))
    e1 = float(jnp.sum(t_new * delp))
    assert e1 > e0


def test_physics_integration_baroclinic():
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.shield.physics import Physics

    spec = GridSpec(n_tile=12, npz=16, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    state = DycoreState.from_baroclinic_init(mt, moist=True, dtype=jnp.float32)
    phys = Physics(grid, schemes=("GFS_PBL", "GFS_microphysics"),
                   timestep=600.0)
    out = phys(state)
    H = 3
    for name in ("u", "v", "pt"):
        a = np.asarray(getattr(out, name))[..., H:-H, H:-H]
        assert np.isfinite(a).all(), name
    u_in = np.asarray(state.u)[..., H:-H, H:-H]
    u_out = np.asarray(out.u)[..., H:-H, H:-H]
    # PBL drag + mixing changes the winds, but boundedly
    assert not np.array_equal(u_in, u_out)
    assert np.abs(u_out).max() < np.abs(u_in).max() + 5.0


def test_edmf_mass_flux_conserves_and_transports():
    """The MF component moves heat non-locally but conserves the column
    enthalpy exactly: MF-on and MF-off runs differ in profile shape yet have
    identical column integrals (same prescribed surface-flux input)."""
    from pace_tpu import constants

    ua, va, t, qv, pe, p_mid, delp, zs = _column_setup(K=24, unstable=True)
    cfg_on = PBLConfig(sensible_heat_flux=0.15, latent_heat_flux=1e-4,
                       mass_flux=True)
    cfg_off = dataclasses.replace(cfg_on, mass_flux=False)
    out_on = pbl_step(ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg_on)
    out_off = pbl_step(ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg_off)
    t_on, q_on = out_on[2], out_on[3]
    t_off, q_off = out_off[2], out_off[3]
    # MF changed the profile ...
    assert float(jnp.max(jnp.abs(t_on - t_off))) > 1e-4
    # ... but not the column budget (flux form, M = 0 at both ends)
    def col(tt, qq):
        return jnp.sum((constants.CP_AIR * tt + constants.HLV * qq) * delp,
                       axis=-3)
    np.testing.assert_allclose(np.asarray(col(t_on, q_on)),
                               np.asarray(col(t_off, q_off)), rtol=1e-12)
    # non-local transport: the updraft warms the upper boundary layer more
    # than pure diffusion does somewhere above the lowest two levels
    assert float(jnp.max((t_on - t_off)[..., :-2, :, :])) > 0.0


def test_edmf_inactive_without_surface_buoyancy_flux():
    ua, va, t, qv, pe, p_mid, delp, zs = _column_setup()
    cfg_on = PBLConfig(mass_flux=True)    # zero surface fluxes
    cfg_off = PBLConfig(mass_flux=False)
    out_on = pbl_step(ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg_on)
    out_off = pbl_step(ua, va, t, qv, pe, p_mid, delp, zs, 600.0, cfg_off)
    for a, b in zip(out_on, out_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

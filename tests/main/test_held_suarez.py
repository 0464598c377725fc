"""Held-Suarez forcing (pace_tpu/models/shield/held_suarez.py): equilibrium
profile shape, implicit relaxation convergence, sigma-gated drag, and
integration through the Physics driver."""

import numpy as np
import jax.numpy as jnp

from pace_tpu import constants
from pace_tpu.models.shield.held_suarez import (
    HeldSuarezConfig,
    equilibrium_temperature,
    held_suarez_step,
)


def test_equilibrium_profile_shape():
    cfg = HeldSuarezConfig()
    p = jnp.asarray([[2e3], [5e4], [1e5]])  # (K=3, 1) column
    t_eq = equilibrium_temperature(p[None, :, :, None],
                                   jnp.zeros((1, 1, 1, 1)), cfg)
    t_eq = np.asarray(t_eq)[0, :, 0, 0]
    assert t_eq[0] == cfg.t_strat          # stratosphere hits the floor
    assert t_eq[-1] == cfg.t_eq_sfc        # equator surface = 315 K
    # pole colder than equator at the surface
    t_pole = equilibrium_temperature(jnp.asarray(1e5), jnp.asarray(1.0), cfg)
    assert float(t_pole) < cfg.t_eq_sfc


def _setup(K=10):
    S, Y, X = 1, 3, 3
    ps = np.full((S, Y, X), 1.0e5)
    pe = np.linspace(100.0, 1.0e5, K + 1)
    p_mid = 0.5 * (pe[1:] + pe[:-1])
    p_mid = np.broadcast_to(p_mid[None, :, None, None], (S, K, Y, X)).copy()
    pkz = (p_mid / constants.P_REF) ** constants.KAPPA
    pt = np.full((S, K, Y, X), 280.0) / pkz
    u = np.full((S, K, Y + 1, X), 20.0)
    v = np.full((S, K, Y, X + 1), 20.0)
    # columns at the equator (f0 = 0)
    f0 = np.zeros((S, Y, X))
    j = jnp.asarray
    return j(u), j(v), j(pt), j(pkz), j(p_mid), j(ps), j(f0)


def test_relaxation_toward_equilibrium():
    cfg = HeldSuarezConfig()
    u, v, pt, pkz, p_mid, ps, f0 = _setup()
    t0 = np.asarray(pt * pkz)
    t_eq = np.asarray(
        equilibrium_temperature(p_mid, jnp.zeros_like(p_mid), cfg)
    )
    # one big implicit step: T moves toward T_eq, never past it
    _, _, pt1 = held_suarez_step(u, v, pt, pkz, p_mid, ps, f0,
                                 4 * 86400.0, cfg)
    t1 = np.asarray(pt1 * pkz)
    assert (np.abs(t1 - t_eq) <= np.abs(t0 - t_eq) + 1e-9).all()
    moved = np.abs(t1 - t0) > 1e-3
    assert moved.any()


def test_drag_only_below_sigma_b():
    cfg = HeldSuarezConfig()
    u, v, pt, pkz, p_mid, ps, f0 = _setup()
    u1, v1, _ = held_suarez_step(u, v, pt, pkz, p_mid, ps, f0, 3600.0, cfg)
    u1, v1 = np.asarray(u1), np.asarray(v1)
    sig = np.asarray(p_mid)[0, :, 0, 0] / 1e5
    for k, s in enumerate(sig):
        sfc_row = u1[0, k, 1, 0]  # interior y-interface
        if s < cfg.sigma_b - 0.05:
            assert sfc_row == 20.0, f"drag above sigma_b at sigma={s}"
        if s > cfg.sigma_b + 0.05:
            assert sfc_row < 20.0, f"no drag below sigma_b at sigma={s}"


def test_physics_integration_held_suarez():
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.shield.physics import Physics

    spec = GridSpec(n_tile=12, npz=12, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float32)
    phys = Physics(grid, schemes=("held_suarez",), timestep=1800.0)
    out = phys(state)
    H = 3
    for name in ("u", "v", "pt"):
        a = np.asarray(getattr(out, name))[..., H:-H, H:-H]
        assert np.isfinite(a).all(), name
    # polar columns must cool toward T_eq (T_eq(pole, sfc) = 255 K < init)
    assert not np.array_equal(np.asarray(out.pt), np.asarray(state.pt))

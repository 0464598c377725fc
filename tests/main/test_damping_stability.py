"""Regression tests for the del-n damping stability fixes.

The composite del-2(nord+1) divergence damping was unstable at tile edges for
nord=3, d4_bg=0.15 (the reference's production setting,
.jenkins/driver_configs/baroclinic_c192_6ranks.yaml): the edge corner rows sit
at the global dual-area minimum, and the outermost ghost ring of area_c was
half-sized. These tests pin the metric fix and short-run stability with the
full production damping flag set.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState


@pytest.fixture(scope="module")
def mt_c24():
    return MetricTerms.generate(GridSpec(n_tile=24, npz=8, layout=(1, 1)))


def test_area_c_ghost_ring_not_half_sized(mt_c24):
    """The outermost corner ring only accumulates quadrants of in-array cells;
    it must be extrapolated, not left at ~half the true dual area."""
    area_c = np.asarray(mt_c24.area_c)
    ring = area_c[:, 0, 5:-5]
    inner = area_c[:, 1, 5:-5]
    # smooth metric: ring within 10% of its neighbor ring, not ~50% of it
    assert np.all(ring > 0.8 * inner)
    assert np.all(ring < 1.2 * inner)


def test_delnflux_f32_no_overflow(mt_c24):
    """(damp_c*da_min)^(nord+1) overflows f32 at production resolutions; the
    factored form must stay finite and damp a noisy field."""
    from pace_tpu.ops.delnflux import delnflux
    from pace_tpu.ops.stencil_utils import x_iface_diff, y_iface_diff, bcast_k

    grid = GridData.from_metric_terms(mt_c24, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(6, 4, 30, 30), dtype=jnp.float32)
    fx, fy = delnflux(q, grid, nord=3, damp_c=0.15, da_min=grid.da_min)
    assert bool(jnp.isfinite(fx).all() and jnp.isfinite(fy).all())
    q2 = q + (x_iface_diff(fx) + y_iface_diff(fy)) * bcast_k(grid.rarea, q)
    # the hyperdiffusion step must reduce the grid-scale noise variance
    h = 4
    assert float(jnp.var(q2[..., h:-h, h:-h])) < float(
        jnp.var(q[..., h:-h, h:-h])
    )


@pytest.mark.slow
def test_nonhydro_production_damping_stable_f32(mt_c24):
    """Short nonhydrostatic run with the reference's full damping flag set
    (nord=3, d4_bg=0.15, dddmp, vorticity damping, d_con heating, Rayleigh,
    sponge profile) stays finite and bounded in f32."""
    grid = GridData.from_metric_terms(mt_c24, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(
        npz=8,
        k_split=2,
        n_split=2,
        hydrostatic=False,
        nord=3,
        d4_bg=0.15,
        d2_bg_k1=0.2,
        d2_bg_k2=0.1,
        dddmp=0.5,
        do_vort_damp=True,
        vtdm4=0.06,
        d_con=1.0,
        rf_cutoff=3000.0,
        rf_fast=True,
        tau=10.0,
        fill=True,
    )
    core = DynamicalCore(grid, mt_c24.halo, cfg, timestep=450.0)
    state = DycoreState.from_baroclinic_init(
        mt_c24, perturbation=True, dtype=jnp.float32
    )
    for _ in range(3):
        state = core.step_dynamics(state)
    h = 3
    u = np.asarray(state.u)[:, :, h:-h, h:-h]
    w = np.asarray(state.w)[:, :, h:-h, h:-h]
    pt = np.asarray(state.pt)[:, :, h:-h, h:-h]
    assert np.isfinite(u).all() and np.isfinite(w).all() and np.isfinite(pt).all()
    assert np.abs(u).max() < 80.0
    assert np.abs(w).max() < 5.0
    # diss_estd diagnostic is filled when d_con/vtdm4 are active
    assert state.diss_estd is not None
    d = np.asarray(state.diss_estd)[:, :, h:-h, h:-h]
    assert np.isfinite(d).all()
    # ua/va diagnostics are filled by the step
    assert state.ua is not None and state.va is not None

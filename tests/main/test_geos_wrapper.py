"""GEOS raw-array wrapper + namelist ingestion tests (reference
pyFV3.GeosDycoreWrapper, tests/main/fv3core/test_init_from_geos.py:87-180;
ndsl.namelist.Namelist.from_f90nml)."""

import numpy as np
import pytest

from pace_tpu.utils.namelist import Namelist, parse_f90nml

NML = """
&fv_core_nml
    npx = 13
    npy = 13
    npz = 6
    k_split = 1
    n_split = 2
    hydrostatic = .false.
    nord = 1
    d4_bg = 0.12
    dddmp = 0.2
    do_vort_damp = .true.
    vtdm4 = 0.06
    fill = .T.
    tau = 10.0
    rf_cutoff = 3.0d3
    hord_mt = 6
/
&other_nml
    some_key = 'hello'
    values = 1, 2, 3
/
"""


def test_namelist_parse():
    nml = Namelist.from_f90nml(NML)
    assert nml.npz == 6
    assert nml.hydrostatic is False
    assert nml.fill is True
    assert nml.rf_cutoff == 3000.0
    assert nml.some_key == "hello"
    assert nml.values == [1, 2, 3]
    groups = parse_f90nml(NML)
    assert set(groups) == {"fv_core_nml", "other_nml"}


def test_namelist_to_dycore_config():
    cfg = Namelist.from_f90nml(NML).dycore_config()
    assert cfg.npz == 6
    assert cfg.n_split == 2
    assert cfg.hydrostatic is False
    assert cfg.do_vort_damp is True
    assert cfg.vtdm4 == 0.06


@pytest.mark.slow
def test_geos_wrapper_steps():
    import jax.numpy as jnp

    from pace_tpu.models.fv3.geos_wrapper import GeosDycoreWrapper
    from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES
    from pace_tpu.grid.generation import GridSpec, MetricTerms

    n_tile, npz = 12, 6
    wrapper = GeosDycoreWrapper(
        Namelist.from_f90nml(NML), n_tile=n_tile, npz=npz, bdt=300.0,
        dtype=jnp.float64,
    )
    # raw arrays from the analytic init (the GEOS host would pass its own)
    mt = wrapper.metric_terms
    st = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    g = lambda n: np.asarray(getattr(st, n))  # noqa: E731
    # reference GEOS passes 7 tracers; wrapper pads to the full registry
    q7 = np.asarray(st.q)[:, :7]
    out = wrapper(
        u=g("u"), v=g("v"), w=g("w"), delz=g("delz"), pt=g("pt"),
        delp=g("delp"), q=q7, ps=g("ps"), pe=g("pe"), pk=g("pk"),
        peln=g("peln"), pkz=g("pkz"), phis=g("phis"),
    )
    assert set(out) >= {"u", "v", "w", "delp", "pt", "q", "ps", "ua", "va"}
    assert out["q"].shape[1] == len(TRACER_NAMES)
    h = 3
    ui = out["u"][:, :, h:-h, h:-h]
    assert np.isfinite(ui).all()
    assert 10.0 < np.abs(ui).max() < 100.0
    # calling twice with the same inputs is deterministic
    out2 = wrapper(
        u=g("u"), v=g("v"), w=g("w"), delz=g("delz"), pt=g("pt"),
        delp=g("delp"), q=q7, ps=g("ps"), pe=g("pe"), pk=g("pk"),
        peln=g("peln"), pkz=g("pkz"), phis=g("phis"),
    )
    assert np.array_equal(out["u"], out2["u"])

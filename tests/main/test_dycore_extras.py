"""Tests for sponge diffusion, Rayleigh damping and negative-tracer fill."""

import jax.numpy as jnp
import numpy as np

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.dycore_extras import apply_sponge, neg_adj3, ray_fast


def _grid():
    spec = GridSpec(n_tile=12, npz=6, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    return spec, mt, GridData.from_metric_terms(mt, dtype=jnp.float64)


def test_sponge_reduces_variance_top_layers_only():
    spec, mt, grid = _grid()
    h = spec.n_halo
    rng = np.random.RandomState(0)
    S = mt.halo.n_shards
    Y = X = 12 + 2 * h
    pt = jnp.asarray(300.0 + rng.rand(S, 6, Y, X))
    out = apply_sponge(pt, None, grid, n_sponge=2, d_ext=0.02, dt=600.0)
    v0 = np.var(np.asarray(pt)[:, 0, h:-h, h:-h])
    v1 = np.var(np.asarray(out)[:, 0, h:-h, h:-h])
    assert v1 < v0
    np.testing.assert_array_equal(
        np.asarray(out)[:, 2:], np.asarray(pt)[:, 2:]
    )


def test_ray_fast_damps_aloft_only():
    K, Y, X = 8, 6, 6
    pe_mid = jnp.asarray(
        np.linspace(50.0, 9.5e4, K)[None, :, None, None] * np.ones((1, 1, Y, X))
    )
    u = jnp.ones((1, K, Y + 1, X))
    v = jnp.ones((1, K, Y, X + 1))
    w = jnp.ones((1, K, Y, X))
    u2, v2, w2 = ray_fast(u, v, w, pe_mid, 600.0, 10.0, rf_cutoff=750.0, tau=3600.0)
    assert float(u2[0, 0].mean()) < 1.0  # damped at top
    np.testing.assert_allclose(np.asarray(u2)[0, -1], 1.0)  # untouched below
    assert float(w2[0, 0].mean()) < 1.0


def test_fillz_conserves_and_fills():
    from pace_tpu.ops.dycore_extras import fillz

    rng = np.random.RandomState(1)
    q = rng.rand(1, 2, 6, 4, 4) - 0.2  # some negatives
    delp = np.full((1, 6, 4, 4), 1000.0)
    out = np.asarray(fillz(jnp.asarray(q), jnp.asarray(delp)[:, None]))
    assert out.min() >= 0.0
    # columns with net positive mass conserve exactly
    m0 = (q * delp[:, None]).sum(axis=2)
    m1 = (out * delp[:, None]).sum(axis=2)
    pos = m0 > 0
    np.testing.assert_allclose(m1[pos], m0[pos], rtol=1e-12)


def test_neg_adj3_species_adjustment_with_heating():
    """Negative ice deposits from vapor WITH latent heating; the result is
    non-negative, water-conserving, and moist-enthalpy-conserving."""
    from pace_tpu import constants
    from pace_tpu.models.fv3.state import TRACER_NAMES

    nq = len(TRACER_NAMES)
    K, Y, X = 6, 4, 4
    rng = np.random.RandomState(2)
    q = np.zeros((1, nq, K, Y, X))
    iv = TRACER_NAMES.index("qvapor")
    ii = TRACER_NAMES.index("qice")
    il = TRACER_NAMES.index("qliquid")
    q[:, iv] = 5e-3 + 1e-3 * rng.rand(1, K, Y, X)
    q[:, ii] = -2e-5  # negative ice everywhere
    q[:, il, 2] = -1e-5
    delp = jnp.asarray(np.full((1, K, Y, X), 1000.0))
    pkz = jnp.full((1, K, Y, X), 0.9)
    t0 = 250.0
    pt = t0 * (1.0 + constants.ZVIR * q[:, iv]) / np.asarray(pkz)
    out, pt2 = neg_adj3(
        jnp.asarray(q), delp, pt=jnp.asarray(pt), pkz=pkz
    )
    out = np.asarray(out)
    assert out.min() >= 0.0
    # water mass conserved (negative ice filled FROM vapor, not clipped)
    wat0 = q[:, [iv, il, ii]].sum(axis=1)
    wat1 = out[:, [iv, il, ii]].sum(axis=1)
    np.testing.assert_allclose(wat1, wat0, rtol=1e-10)
    # deposition heated: T rose where ice deficit was filled
    t1 = np.asarray(pt2) * np.asarray(pkz) / (1.0 + constants.ZVIR * out[:, iv])
    assert t1.mean() > t0
    # moist enthalpy cp*T + lv*qv - lf*qi conserved
    cp, lv, lf = constants.CP_AIR, constants.HLV, constants.HLF
    h0 = (cp * t0 + lv * q[:, iv] - lf * q[:, ii]).sum()
    h1 = (cp * t1 + lv * out[:, iv] - lf * out[:, ii]).sum()
    np.testing.assert_allclose(h1, h0, rtol=1e-9)

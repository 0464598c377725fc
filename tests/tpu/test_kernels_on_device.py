"""Compiled-Mosaic vs XLA-twin parity ON REAL TPU HARDWARE.

The CI tier exercises every Pallas kernel in interpret mode only (VERDICT r2
weak #8) — a Mosaic-vs-interpret divergence would ship silently. This tier
runs the compiled kernels on the device against their jnp twins. Skipped
automatically off-TPU; on the TPU host:

    PACE_TPU_TEST_DEVICE=tpu python -m pytest tests/tpu -q

f32 tolerances: the two paths are separately compiled programs (different
fusion/FMA order), so agreement is to f32 roundoff accumulation, not bits.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

S, K, N = 6, 16, 48
H = 3
Y = X = N + 2 * H


@pytest.fixture(scope="module")
def rngf():
    key = jax.random.PRNGKey(7)

    def f(*shape, scale=1.0, base=0.0):
        nonlocal key
        key, sub = jax.random.split(key)
        return base + scale * jax.random.normal(sub, shape, jnp.float32)

    return f


@pytest.fixture(scope="module")
def mt():
    from pace_tpu.grid.generation import GridSpec, MetricTerms

    return MetricTerms.generate(GridSpec(n_tile=N, npz=K, layout=(1, 1)))


@pytest.fixture(scope="module")
def grid(mt):
    from pace_tpu.grid.grid_data import GridData

    return GridData.from_metric_terms(mt, dtype=jnp.float32)


def test_halo_kernel_matches_dense_tables(mt, rngf):
    """Compiled halo assembly vs the pointwise gather-table oracle."""
    halo = mt.halo
    q = rngf(S, K, Y, X)
    out = jax.jit(lambda a: halo.update_scalar(a, fold="x"))(q)
    ref = halo.update_scalar_tables(q, fold="x")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=0
    )  # pure copies: bit-exact


def test_fvtp2d_kernel_matches_xla(grid, rngf):
    from pace_tpu.ops.fvtp2d import fvtp2d
    from pace_tpu.ops.fvtp2d_pallas import fvtp2d_pallas

    q = rngf(S, K, Y, X, base=10.0)
    crx = rngf(S, K, Y, X + 1, scale=0.3)
    cry = rngf(S, K, Y + 1, X, scale=0.3)
    xfx = rngf(S, K, Y, X + 1)
    yfx = rngf(S, K, Y + 1, X)
    area = grid.area
    ref = fvtp2d(q, q, crx, cry, xfx, yfx, area, 6)
    fx, fy = jax.jit(
        lambda *a: fvtp2d_pallas(*a, 6)
    )(q, q, crx, cry, xfx, yfx, area)
    b = 3
    sl = np.s_[:, :, b:-b, b:-b]
    np.testing.assert_allclose(
        np.asarray(ref.fx)[sl], np.asarray(fx)[sl], rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.fy)[sl], np.asarray(fy)[sl], rtol=2e-5, atol=1e-4
    )


def test_sim1_kernel_matches_xla(rngf):
    from pace_tpu.ops.nonhydro import sim1_solver
    from pace_tpu.ops.sim1_pallas import sim1_solver_pallas

    pe = np.linspace(100.0, 1e5, K + 1)[None, :, None, None] * np.ones(
        (S, 1, Y, X), np.float32
    )
    delp = jnp.asarray(np.diff(pe, axis=1))
    peln = np.log(pe)
    from pace_tpu import constants

    pk = (pe / constants.P_REF) ** constants.KAPPA
    pkz = jnp.asarray(
        (pk[:, 1:] - pk[:, :-1]) / (constants.KAPPA * np.diff(peln, axis=1))
    )
    t = 260.0
    pt = t / pkz
    delz = jnp.asarray(
        -constants.RDGAS / constants.GRAV * t * np.diff(peln, axis=1)
    ).astype(jnp.float32)
    w = rngf(S, K, Y, X, scale=0.5)
    ws = rngf(S, Y, X, scale=0.2)
    ref = sim1_solver(w, delz, pt, delp, pkz, ws, 10.0, 100.0)
    out = jax.jit(
        lambda *a: sim1_solver_pallas(*a, 10.0, 100.0)
    )(w, delz, pt, delp, pkz, ws)
    for r, o, tol in zip(ref, out, (5e-4, 5e-3, 2.0)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=2e-4, atol=tol
        )


def test_remap_kernel_matches_xla(rngf):
    from pace_tpu.ops.remap_pallas import remap_field_pallas
    from pace_tpu.ops.remapping import remap_field

    ps = 1e5 + 1e3 * rngf(S, 1, Y, X)
    ak = jnp.asarray(
        np.linspace(0.0, 1.0, K + 1), jnp.float32
    )[None, :, None, None]
    pe1 = ak * ps
    pe2 = (ak ** 1.02) * ps
    q = rngf(S, K, Y, X, base=5.0)
    ref = remap_field(q, pe1, pe2, 9)
    out = jax.jit(lambda *a: remap_field_pallas(*a, 9))(q, pe1, pe2)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=5e-5, atol=5e-4
    )


def test_pgrad_kernel_matches_xla(grid, rngf):
    from pace_tpu.ops.nonhydro import nh_p_grad
    from pace_tpu.ops.pgrad_pallas import nh_p_grad_pallas

    pk = rngf(S, K + 1, Y, X, base=10.0)
    gz = rngf(S, K + 1, Y, X, scale=10.0)
    pp = rngf(S, K + 1, Y, X)
    delp = rngf(S, K, Y, X, base=100.0)
    u = rngf(S, K, Y + 1, X)
    v = rngf(S, K, Y, X + 1)
    ref_u, ref_v = nh_p_grad(u, v, pk, gz, pp, delp, grid, 10.0)
    out_u, out_v = jax.jit(
        lambda *a: nh_p_grad_pallas(*a, grid, 10.0)
    )(u, v, pk, gz, pp, delp)
    np.testing.assert_allclose(
        np.asarray(ref_u), np.asarray(out_u), rtol=2e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref_v), np.asarray(out_v), rtol=2e-4, atol=1e-3
    )

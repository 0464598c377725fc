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


def test_d2a2c_kernel_matches_xla(grid, rngf):
    from pace_tpu.ops.d2a2c import d2a2c_vect
    from pace_tpu.ops.d2a2c_pallas import d2a2c_vect_pallas

    u = rngf(S, K, Y + 1, X, scale=10.0)
    v = rngf(S, K, Y, X + 1, scale=10.0)
    ref = d2a2c_vect(u, v, grid)
    got = jax.jit(lambda *a: d2a2c_vect_pallas(*a, grid))(u, v)
    b = 3
    sl = np.s_[:, :, b:-b, b:-b]
    for name, a, p in zip(("ua", "va", "uc", "vc", "ut", "vt"), ref, got):
        np.testing.assert_allclose(
            np.asarray(a)[sl], np.asarray(p)[sl], rtol=2e-4, atol=1e-3,
            err_msg=name,
        )


def test_hydro_kernel_matches_xla(rngf):
    from pace_tpu.ops.hydro_pallas import hydrostatic_interfaces_pallas
    from pace_tpu.ops.pgrad import hydrostatic_interfaces

    delp = rngf(S, K, Y, X, scale=50.0, base=150.0)
    pt = rngf(S, K, Y, X, scale=30.0, base=280.0)
    phis = rngf(S, Y, X, scale=1000.0, base=1000.0)
    ref = hydrostatic_interfaces(delp, pt, phis, 300.0)
    out = hydrostatic_interfaces_pallas(
        delp, pt, phis, 300.0, need=("pe", "peln", "pk", "pkz", "gz")
    )
    tols = {"pe": 1e-6, "peln": 1e-6, "pk": 1e-5, "pkz": 1e-5, "gz": 1e-4}
    for name, a, b in zip(("pe", "peln", "pk", "pkz", "gz"), ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tols[name], atol=1e-2,
            err_msg=name,
        )


def test_csw_tail_kernel_matches_jnp(grid, rngf):
    from pace_tpu.ops.c_sw import c_sw_tail_jnp
    from pace_tpu.ops.c_sw_tail_pallas import c_sw_tail_pallas

    u = rngf(S, K, Y + 1, X)
    v = rngf(S, K, Y, X + 1)
    delp = rngf(S, K, Y, X, base=2.0)
    pt = rngf(S, K, Y, X, scale=10.0, base=260.0)
    uc, uc_x, uc_y = (rngf(S, K, Y, X + 1) for _ in range(3))
    vc, vc_x, vc_y = (rngf(S, K, Y + 1, X) for _ in range(3))
    ua, va, va_x, ua_y = (rngf(S, K, Y, X) for _ in range(4))
    ref = c_sw_tail_jnp(u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y,
                        ua, va, va_x, ua_y, grid, 30.0)
    got = jax.jit(
        lambda *a: c_sw_tail_pallas(*a, grid, 30.0)
    )(u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y, ua, va, va_x, ua_y)
    names = ("delpc", "ptc", "uc_new", "vc_new", "ut", "vt", "xfx", "yfx",
             "divg_d")
    for a, b, name in zip(ref, got, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3,
            err_msg=name,
        )


def test_dsw_tail_kernel_matches_jnp(grid, rngf):
    from pace_tpu.ops.d_sw import DSWConfig, d_sw_tail_jnp
    from pace_tpu.ops.d_sw_tail_pallas import d_sw_tail_pallas

    cfg = DSWConfig(nord=3, d4_bg=0.15, d2_bg=0.0, d2_bg_k1=0.2,
                    d2_bg_k2=0.1, dddmp=0.5, do_vort_damp=True, vtdm4=0.06,
                    d_con=1.0)
    u = rngf(S, K, Y + 1, X)
    v = rngf(S, K, Y, X + 1)
    ut = rngf(S, K, Y, X + 1)
    vt = rngf(S, K, Y + 1, X)
    divg = rngf(S, K, Y + 1, X + 1, scale=1e-5)
    vort = rngf(S, K, Y, X, scale=1e-5)
    vfx, dvfx = (rngf(S, K, Y, X + 1) for _ in range(2))
    vfy, dvfy = (rngf(S, K, Y + 1, X) for _ in range(2))
    ref = d_sw_tail_jnp(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
                        grid, 30.0, cfg)
    got = jax.jit(
        lambda *a: d_sw_tail_pallas(*a, grid, 30.0, cfg)
    )(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy)
    for a, b, name in zip(ref, got, ("u", "v", "heat")):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3,
            err_msg=name,
        )


def test_updatedz_kernels_match_xla(grid, rngf):
    from pace_tpu.ops import nonhydro
    from pace_tpu.ops.updatedz_pallas import (
        flux_height_update_pallas,
        heights_from_delz_pallas,
        updatedz_c_pallas,
    )

    delz = -rngf(S, K, Y, X, scale=100.0, base=150.0)
    phis = rngf(S, Y, X, scale=2000.0, base=2000.0)
    xfx = rngf(S, K, Y, X + 1, scale=1e5)
    yfx = rngf(S, K, Y + 1, X, scale=1e5)

    zh_ref = jax.jit(
        lambda d, p: nonhydro.heights_from_delz(
            d.astype(jnp.float64), p.astype(jnp.float64)
        )
    )(delz, phis).astype(jnp.float32)
    zh = jax.jit(heights_from_delz_pallas)(delz, phis)
    np.testing.assert_allclose(
        np.asarray(zh_ref), np.asarray(zh), rtol=1e-5, atol=1e-2
    )

    zh_y = zh * 1.001
    # jnp twin replicated inline (the module function dispatches to the
    # kernel on this backend)
    from pace_tpu.ops.stencil_utils import (
        bcast_k,
        x_cell_to_left_iface,
        x_cell_to_right_iface,
        x_iface_diff,
        y_cell_to_left_iface,
        y_cell_to_right_iface,
        y_iface_diff,
    )

    def to_iface(f):
        mid = 0.5 * (f[..., :-1, :, :] + f[..., 1:, :, :])
        return jnp.concatenate(
            [f[..., :1, :, :], mid, f[..., -1:, :, :]], axis=-3
        )

    def jnp_updatedzc(zh_x, zh_yf, xfx_l, yfx_l):
        xfxi, yfxi = to_iface(xfx_l), to_iface(yfx_l)
        zx = jnp.where(
            xfxi > 0.0, x_cell_to_left_iface(zh_x), x_cell_to_right_iface(zh_x)
        )
        zy = jnp.where(
            yfxi > 0.0, y_cell_to_left_iface(zh_yf), y_cell_to_right_iface(zh_yf)
        )
        area_b = bcast_k(grid.area, zh_x)
        ra = area_b + x_iface_diff(xfxi) + y_iface_diff(yfxi)
        zh_new = (
            zh_x * area_b + x_iface_diff(zx * xfxi) + y_iface_diff(zy * yfxi)
        ) / ra
        zs = zh_x[..., -1:, :, :]
        ws = (zh_new[..., -1:, :, :] - zs)[..., 0, :, :] / 30.0
        return jnp.concatenate([zh_new[..., :-1, :, :], zs], axis=-3), ws

    ref_zh, ref_ws = jax.jit(jnp_updatedzc)(zh, zh_y, xfx, yfx)
    out_zh, out_ws = jax.jit(
        lambda *a: updatedz_c_pallas(*a, 30.0)
    )(zh, zh_y, xfx, yfx, grid.area)
    np.testing.assert_allclose(
        np.asarray(ref_zh), np.asarray(out_zh), rtol=2e-4, atol=1e-1
    )
    np.testing.assert_allclose(
        np.asarray(ref_ws), np.asarray(out_ws), rtol=2e-4, atol=1e-1
    )

    fx = rngf(S, K + 1, Y, X + 1, scale=1e6)
    fy = rngf(S, K + 1, Y + 1, X, scale=1e6)
    xfxi, yfxi = to_iface(xfx), to_iface(yfx)
    area_b = bcast_k(grid.area, zh)
    ra = area_b + x_iface_diff(xfxi) + y_iface_diff(yfxi)
    ref = (zh * area_b + x_iface_diff(fx) + y_iface_diff(fy)) / ra
    out = jax.jit(flux_height_update_pallas)(zh, fx, fy, xfxi, yfxi, grid.area)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=1e-1
    )

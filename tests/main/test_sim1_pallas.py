"""Pallas sim1 column kernel vs the lax.scan formulation (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from pace_tpu.ops.nonhydro import sim1_solver
from pace_tpu.ops.sim1_pallas import sim1_solver_pallas


def _column_setup(rng, S=2, K=12, Y=8, X=128):
    # hydrostatically-plausible columns: delp > 0, delz < 0, pt ~ 300 K
    delp = 50.0 + 100.0 * rng.rand(S, K, Y, X)
    pt = 270.0 + 40.0 * rng.rand(S, K, Y, X)
    pkz = 0.3 + 0.5 * rng.rand(S, K, Y, X)
    # delz from near-hydrostatic balance, perturbed
    delz = -(20.0 + 400.0 * rng.rand(S, K, Y, X))
    w = 2.0 * rng.randn(S, K, Y, X)
    ws = 0.5 * rng.randn(S, Y, X)
    f32 = jnp.float32
    return tuple(jnp.asarray(a, f32) for a in (w, delz, pt, delp, pkz, ws))


def test_matches_scan_formulation_f64(rng):
    """In float64 the kernel matches the scan formulation to round-off —
    the algorithms are identical up to summation order."""
    import jax

    with jax.enable_x64(True):
        w, delz, pt, delp, pkz, ws = (
            jnp.asarray(np.asarray(a), jnp.float64)
            for a in _column_setup(rng)
        )
        dt, ptop = 4.0, 300.0
        aw, adz, app = sim1_solver(w, delz, pt, delp, pkz, ws, dt, ptop)
        bw, bdz, bpp = sim1_solver_pallas(
            w, delz, pt, delp, pkz, ws, dt, ptop, interpret=True
        )
        np.testing.assert_allclose(np.asarray(aw), np.asarray(bw), rtol=1e-7)
        np.testing.assert_allclose(np.asarray(adz), np.asarray(bdz), rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(app), np.asarray(bpp), rtol=1e-6, atol=1e-6
        )


def test_matches_scan_formulation_f32(rng):
    """float32 agrees to the level set by cumsum-order round-off amplified
    through the near-cancelling p' = p_gas - p_hyd and the tridiagonal
    recurrence (verified exact in f64 above)."""
    w, delz, pt, delp, pkz, ws = _column_setup(rng)
    dt, ptop = 4.0, 300.0
    aw, adz, app = sim1_solver(w, delz, pt, delp, pkz, ws, dt, ptop)
    bw, bdz, bpp = sim1_solver_pallas(
        w, delz, pt, delp, pkz, ws, dt, ptop, interpret=True
    )
    assert np.abs(np.asarray(aw) - np.asarray(bw)).max() < 0.05
    assert np.abs(np.asarray(adz) - np.asarray(bdz)).max() < 0.05
    assert np.abs(np.asarray(app) - np.asarray(bpp)).max() < 5.0


def test_ragged_blocks(rng):
    """Y/X not multiples of the block size still produce correct interiors."""
    w, delz, pt, delp, pkz, ws = _column_setup(rng, S=1, K=6, Y=11, X=150)
    dt, ptop = 2.0, 100.0
    aw, adz, app = sim1_solver(w, delz, pt, delp, pkz, ws, dt, ptop)
    bw, bdz, bpp = sim1_solver_pallas(
        w, delz, pt, delp, pkz, ws, dt, ptop, interpret=True
    )
    assert np.abs(np.asarray(aw) - np.asarray(bw)).max() < 0.05
    assert np.abs(np.asarray(adz) - np.asarray(bdz)).max() < 0.05
    assert np.abs(np.asarray(app) - np.asarray(bpp)).max() < 5.0

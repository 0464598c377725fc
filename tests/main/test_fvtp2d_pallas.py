"""Fused Pallas fvtp2d kernel vs the XLA formulation (interpret mode).

The kernel is the same Lin & Rood (1996) scheme as :mod:`pace_tpu.ops.fvtp2d`
(it literally calls ``ppm._flux_1d`` with an in-VMEM shift). On TPU the
compiled kernel is bit-exact vs the XLA path (verified at C192, every hord);
on CPU the two separately-compiled graphs may differ by FMA/reassociation
round-off, so tests run in float64 and assert near-round-off agreement on
the consumed interior (the never-consumed outermost interface row/col is
zero in the kernel, unspecified in the XLA path).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.ops.fvtp2d import fvtp2d
from pace_tpu.ops.fvtp2d_pallas import fvtp2d_pallas


def _setup(rng, S=2, K=5, Y=20, X=20):
    def mk(dy=0, dx=0, scale=1.0):
        return jnp.asarray(
            (scale * rng.standard_normal((S, K, Y + dy, X + dx))).astype(
                np.float64
            )
        )

    q = mk() + 10.0
    crx = mk(dx=1, scale=0.3)
    cry = mk(dy=1, scale=0.3)
    # keep |diff(fx)| << area so the inner-update denominators are
    # well-conditioned (as in the real model, where fluxes are a small
    # fraction of the cell area per acoustic substep)
    xfx = mk(dx=1, scale=0.5)
    yfx = mk(dy=1, scale=0.5)
    mfx = mk(dx=1, scale=0.5)
    mfy = mk(dy=1, scale=0.5)
    area = jnp.asarray((10.0 + rng.random((S, Y, X))).astype(np.float64))
    return q, crx, cry, xfx, yfx, mfx, mfy, area


@pytest.mark.parametrize("hord", [1, 5, 6, 7, 8])
@pytest.mark.parametrize("use_mf", [False, True])
def test_matches_xla_interior(hord, use_mf):
    rng = np.random.default_rng(1234 + hord)
    q, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng)
    kw = dict(mfx=mfx, mfy=mfy) if use_mf else {}
    ref = fvtp2d(q, q, crx, cry, xfx, yfx, area, hord, **kw)
    fx, fy = fvtp2d_pallas(
        q, q, crx, cry, xfx, yfx, area, hord, interpret=True, **kw
    )
    # valid interiors: every interface except the outermost (wrap-around ring)
    b = 3
    sl = np.s_[:, :, b:-b, b:-b]
    np.testing.assert_allclose(
        np.asarray(ref.fx)[sl], np.asarray(fx)[sl], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ref.fy)[sl], np.asarray(fy)[sl], rtol=1e-12, atol=1e-12
    )


def test_multi_matches_single_field():
    """The fused multi-field kernel (shared winds staged once) must equal the
    per-field kernel for every field, mixed hords and mf/non-mf weighting —
    the d_sw pt/vorticity/w triple."""
    from pace_tpu.ops.fvtp2d_pallas import fvtp2d_multi_pallas

    rng = np.random.default_rng(99)
    q0, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng)
    q1 = q0 * 0.3 + 2.0
    q2 = jnp.flip(q0, axis=-1)
    fields = [(q0, q0, 6, True), (q1, q1, 5, False), (q2, q2, 6, True)]
    outs = fvtp2d_multi_pallas(
        fields, crx, cry, xfx, yfx, area, mfx=mfx, mfy=mfy, interpret=True
    )
    for (qx, qy, hord, use_mf), (fx, fy) in zip(fields, outs):
        kw = dict(mfx=mfx, mfy=mfy) if use_mf else {}
        rfx, rfy = fvtp2d_pallas(
            qx, qy, crx, cry, xfx, yfx, area, hord, interpret=True, **kw
        )
        np.testing.assert_allclose(
            np.asarray(rfx), np.asarray(fx), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(rfy), np.asarray(fy), rtol=1e-12, atol=1e-12
        )


def test_tracer_batched_matches_single_field():
    """The tracer-batched kernel (stacked nq axis, shared winds DMA-elided)
    must equal per-tracer single-field calls."""
    from pace_tpu.ops.fvtp2d_pallas import fvtp2d_tracer_pallas

    rng = np.random.default_rng(4242)
    q0, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng)
    q = jnp.stack([q0, q0 * 0.5 + 1.0, jnp.flip(q0, axis=-2)], axis=1)
    fx, fy = fvtp2d_tracer_pallas(
        q, q, crx, cry, xfx, yfx, area, mfx, mfy, 8, interpret=True
    )
    for t in range(q.shape[1]):
        rfx, rfy = fvtp2d_pallas(
            q[:, t], q[:, t], crx, cry, xfx, yfx, area, 8,
            mfx=mfx, mfy=mfy, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(rfx), np.asarray(fx[:, t]), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(rfy), np.asarray(fy[:, t]), rtol=1e-12, atol=1e-12
        )


def test_k_blocking_invariance():
    """Result must not depend on the K block size (block boundary handling)."""
    rng = np.random.default_rng(7)
    q, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng, K=7)
    outs = [
        fvtp2d_pallas(
            q, q, crx, cry, xfx, yfx, area, 8, block_k=bk, interpret=True
        )
        for bk in (1, 3, 7)
    ]
    for fx, fy in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(outs[0][0]), np.asarray(fx), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(outs[0][1]), np.asarray(fy), rtol=1e-12, atol=1e-12
        )


@pytest.mark.parametrize("kernel", ["multi", "tracer"])
def test_k_blocking_invariance_multi_tracer(kernel):
    """Partial final K-block handling in the multi/tracer kernels: K=5 with
    block_k=2 hits the cdiv-padded last block (K tests otherwise run with
    K < block_k and never exercise it)."""
    from pace_tpu.ops.fvtp2d_pallas import (
        fvtp2d_multi_pallas, fvtp2d_tracer_pallas,
    )

    rng = np.random.default_rng(17)
    q0, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng, K=5)
    if kernel == "multi":
        fields = [(q0, q0, 6, True), (q0 * 0.5, q0 * 0.5, 5, False)]
        outs = [
            fvtp2d_multi_pallas(
                fields, crx, cry, xfx, yfx, area, mfx=mfx, mfy=mfy,
                block_k=bk, interpret=True,
            )
            for bk in (2, 5)
        ]
        for (fx_a, fy_a), (fx_b, fy_b) in zip(outs[0], outs[1]):
            np.testing.assert_allclose(
                np.asarray(fx_a), np.asarray(fx_b), rtol=1e-12, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(fy_a), np.asarray(fy_b), rtol=1e-12, atol=1e-12
            )
    else:
        q = jnp.stack([q0, q0 * 0.5 + 1.0], axis=1)
        outs = [
            fvtp2d_tracer_pallas(
                q, q, crx, cry, xfx, yfx, area, mfx, mfy, 8,
                block_k=bk, interpret=True,
            )
            for bk in (2, 5)
        ]
        np.testing.assert_allclose(
            np.asarray(outs[0][0]), np.asarray(outs[1][0]),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(outs[0][1]), np.asarray(outs[1][1]),
            rtol=1e-12, atol=1e-12,
        )


def test_multi_rejects_mismatched_fields():
    rng = np.random.default_rng(3)
    q0, crx, cry, xfx, yfx, mfx, mfy, area = _setup(rng)
    q_small = q0[:, :, :-1, :]
    from pace_tpu.ops.fvtp2d_pallas import fvtp2d_multi_pallas

    with pytest.raises(ValueError, match="share shape"):
        fvtp2d_multi_pallas(
            [(q0, q0, 6, False), (q_small, q_small, 6, False)],
            crx, cry, xfx, yfx, area, interpret=True,
        )


def test_advect_tracers_batched_branch_parity():
    """ADVICE r2 #1: the batched tracer-advection branch (5-D halo update,
    dp broadcasts, 5-D interface sync) vs the lax.map path, end-to-end
    through advect_tracers, forced on CPU via the dispatch gate (the kernel
    itself runs in interpret mode)."""
    import jax

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.ops import _dispatch, tracer_advection

    spec = GridSpec(n_tile=12, npz=4, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    halo = mt.halo
    rng = np.random.default_rng(5)
    h = mt.spec.n_halo
    ny = nx = 12 + 2 * h
    S, K, NQ = 6, 4, 3

    def mk(dy=0, dx=0, scale=1.0):
        return jnp.asarray(
            scale * rng.standard_normal((S, K, ny + dy, nx + dx))
        )

    q = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((S, NQ, K, ny, nx))
    )
    dp1 = 50.0 + mk(scale=1.0)
    crx, cry = mk(dx=1, scale=0.2), mk(dy=1, scale=0.2)
    xfx, yfx = mk(dx=1, scale=1e7), mk(dy=1, scale=1e7)
    mfx, mfy = mk(dx=1, scale=1e8), mk(dy=1, scale=1e8)

    ref_q, ref_dp = tracer_advection.advect_tracers(
        q, dp1, crx, cry, xfx, yfx, mfx, mfy, halo, grid, hord=8, n_split=2
    )
    orig = _dispatch.use_pallas
    try:
        # advect_tracers imports the gate at call time (function-local
        # `from ._dispatch import use_pallas`), so this takes effect
        _dispatch.use_pallas = lambda name: name == "fvtp2d"
        out_q, out_dp = tracer_advection.advect_tracers(
            q, dp1, crx, cry, xfx, yfx, mfx, mfy, halo, grid,
            hord=8, n_split=2,
        )
    finally:
        _dispatch.use_pallas = orig
    assert jax.default_backend() == "cpu"
    np.testing.assert_allclose(
        np.asarray(ref_dp), np.asarray(out_dp), rtol=1e-12, atol=1e-12
    )
    b = h
    sl = np.s_[:, :, :, b:-b, b:-b]
    np.testing.assert_allclose(
        np.asarray(ref_q)[sl], np.asarray(out_q)[sl], rtol=1e-11, atol=1e-11
    )

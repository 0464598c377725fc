"""Tests for moist heat capacities (ops/moist_cv.py).

Mirrors the reference's moist_cv stencil semantics (SURVEY.md §2.3): cvm/cpm
are convex combinations of the dry-air, vapor, liquid and ice heat capacities
weighted by the water-species mixing ratios chosen by ``nwat``.
"""

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.models.fv3.state import TRACER_NAMES
from pace_tpu.ops.moist_cv import compute_q_con, moist_cp, moist_cv, water_species


def _make_q(rng, shape=(1, 4, 3, 3)):
    nq = len(TRACER_NAMES)
    q = rng.uniform(0.0, 2e-3, size=(shape[0], nq) + shape[1:]).astype(np.float32)
    return jnp.asarray(q)


def test_dry_limits():
    q = jnp.zeros((1, len(TRACER_NAMES), 2, 3, 3), dtype=jnp.float32)
    cvm, q_con = moist_cv(q, nwat=6)
    cpm, _ = moist_cp(q, nwat=6)
    assert np.allclose(cvm, constants.CV_AIR)
    assert np.allclose(cpm, constants.CP_AIR)
    assert np.allclose(q_con, 0.0)


def test_nwat6_formula():
    rng = np.random.default_rng(0)
    q = _make_q(rng)
    qv, ql, qs = water_species(q, nwat=6)
    idx = {n: i for i, n in enumerate(TRACER_NAMES)}
    np.testing.assert_allclose(qv, q[:, idx["qvapor"]])
    np.testing.assert_allclose(ql, q[:, idx["qliquid"]] + q[:, idx["qrain"]])
    np.testing.assert_allclose(
        qs, q[:, idx["qice"]] + q[:, idx["qsnow"]] + q[:, idx["qgraupel"]]
    )
    cvm, q_con = moist_cv(q, nwat=6)
    expect = (
        (1.0 - (qv + ql + qs)) * constants.CV_AIR
        + qv * constants.CV_VAPOR
        + ql * constants.C_LIQ
        + qs * constants.C_ICE
    )
    np.testing.assert_allclose(cvm, expect, rtol=1e-6)
    np.testing.assert_allclose(q_con, ql + qs, rtol=1e-6)
    np.testing.assert_allclose(compute_q_con(q, 6), ql + qs, rtol=1e-6)


def test_nwat_hierarchy():
    rng = np.random.default_rng(1)
    q = _make_q(rng)
    # fewer species -> less condensate counted
    qc6 = np.asarray(compute_q_con(q, 6))
    qc3 = np.asarray(compute_q_con(q, 3))
    qc2 = np.asarray(compute_q_con(q, 2))
    qc0 = np.asarray(compute_q_con(q, 0))
    assert (qc6 >= qc3).all() and (qc3 >= qc2).all()
    assert np.allclose(qc0, 0.0)
    # vapor raises cv (CV_VAPOR > CV_AIR), so moist cvm > dry everywhere
    cvm, _ = moist_cv(q, nwat=6)
    assert (np.asarray(cvm) > constants.CV_AIR).all()

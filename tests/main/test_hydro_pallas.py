"""Hydrostatic-interface column kernel vs the XLA path (ops/hydro_pallas.py).

Same formulas, same cumulative-summation order (ascending for pe,
descending for gz) — interpret-mode results must match to round-off.
"""

import jax.numpy as jnp
import numpy as np

from pace_tpu.ops.hydro_pallas import hydrostatic_interfaces_pallas
from pace_tpu.ops.pgrad import hydrostatic_interfaces

PTOP = 300.0


def _fields(K=13, Y=10, X=11, seed=0):
    rng = np.random.RandomState(seed)
    S = 6
    delp = jnp.asarray(100.0 + 50.0 * rng.rand(S, K, Y, X))
    pt = jnp.asarray(250.0 + 30.0 * rng.rand(S, K, Y, X))
    phis = jnp.asarray(1000.0 * rng.rand(S, Y, X))
    return delp, pt, phis


def test_hydro_kernel_matches_xla_all_outputs():
    delp, pt, phis = _fields()
    ref = hydrostatic_interfaces(delp, pt, phis, PTOP)
    out = hydrostatic_interfaces_pallas(
        delp, pt, phis, PTOP, need=("pe", "peln", "pk", "pkz", "gz"),
        interpret=True,
    )
    for a, b, name in zip(ref, out, ("pe", "peln", "pk", "pkz", "gz")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=0.0,
            err_msg=name,
        )


def test_hydro_kernel_pruned_outputs():
    delp, pt, phis = _fields(seed=3)
    ref = hydrostatic_interfaces(delp, pt, phis, PTOP)
    out = hydrostatic_interfaces_pallas(
        delp, pt, phis, PTOP, need=("pkz",), interpret=True
    )
    assert out[0] is None and out[2] is None and out[4] is None
    np.testing.assert_allclose(
        np.asarray(ref[3]), np.asarray(out[3]), rtol=1e-12
    )

"""kord remap scheme family: the selectors change the answer in the
documented direction (VERDICT r1 missing #2 / next-round item 3).

Reference: kord_mt/tm/tr/wz integer scheme selectors with distinct limiters
and one-sided top/bottom edge reconstruction
(`/root/reference/driver/examples/configs/baroclinic_c12.yaml:76-79` uses
6/6/8/9; the c192 perf config uses 9/-9). Round 1 collapsed kord to
sign(kord) and flattened the top/bottom two cells to piecewise constant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.ops.remapping import remap_field


def _columns(K=24, Y=4, X=5, seed=0, uniform=False):
    rng = np.random.RandomState(seed)
    pe1 = np.zeros((1, K + 1, Y, X))
    if uniform:
        dp = np.ones((1, K, Y, X))
    else:
        dp = 1.0 + 0.2 * rng.rand(1, K, Y, X)
    pe1[:, 1:] = np.cumsum(dp, axis=1)
    pe2 = pe1.copy()
    pe2[:, 1:-1] += 0.35 * np.sin(np.arange(1, K)[None, :, None, None])
    return jnp.asarray(pe1), jnp.asarray(pe2)


def test_kord_schemes_differ():
    """Each implemented scheme class is a genuinely distinct limiter: every
    pair of kord selectors disagrees on at least one of two targeted
    profiles — a rough random field (separates the monotone/overshoot/
    selective families and the strict-vs-loose noise triggers) and a
    near-zero delta spike (separates the positive-definite negative-kord
    variants, which only act when the parabola undershoots zero)."""
    pe1, pe2 = _columns(seed=1, uniform=True)
    K = pe1.shape[1] - 1
    rng = np.random.RandomState(3)
    rough = jnp.asarray(1.0 + 3.0 * rng.rand(1, K, 4, 5))
    spike_np = 1e-3 * np.ones((1, K, 4, 5))
    spike_np[:, K // 2] = 3.0
    spike = jnp.asarray(spike_np)
    kords = (4, 7, 8, 9, 10, -9)
    outs = {
        name: {k: np.asarray(remap_field(q, pe1, pe2, k)) for k in kords}
        for name, q in (("rough", rough), ("spike", spike))
    }
    for i, a in enumerate(kords):
        for b in kords[i + 1 :]:
            differs = any(
                not np.allclose(
                    outs[name][a], outs[name][b], rtol=1e-12, atol=1e-12
                )
                for name in outs
            )
            assert differs, (
                f"kord {a} and {b} produced identical remaps on every "
                "probe profile"
            )


def test_kord9_retains_smooth_extremum_better_than_kord4():
    """Selective monotonization (kord 9) must diffuse a smooth maximum less
    than the fully monotone scheme (kord 4) under repeated remapping."""
    pe1, pe2 = _columns(seed=2, uniform=True)
    K = pe1.shape[1] - 1
    p_mid = 0.5 * (np.asarray(pe1)[:, :-1] + np.asarray(pe1)[:, 1:])
    q0 = 10.0 * np.exp(-((p_mid - p_mid.mean()) ** 2) / 8.0) + 1.0

    def cycle(kord, n=8):
        q = jnp.asarray(q0)
        for _ in range(n):
            q = remap_field(q, pe1, pe2, kord)
            q = remap_field(q, pe2, pe1, kord)
        return np.asarray(q)

    q4 = cycle(4)
    q9 = cycle(9)
    loss4 = q0.max() - q4.max()
    loss9 = q0.max() - q9.max()
    assert loss9 < 0.75 * loss4, (
        f"kord 9 peak loss {loss9:.6f} not meaningfully better than "
        f"kord 4 loss {loss4:.6f} (initial {q0.max():.6f})"
    )
    # and kord 9 keeps nearly all of the original peak amplitude after
    # 16 remaps
    assert q9.max() >= 0.95 * q0.max()


def test_kord4_strictly_monotone_kord9_not_required():
    """kord 4 creates no new extrema even with the one-sided cubic edges."""
    pe1, pe2 = _columns(seed=3)
    rng = np.random.RandomState(4)
    q = rng.rand(1, pe1.shape[1] - 1, 4, 5)
    q[:, 5:8] += 4.0
    out = np.asarray(remap_field(jnp.asarray(q), pe1, pe2, 4))
    assert out.max() <= q.max() + 1e-12
    assert out.min() >= q.min() - 1e-12


def test_negative_kord_positive_definite():
    """kord -9 remains non-negative on a non-negative field with sharp
    structure (the tracer/temperature production setting)."""
    pe1, pe2 = _columns(seed=5)
    K = pe1.shape[1] - 1
    rng = np.random.RandomState(6)
    q = np.zeros((1, K, 4, 5))
    q[:, K // 2] = 3.0  # delta-like spike
    q += 1e-3 * rng.rand(*q.shape)
    out = np.asarray(remap_field(jnp.asarray(q), pe1, pe2, -9))
    assert out.min() >= -1e-12


def test_top_cell_linear_exact():
    """Stratosphere-diffusion regression (VERDICT r1 weak #6): with one-sided
    cubic edges, a linear-in-pressure profile is reproduced EXACTLY in the
    top and bottom cells. The round-1 piecewise-constant flattening aliased
    the top layers (extra diffusion where the sponge lives). Uniform source
    spacing: the one-sided formulas are the uniform-grid cubic coefficients
    (ops/remapping._one_sided_edges)."""
    pe1, pe2 = _columns(seed=7, uniform=True)
    p_mid1 = 0.5 * (np.asarray(pe1)[:, :-1] + np.asarray(pe1)[:, 1:])
    q = 2.0 * p_mid1 + 1.0
    p_mid2 = 0.5 * (np.asarray(pe2)[:, :-1] + np.asarray(pe2)[:, 1:])
    expect = 2.0 * p_mid2 + 1.0
    for kord in (7, 9, -9):
        out = np.asarray(remap_field(jnp.asarray(q), pe1, pe2, kord))
        np.testing.assert_allclose(
            out[:, 0], expect[:, 0], rtol=1e-12, err_msg=f"top cell kord={kord}"
        )
        np.testing.assert_allclose(
            out[:, -1], expect[:, -1], rtol=1e-12,
            err_msg=f"bottom cell kord={kord}",
        )


def test_pallas_interpret_matches_xla_per_kord(rng):
    """The Pallas kernel and XLA path share vertical_reconstruction: results
    agree for every scheme (interpret mode on CPU)."""
    from pace_tpu.ops.remap_pallas import remap_field_pallas

    pe1, pe2 = _columns(K=12, seed=8)
    q = jnp.asarray(rng.rand(1, 12, 4, 5))
    for kord in (4, 7, 9, -9):
        a = np.asarray(remap_field(q, pe1, pe2, kord))
        b = np.asarray(
            remap_field_pallas(q, pe1, pe2, kord, interpret=True)
        )
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_omga_computed_by_step():
    """omga (dp/dt) is computed in the remap stage (VERDICT r1 missing #3):
    after one dycore step from a perturbed baroclinic state it is finite,
    nonzero, and bounded by a physical magnitude."""
    import jax

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState

    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(npz=8, k_split=2, n_split=2, hydrostatic=True)
    core = DynamicalCore(grid, mt.halo, cfg, timestep=600.0)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float64
    )
    assert state.omga is not None
    out = core.step_dynamics(state)
    om = np.asarray(out.omga)[..., 3:-3, 3:-3]
    assert np.isfinite(om).all()
    assert np.abs(om).max() > 0.0
    assert np.abs(om).max() < 50.0  # Pa/s — generous physical bound

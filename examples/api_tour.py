"""API tour: the core building blocks in one runnable script.

The reference ships this as notebooks (driver/examples/notebooks/: Quantity/
state, stencil_definition, grid generation, serial_debugging); here it is a
plain script covering the same surfaces end-to-end:

  1. Quantity / sizer / factory   (docs/state.md)
  2. cube topology + partitioner  (docs/communication.md)
  3. grid generation              (docs/grid.md)
  4. halo exchange, scalar+vector (docs/communication.md)
  5. a FrozenStencil              (pace_tpu.dsl, reference stencil notebook)
  6. one dycore step + diagnosis  (docs/driver.md)

Run:  JAX_PLATFORMS=cpu python examples/api_tour.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.dsl import FrozenStencil, GridIndexing, StencilFactory
from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.parallel.partitioner import CubedSpherePartitioner, TilePartitioner
from pace_tpu.quantity import Quantity, QuantityFactory, SubtileGridSizer


def main():
    # --- 1. Quantity: metadata-carrying arrays --------------------------
    sizer = SubtileGridSizer.from_tile_params(nx_tile=12, ny_tile=12, nz=8)
    factory = QuantityFactory.from_backend(sizer, backend="jax")
    q = factory.zeros([constants.Z_DIM, constants.Y_DIM, constants.X_DIM],
                      units="K")
    print(f"Quantity dims={q.dims} units={q.units} shape={q.data.shape} "
          f"compute view={q.view[:].shape}")

    # --- 2. partitioner: pure layout math --------------------------------
    part = CubedSpherePartitioner(TilePartitioner((2, 2)))
    print(f"partitioner: total_ranks={part.total_ranks}, "
          f"rank 5 lives on tile {part.tile_index(5)}")

    # --- 3. grid generation ----------------------------------------------
    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    area = np.asarray(grid.area)[:, 3:-3, 3:-3]
    print(f"grid: cell areas {area.min():.3e}..{area.max():.3e} m^2, "
          f"sphere total = {area.sum():.4e} "
          f"(4 pi R^2 = {4*np.pi*constants.RADIUS**2:.4e})")

    # --- 4. halo exchange -------------------------------------------------
    halo = mt.halo
    f = jnp.asarray(np.arange(6 * 18 * 18, dtype=np.float32).reshape(6, 18, 18))
    fx = halo.update_scalar(f, fold="x")
    print(f"halo exchange: ghost column filled, e.g. fx[0, 8, :3] = "
          f"{np.asarray(fx)[0, 8, :3]}")

    # --- 5. a stencil through the DSL facade ------------------------------
    gi = GridIndexing.from_sizer(sizer)
    fac = StencilFactory(grid_indexing=gi)

    def laplacian(q):  # sees only the compute window
        return (
            -4.0 * q
            + jnp.roll(q, 1, -1) + jnp.roll(q, -1, -1)
            + jnp.roll(q, 1, -2) + jnp.roll(q, -1, -2)
        )

    st = fac.from_dims_halo(laplacian, ("z", "y", "x"))
    out = st(jnp.ones(gi.domain_full()))
    print(f"FrozenStencil: window {st.origin}+{st.domain}, "
          f"center value {float(out[0, 9, 9]):.1f} (interior Laplacian of 1 = 0)")

    # --- 6. one dycore step ------------------------------------------------
    cfg = DynamicalCoreConfig(npz=8, k_split=1, n_split=2, hydrostatic=True)
    core = DynamicalCore(grid, halo, cfg, timestep=300.0)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float32)
    out_state = core.step_dynamics(state)
    dps = np.asarray(out_state.delp)[..., 3:-3, 3:-3].sum(axis=-3)
    print(f"dycore step: surface pressure {dps.min():.0f}..{dps.max():.0f} Pa "
          f"+ ptop; all finite: {np.isfinite(dps).all()}")
    print("OK")


if __name__ == "__main__":
    main()

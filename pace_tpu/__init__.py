"""pace_tpu: a TPU-native FV3GFS/SHiELD-class atmospheric modeling framework.

Built from scratch on JAX/XLA/Pallas/shard_map with the capability surface of
NOAA-GFDL/pace (the reference is cited throughout as file:line into the pace repo).

Layering (TPU-first re-design of SURVEY.md §1):

- ``pace_tpu.constants`` / ``dtypes`` / ``quantity``: core containers & precision policy
- ``pace_tpu.parallel``: cubed-sphere partitioner, halo exchange (single-chip gather
  tables + multi-chip sharded collectives), mesh construction
- ``pace_tpu.grid``: gnomonic cubed-sphere grid generation and metric terms
- ``pace_tpu.ops``: the FV3 solver operators (PPM transport, shallow-water dynamics,
  Riemann solvers, vertical remap, damping) as pure jnp/Pallas functions
- ``pace_tpu.models``: DynamicalCore (pyFV3 analog) and Physics (pySHiELD analog)
- ``pace_tpu.driver``: YAML config, initialization registries, timestep loop,
  diagnostics, restart, safety checks (pace.driver analog)
"""

from . import constants, dtypes
from .quantity import Quantity, QuantityMetadata, zeros

__version__ = "0.1.0"

__all__ = [
    "constants",
    "dtypes",
    "Quantity",
    "QuantityMetadata",
    "zeros",
    "__version__",
]

"""FV3 solver operators as pure JAX functions on stacked per-shard arrays.

TPU-native re-design of the reference's stencil layer (pyFV3.stencils.*, see
SURVEY.md §2.3). Where the reference composes GT4Py gtscript stencils compiled
per-rank with edge specialization, every op here is a pure ``jnp`` function on
whole stacked arrays ``(S, [K,] Y, X)`` (S = all shards of the cube, Y/X
halo-inclusive). Edge behavior is data, not code: halo ghost cells are filled
with true neighbor-tile values by :mod:`pace_tpu.parallel.halo`, and edge
specialization (where required by the numerics) uses per-shard mask arrays.
XLA fuses the resulting elementwise/shift graphs; hot column solvers use
``lax.scan`` / Pallas kernels with the (Y, X) plane vectorized.
"""

from . import stencil_utils  # noqa: F401

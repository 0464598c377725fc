"""Device-mesh utilities: shard the stacked-shard axis over TPU chips.

Reference analog: the MPI world layout (`CubedSphereCommunicator.from_layout`,
reference driver.py:420-430) and the SLURM/mpirun launch model. On TPU the
whole cube is ONE array program; scaling out = sharding the leading stacked-
shard axis ``S = 6*ly*lx`` over a `jax.sharding.Mesh` and letting XLA turn
the halo slab copies into ICI collectives (SURVEY.md §2.6 "TPU mapping").

Usage::

    mesh = cube_mesh()                       # all local devices
    ly, lx = layout_for(mesh.size)           # smallest valid cube layout
    state = shard_state(state, mesh)         # S-axis sharded pytree
    grid = replicate(grid, mesh)             # metric terms on every chip
    step = jax.jit(core._step_impl)
    state = step(state, grid)                # SPMD across the mesh

Multi-host: call ``initialize_distributed()`` first (jax.distributed; the
`jax.distributed.initialize` env-driven form), then the same five lines run
unchanged — `jax.devices()` spans all hosts, DCN carries the inter-host
edges. This module is exercised on an 8-virtual-device CPU mesh by
tests/main/test_multichip.py and the driver-run `dryrun_multichip` gate.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import numpy as np

SHARD_AXIS = "shard"


def layout_for(n_devices: int, n_tile: Optional[int] = None) -> Tuple[int, int]:
    """Smallest layout (ly, lx) whose shard count 6*ly*lx divides evenly
    over ``n_devices`` (each device gets an integer number of shards).

    Fully general (any device count whose prime factors can be absorbed by
    6·ly·lx): searches all layouts up to ly,lx = n_devices, minimizing total
    shards and preferring square layouts. If ``n_tile`` is given, layouts
    that do not divide the tile extent are skipped (the HaloExchanger
    divisibility constraint)."""
    best: Optional[Tuple[int, int, int, int]] = None
    for ly in range(1, max(2, n_devices) + 1):
        for lx in range(1, max(2, n_devices) + 1):
            if (6 * ly * lx) % n_devices:
                continue
            if n_tile is not None and (n_tile % ly or n_tile % lx):
                continue
            cand = (6 * ly * lx, abs(ly - lx), ly, lx)
            if best is None or cand < best:
                best = cand
    if best is None:
        raise ValueError(
            f"no cube layout found for {n_devices} devices"
            + (f" with n_tile={n_tile}" if n_tile is not None else "")
        )
    return best[2], best[3]


# ----------------------------------------------------------------------
# active shard mesh: set by the driver/bench/dryrun before tracing so the
# halo layer can route exchanges through shard_map + ppermute
# (halo_shardmap.py) instead of relying on GSPMD's gather lowering.
# ----------------------------------------------------------------------
_ACTIVE_MESH = None


def set_shard_mesh(mesh) -> None:
    """Install ``mesh`` (a 1-D jax Mesh over SHARD_AXIS, or None) as the
    active multi-device mesh for halo exchanges."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_shard_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def shard_mesh(mesh):
    """Scoped form of set_shard_mesh."""
    prev = _ACTIVE_MESH
    set_shard_mesh(mesh)
    try:
        yield mesh
    finally:
        set_shard_mesh(prev)


def cube_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None):
    """A 1-D mesh over the stacked-shard axis."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), axis_names=(SHARD_AXIS,))


def _shard_sharding(mesh, ndim: int):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(SHARD_AXIS, *([None] * (ndim - 1))))


def _replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_state(pytree, mesh):
    """device_put every array leaf with its leading (S) axis sharded."""
    import jax

    def put(a):
        if a is None:
            return None
        a = jax.numpy.asarray(a)
        return jax.device_put(a, _shard_sharding(mesh, a.ndim))

    return jax.tree_util.tree_map(put, pytree)


def replicate(pytree, mesh):
    """device_put every array leaf fully replicated (grid/metric terms)."""
    import jax

    def put(a):
        if a is None:
            return None
        return jax.device_put(jax.numpy.asarray(a), _replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, pytree)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` pass-through (the
    reference's MPI_Init analog; coordinator/process env vars as documented
    by JAX). Safe to call when already initialized."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized

"""Gather / scatter between the stacked-shard layout and whole-tile arrays.

The reference ``Communicator.gather(quantity)`` assembles a rank's subtile
into the full tile on the tile root, and ``scatter`` distributes a tile to
its subtiles (reference docs/util/communication.rst TileCommunicator
sections; used e.g. by tests/mpi_54rank/test_grid_init.py:143-148 and the
NetCDFMonitor's gather-to-root writes). Here every shard lives on the
leading S axis of one array, so gather/scatter are pure host-side
reassembly — no communication.

Staggering follows parallel/halo.py: "center", "corner",
"y_interface" (D-grid u), "x_interface" (D-grid v). Interface-inclusive
axes own one extra point; neighboring shards hold identical values on the
shared line (the interface-sync invariant), so gather may take either
copy.
"""

from __future__ import annotations

import numpy as np

from .halo import interface_extents
from .partitioner import CubedSpherePartitioner


def gather_tiles(
    arr,
    partitioner: CubedSpherePartitioner,
    n_halo: int,
    stagger: str = "center",
) -> np.ndarray:
    """(S, ..., nsy+2h+ey, nsx+2h+ex) stacked shards -> (6, ..., NY+ey,
    NX+ex) whole tiles (interiors only; halos dropped)."""
    arr = np.asarray(arr)
    ly, lx = partitioner.layout
    h = n_halo
    ey, ex = interface_extents(stagger)
    nsy = arr.shape[-2] - 2 * h - ey
    nsx = arr.shape[-1] - 2 * h - ex
    if nsy <= 0 or nsx <= 0:
        raise ValueError(
            f"shard shape {arr.shape[-2:]} too small for n_halo={h} "
            f"stagger={stagger!r}"
        )
    out = np.zeros(
        arr.shape[1:-2] + (6, ly * nsy + ey, lx * nsx + ex), dtype=arr.dtype
    )
    # move the tile axis in front of the trailing (y, x)
    out = np.moveaxis(out, -3, 0)
    for t in range(6):
        for py in range(ly):
            for px in range(lx):
                s = partitioner.rank_of(t, py, px)
                out[
                    t,
                    ...,
                    py * nsy:(py + 1) * nsy + ey,
                    px * nsx:(px + 1) * nsx + ex,
                ] = arr[s, ..., h:h + nsy + ey, h:h + nsx + ex]
    return out


def scatter_tiles(
    tiles,
    partitioner: CubedSpherePartitioner,
    n_halo: int,
    stagger: str = "center",
) -> np.ndarray:
    """(6, ..., NY+ey, NX+ex) whole tiles -> (S, ..., nsy+2h+ey, nsx+2h+ex)
    stacked shards with zero-filled halos (run a halo update to fill them)."""
    tiles = np.asarray(tiles)
    ly, lx = partitioner.layout
    h = n_halo
    ey, ex = interface_extents(stagger)
    if (tiles.shape[-2] - ey) % ly or (tiles.shape[-1] - ex) % lx:
        raise ValueError(
            f"tile extent {tiles.shape[-2:]} (stagger={stagger!r}) not "
            f"evenly divisible by layout {(ly, lx)}"
        )
    nsy = (tiles.shape[-2] - ey) // ly
    nsx = (tiles.shape[-1] - ex) // lx
    S = 6 * ly * lx
    out = np.zeros(
        (S,) + tiles.shape[1:-2] + (nsy + 2 * h + ey, nsx + 2 * h + ex),
        dtype=tiles.dtype,
    )
    for t in range(6):
        for py in range(ly):
            for px in range(lx):
                s = partitioner.rank_of(t, py, px)
                out[s, ..., h:h + nsy + ey, h:h + nsx + ex] = tiles[
                    t,
                    ...,
                    py * nsy:(py + 1) * nsy + ey,
                    px * nsx:(px + 1) * nsx + ex,
                ]
    return out

"""Corner-fold patches: the y-fold of an exchanged field as (x-fold +
tiny corner pack) instead of a second full-size array.

The x and y corner-fold conventions of a halo exchange differ ONLY in the
four (h x h) corner ghost regions (see parallel/halo_slabs.py both-folds
notes; the reference mutates corners in place per sweep via copy_corners,
which a functional program cannot). ``CornerPatch`` carries the y-fold's
corner values packed [[SW, SE], [NW, NE]] into a (…, 2h, 2h) array;
``apply_corner_patch`` reconstructs the full y-fold. Pallas transport
kernels apply the patch in VMEM (fvtp2d_pallas._patch_qy) so the second
full-size array never exists in HBM — the round-5 halo-bytes attack.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CornerPatch(NamedTuple):
    """Marker pytree: corner pack of the y-fold, (…, 2h, 2h)."""

    data: jnp.ndarray


def apply_corner_patch(q, patch):
    """Full y-fold from the x-fold ``q`` and its corner pack (XLA path;
    the Pallas kernels apply the same writes to a VMEM scratch instead)."""
    if isinstance(patch, CornerPatch):
        patch = patch.data
    h = patch.shape[-1] // 2
    Y, X = q.shape[-2:]
    q = q.at[..., :h, :h].set(patch[..., :h, :h])
    q = q.at[..., :h, X - h:].set(patch[..., :h, h:])
    q = q.at[..., Y - h:, :h].set(patch[..., h:, :h])
    q = q.at[..., Y - h:, X - h:].set(patch[..., h:, h:])
    return q


def materialize_qy(qx, qy):
    """qy operand normalization: CornerPatch -> full array, else as-is."""
    if isinstance(qy, CornerPatch):
        return apply_corner_patch(qx, qy.data)
    return qy

"""Shift/slice helpers for writing stencils on halo-padded arrays.

Convention: fields are ``(..., Y, X)`` with ``n_halo`` ghost rows/cols on each
side. ``sx(a, n)`` returns the array whose value at index ``i`` is ``a[i + n]``
along the x (last) axis; ``sy`` the same along y. Shifts are implemented with
``jnp.roll``, so values wrap at the array boundary — harmless because stencils
only ever read shifted values inside the halo-covered region, and the outermost
halo ring is never consumed at full stencil width.
"""

from __future__ import annotations

import jax.numpy as jnp


def sx(a, n: int):
    """a shifted so result[..., i] = a[..., i + n]."""
    if n == 0:
        return a
    return jnp.roll(a, -n, axis=-1)


def sy(a, n: int):
    """a shifted so result[..., j, :] = a[..., j + n, :]."""
    if n == 0:
        return a
    return jnp.roll(a, -n, axis=-2)


def bcast_k(g, like):
    """Broadcast a 2-D-per-shard grid array (S, Y, X) against a field with
    extra axes between S and (Y, X), e.g. (S, K, Y, X) or (S, nq, K, Y, X)."""
    while g.ndim < like.ndim:
        g = jnp.expand_dims(g, 1)
    return g


def swap_xy(a):
    """Transpose the trailing (Y, X) axes."""
    return jnp.swapaxes(a, -1, -2)


# ---------------------------------------------------------------------------
# Staggering helpers. Convention: interface index ii along an axis lies
# between cells ii-1 and ii; interface arrays are one longer than cell arrays.
# Pads use edge mode so outer-halo values stay finite (never consumed).
# ---------------------------------------------------------------------------

def _pad(a, axis: int, before: int, after: int):
    """Edge-replicating pad, written as a concat of slices: identical to
    jnp.pad(mode="edge") but also lowers inside Pallas TPU kernels (Mosaic
    has no edge-mode pad; the fused pgrad kernel runs these helpers
    in-kernel)."""
    ax = axis % a.ndim
    first = [slice(None)] * a.ndim
    first[ax] = slice(0, 1)
    last = [slice(None)] * a.ndim
    last[ax] = slice(a.shape[ax] - 1, a.shape[ax])
    parts = (
        [a[tuple(first)]] * before + [a] + [a[tuple(last)]] * after
    )
    return jnp.concatenate(parts, axis=ax) if len(parts) > 1 else a


def x_cell_to_left_iface(g):
    """left[..., ii] = g[..., ii-1]: cell value left of x-interface ii.
    (..., X) -> (..., X+1)."""
    return _pad(g, -1, 1, 0)


def x_cell_to_right_iface(g):
    """right[..., ii] = g[..., ii]: cell value right of x-interface ii."""
    return _pad(g, -1, 0, 1)


def y_cell_to_left_iface(g):
    """left[..., jj, :] = g[..., jj-1, :]. (..., Y, X) -> (..., Y+1, X)."""
    return _pad(g, -2, 1, 0)


def y_cell_to_right_iface(g):
    return _pad(g, -2, 0, 1)


def x_iface_diff(f):
    """Per-cell divergence contribution f[..., ii] - f[..., ii+1]:
    (..., X+1) -> (..., X). Positive f = flow in +x, so in-minus-out."""
    return f[..., :-1] - f[..., 1:]


def y_iface_diff(f):
    """f[..., jj, :] - f[..., jj+1, :]: (..., Y+1, X) -> (..., Y, X)."""
    return f[..., :-1, :] - f[..., 1:, :]


def x_iface_to_cell(f):
    """Average the two x-interfaces of each cell: (..., X+1) -> (..., X)."""
    return 0.5 * (f[..., :-1] + f[..., 1:])


def y_iface_to_cell(f):
    return 0.5 * (f[..., :-1, :] + f[..., 1:, :])

"""Cube-corner (3-valent point) corrections for corner-registered quantities.

Eight points of the cubed sphere join only THREE tiles; any stencil assuming
four quadrants around a corner point reads the folded (duplicated) quadrant
and is O(1) wrong there. The reference handles this with per-rank edge/corner
code regions (sw_corner/se_corner/... branches in its stencils); here the
corrections are masked array ops driven by the GridData corner masks.

Quadrant offsets relative to corner (jj, ii): cell (jj+a, ii+b) with
(a, b) in {(0,0)=NE, (0,-1)=NW, (-1,0)=SE, (-1,-1)=SW}. The folded quadrant
per corner type: SW corner -> SW quadrant, SE -> SE, NW -> NW, NE -> NE.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil_utils import (
    bcast_k,
    sx,
    sy,
    x_cell_to_right_iface,
    y_cell_to_right_iface,
)

# folded (duplicated) quadrant per corner kind
_FOLDED = {"sw": (-1, -1), "se": (-1, 0), "nw": (0, -1), "ne": (0, 0)}
_QUADRANTS = ((0, 0), (0, -1), (-1, 0), (-1, -1))


def cell_at_corner(q, a: int, b: int):
    """Cell value q[.., jj+a, ii+b] registered at corner (jj, ii)."""
    return y_cell_to_right_iface(x_cell_to_right_iface(sy(sx(q, b), a)))


def _corner_mask(grid, kind: str, like):
    m = {
        "sw": grid.corner_sw,
        "se": grid.corner_se,
        "nw": grid.corner_nw,
        "ne": grid.corner_ne,
    }[kind]
    return bcast_k(m, like)


def _cell_read(q, jj: int, ii: int, a: int, b: int):
    """Value ``cell_at_corner(q, a, b)`` at the single corner point (jj, ii).

    Mirrors the full-array path exactly: the sx/sy rolls wrap (modulo) and
    the right-iface pad yields 0 beyond the last cell row/column.
    """
    Y, X = q.shape[-2], q.shape[-1]
    if jj >= Y or ii >= X:
        return jnp.zeros_like(q[..., 0, 0])
    return q[..., (jj + a) % Y, (ii + b) % X]


def _set_point(out, val, own, jj: int, ii: int):
    """out[..., jj, ii] <- val on the shards flagged in ``own`` (static)."""
    cur = out[..., jj, ii]
    if not all(own):
        import numpy as np

        m = np.asarray(own, dtype=bool).reshape(
            (len(own),) + (1,) * (cur.ndim - 1)
        )
        val = jnp.where(m, val, cur)
    return out.at[..., jj, ii].set(val)


def average_3_quadrants(q, grid, default):
    """Replace cube-corner points of a corner field ``default`` (built from
    4-quadrant center averages of ``q``) with the mean over the 3 REAL
    adjacent cells.

    Corner points are a STATIC, tiny set per shard layout (grid.corner_table)
    — the fix is a handful of point reads + in-place single-point updates,
    not full-array masked selects (which cost ~150x more HBM traffic: every
    masked select rereads several shifted copies of the whole field)."""
    table = getattr(grid, "corner_table", ())
    out = default
    if table:
        for kind, jj, ii, own in table:
            folded = _FOLDED[kind]
            acc = None
            for (a, b) in _QUADRANTS:
                if (a, b) == folded:
                    continue
                val = _cell_read(q, jj, ii, a, b)
                acc = val if acc is None else acc + val
            out = _set_point(out, acc / 3.0, own, jj, ii)
        return out
    for kind in ("sw", "se", "nw", "ne"):
        folded = _FOLDED[kind]
        acc = None
        for (a, b) in _QUADRANTS:
            if (a, b) == folded:
                continue
            val = cell_at_corner(q, a, b)
            acc = val if acc is None else acc + val
        mask = _corner_mask(grid, kind, out)
        out = jnp.where(mask > 0.5, acc / 3.0, out)
    return out


def extrapolate_3_to_corner(q, grid, default):
    """Replace cube-corner points of an interpolated corner field with the
    mean of the 3 one-sided diagonal extrapolations (the analog of the
    reference a2b_ord4 extrap_corner treatment). Static-point fast path as
    in :func:`average_3_quadrants`."""
    table = getattr(grid, "corner_table", ())
    out = default
    if table:
        for kind, jj, ii, own in table:
            folded = _FOLDED[kind]
            acc = None
            for (a, b) in _QUADRANTS:
                if (a, b) == folded:
                    continue
                a2 = a + (1 if a >= 0 else -1)
                b2 = b + (1 if b >= 0 else -1)
                a3 = a + (2 if a >= 0 else -2)
                b3 = b + (2 if b >= 0 else -2)
                # quadratic one-sided diagonal extrapolation (Lagrange at
                # the corner of centers at 0.5, 1.5, 2.5 diagonal indices)
                ext = (
                    1.875 * _cell_read(q, jj, ii, a, b)
                    - 1.25 * _cell_read(q, jj, ii, a2, b2)
                    + 0.375 * _cell_read(q, jj, ii, a3, b3)
                )
                acc = ext if acc is None else acc + ext
            out = _set_point(out, acc / 3.0, own, jj, ii)
        return out
    for kind in ("sw", "se", "nw", "ne"):
        folded = _FOLDED[kind]
        acc = None
        for (a, b) in _QUADRANTS:
            if (a, b) == folded:
                continue
            a2 = a + (1 if a >= 0 else -1)
            b2 = b + (1 if b >= 0 else -1)
            a3 = a + (2 if a >= 0 else -2)
            b3 = b + (2 if b >= 0 else -2)
            ext = (
                1.875 * cell_at_corner(q, a, b)
                - 1.25 * cell_at_corner(q, a2, b2)
                + 0.375 * cell_at_corner(q, a3, b3)
            )
            acc = ext if acc is None else acc + ext
        mask = _corner_mask(grid, kind, out)
        out = jnp.where(mask > 0.5, acc / 3.0, out)
    return out


def dedup_corner_divergence(uf, vf, grid, c4):
    """Fix the 4-leg corner divergence at cube corners: the two legs that
    cross the folded face represent the SAME physical crossing; keep their
    average instead of their sum. ``c4`` is the uncorrected 4-leg outflow.
    Static-point fast path as in :func:`average_3_quadrants`."""
    from .stencil_utils import x_cell_to_left_iface, y_cell_to_left_iface

    table = getattr(grid, "corner_table", ())
    if table:

        def read(arr, jj, ii):
            # iface-pad semantics: 0 outside the array
            Y, X = arr.shape[-2], arr.shape[-1]
            if 0 <= jj < Y and 0 <= ii < X:
                return arr[..., jj, ii]
            return jnp.zeros_like(arr[..., 0, 0])

        out = c4
        for kind, jj, ii, own in table:
            if kind == "sw":
                dup = -read(uf, jj, ii - 1) - read(vf, jj - 1, ii)
            elif kind == "se":
                dup = read(uf, jj, ii) - read(vf, jj - 1, ii)
            elif kind == "nw":
                dup = -read(uf, jj, ii - 1) + read(vf, jj, ii)
            else:  # ne
                dup = read(uf, jj, ii) + read(vf, jj, ii)
            out = _set_point(out, c4[..., jj, ii] - 0.5 * dup, own, jj, ii)
        return out

    uf_r = x_cell_to_right_iface(uf)
    uf_l = x_cell_to_left_iface(uf)
    vf_t = y_cell_to_right_iface(vf)
    vf_b = y_cell_to_left_iface(vf)
    dups = {
        "sw": -uf_l - vf_b,
        "se": uf_r - vf_b,
        "nw": -uf_l + vf_t,
        "ne": uf_r + vf_t,
    }
    out = c4
    for kind, dup in dups.items():
        mask = _corner_mask(grid, kind, out)
        out = jnp.where(mask > 0.5, c4 - 0.5 * dup, out)
    return out

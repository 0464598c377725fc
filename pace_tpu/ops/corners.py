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


def average_3_quadrants(q, grid, default):
    """Replace cube-corner points of a corner field ``default`` (built from
    4-quadrant center averages of ``q``) with the mean over the 3 REAL
    adjacent cells."""
    out = default
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
    reference a2b_ord4 extrap_corner treatment)."""
    out = default
    for kind in ("sw", "se", "nw", "ne"):
        folded = _FOLDED[kind]
        acc = None
        for (a, b) in _QUADRANTS:
            if (a, b) == folded:
                continue
            a2 = a + (1 if a >= 0 else -1)
            b2 = b + (1 if b >= 0 else -1)
            ext = 1.5 * cell_at_corner(q, a, b) - 0.5 * cell_at_corner(q, a2, b2)
            acc = ext if acc is None else acc + ext
        mask = _corner_mask(grid, kind, out)
        out = jnp.where(mask > 0.5, acc / 3.0, out)
    return out


def dedup_corner_divergence(uf, vf, grid, c4):
    """Fix the 4-leg corner divergence at cube corners: the two legs that
    cross the folded face represent the SAME physical crossing; keep their
    average instead of their sum. ``c4`` is the uncorrected 4-leg outflow."""
    from .stencil_utils import x_cell_to_left_iface, y_cell_to_left_iface

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

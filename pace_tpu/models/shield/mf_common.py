"""Shared mass-flux transport discretization for the convection/EDMF schemes.

The environment tendency of a plume-transported variable is applied in flux
form, dX/dt = g * d/dp [ M * (X_u - X_env) ], on interfaces: the updraft
value is taken from the layer below each interface (rising air), the
environment value upwind from the layer above (compensating subsidence).
Any interface mass-flux profile that vanishes at the top and bottom
boundaries conserves the column integral of X to roundoff.

Index convention: k increases DOWNWARD; layer k sits between interfaces k
(top) and k+1 (bottom); all arrays have the k axis at position -3.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import constants


def hydrostatic_heights(tv, pe):
    """Heights above the surface from hydrostatic integration of log-p.

    Args: virtual temperature ``tv`` (.., K, Y, X) — caller chooses whether
    condensate loading is included — and interface pressure ``pe``
    (.., K+1, Y, X). Returns (z_mid, z_if, dz), all in meters, dz > 0.
    """
    kax = -3
    peln = jnp.log(pe)
    dz = constants.RDGAS * tv / constants.GRAV * (
        peln[..., 1:, :, :] - peln[..., :-1, :, :]
    )
    z_top_if = jnp.flip(jnp.cumsum(jnp.flip(dz, axis=kax), axis=kax), axis=kax)
    z_if = jnp.concatenate(
        [z_top_if, jnp.zeros_like(z_top_if[..., :1, :, :])], axis=kax
    )
    z_mid = 0.5 * (z_if[..., :-1, :, :] + z_if[..., 1:, :, :])
    return z_mid, z_if, dz


def flux_form_divergence(m_if, x_u, x_env, delp):
    """Tendency g * d/dp [ M (x_u - x_env) ] per layer.

    Args: ``m_if`` interface mass flux (.., K+1, Y, X), positive upward, MUST
    be zero at interfaces 0 and K for conservation; ``x_u``/``x_env`` layer
    fields (.., K, Y, X); ``delp`` layer pressure thickness.
    """
    kax = -3
    # interface i <- layer i (below); i=K has no layer below but M=0 there
    xu_if = jnp.concatenate([x_u, x_u[..., -1:, :, :]], axis=kax)
    # interface i <- layer i-1 (above); i=0 has none but M=0 there
    xe_if = jnp.concatenate([x_env[..., :1, :, :], x_env], axis=kax)
    f = m_if * (xu_if - xe_if)
    return constants.GRAV * (f[..., 1:, :, :] - f[..., :-1, :, :]) / delp

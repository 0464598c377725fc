"""Moist heat capacities and condensate loading.

TPU-native analog of the reference's ``pyFV3/stencils/moist_cv.py`` (see
SURVEY.md §2.3: "moist_cv — copy/adjust helpers, moist heat capacities").
The reference computes, per grid cell, the moist specific heats

    cvm = (1 - (qv + q_con)) * CV_AIR + qv * CV_VAPOR + q_liq * C_LIQ
          + q_sol * C_ICE
    cpm = (1 - (qv + q_con)) * CP_AIR + qv * CP_VAPOR + q_liq * C_LIQ
          + q_sol * C_ICE

with the liquid/solid split depending on ``nwat`` (number of prognostic
water species).  These feed the total-energy fixer (``consv_te``), the
dissipation heating (``temperature_adjust``, d_con) and the
Lagrangian-to-Eulerian remap of temperature.

Everything here is a pure elementwise jnp function of the stacked tracer
block ``q`` with shape ``(S, nq, K, Y, X)`` (tracer axis indexed by
``TRACER_NAMES``) — it fuses into whatever consumer XLA compiles it into.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .. import constants
from ..models.fv3.state import TRACER_NAMES

_IV = TRACER_NAMES.index("qvapor")
_IL = TRACER_NAMES.index("qliquid")
_II = TRACER_NAMES.index("qice")
_IR = TRACER_NAMES.index("qrain")
_IS = TRACER_NAMES.index("qsnow")
_IG = TRACER_NAMES.index("qgraupel")


def water_species(q, nwat: int = 6):
    """(qv, q_liq, q_sol) given the stacked tracer block and ``nwat``.

    nwat=6: liq = qliquid + qrain, sol = qice + qsnow + qgraupel (GFDL MP)
    nwat=3: liq = qliquid, sol = qice
    nwat=2: liq = qliquid, sol = 0
    nwat=1/0: vapor only / dry
    """
    zeros = jnp.zeros_like(q[:, 0])
    qv = q[:, _IV] if nwat >= 1 else zeros
    if nwat >= 6:
        q_liq = q[:, _IL] + q[:, _IR]
        q_sol = q[:, _II] + q[:, _IS] + q[:, _IG]
    elif nwat >= 3:
        q_liq = q[:, _IL]
        q_sol = q[:, _II]
    elif nwat == 2:
        q_liq = q[:, _IL]
        q_sol = zeros
    else:
        q_liq = zeros
        q_sol = zeros
    return qv, q_liq, q_sol


def compute_q_con(q, nwat: int = 6):
    """Total condensate loading q_con = q_liq + q_sol (reference ``qcon`` field)."""
    _, q_liq, q_sol = water_species(q, nwat)
    return q_liq + q_sol


def moist_cv(q, nwat: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cvm, q_con): moist heat capacity at constant volume [J/kg/K].

    Reference: ``pyFV3/stencils/moist_cv.py`` ``moist_cv_nwat6_fn`` family.
    """
    qv, q_liq, q_sol = water_species(q, nwat)
    q_con = q_liq + q_sol
    cvm = (
        (1.0 - (qv + q_con)) * constants.CV_AIR
        + qv * constants.CV_VAPOR
        + q_liq * constants.C_LIQ
        + q_sol * constants.C_ICE
    )
    return cvm, q_con


def moist_cp(q, nwat: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cpm, q_con): moist heat capacity at constant pressure [J/kg/K]."""
    qv, q_liq, q_sol = water_species(q, nwat)
    q_con = q_liq + q_sol
    cpm = (
        (1.0 - (qv + q_con)) * constants.CP_AIR
        + qv * constants.CP_VAPOR
        + q_liq * constants.C_LIQ
        + q_sol * constants.C_ICE
    )
    return cpm, q_con

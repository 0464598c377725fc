"""SHiELD physics (TPU-native pySHiELD analog).

Reference surface (SURVEY.md §2.4): ``Physics(...)`` driver currently running
GFDL cloud microphysics, ``PhysicsState``, ``PHYSICS_PACKAGES`` registry,
``update_atmos_state`` coupling."""

from .physics import PHYSICS_PACKAGES, Physics  # noqa: F401

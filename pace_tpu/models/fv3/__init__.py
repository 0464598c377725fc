"""FV3 dynamical core (TPU-native pyFV3 analog)."""

from .acoustics import AcousticConfig, acoustic_loop  # noqa: F401

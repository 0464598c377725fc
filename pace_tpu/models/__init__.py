"""Model families: pyFV3-equivalent dynamical core and pySHiELD-equivalent
physics, built on pace_tpu.ops / pace_tpu.parallel / pace_tpu.grid."""

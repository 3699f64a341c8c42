"""Experiment drivers.

Importing this package enables the persistent XLA compilation cache: every
driver builds the same scanned rollouts / Pallas kernels, and re-paying
their compile on each process launch (up to ~4 min cold through the
remote-compile tunnel) would dominate short runs.
"""

from nbody_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

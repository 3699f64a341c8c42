"""Persistent XLA compilation cache.

The reference has no compile step; here every experiment driver pays
XLA/Mosaic compilation (tens of seconds for scanned Pallas rollouts, ~4 min
cold through the remote-compile tunnel) on every *process* launch. Enabling
JAX's persistent cache makes recompiles across processes disk hits instead.

Call :func:`enable_persistent_cache` before building jitted programs; it is
a no-op when the running JAX build rejects the config (never fatal).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/nbody_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    :param path: cache directory (default ``~/.cache/nbody_tpu_xla``;
        override with ``NBODY_TPU_COMPILE_CACHE``).
    :return: the directory in use, or None if the cache could not be enabled.
    """
    path = path or os.environ.get("NBODY_TPU_COMPILE_CACHE", _DEFAULT)
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even quick compiles: the tunnel round-trip dwarfs them
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return path
    except Exception:  # pragma: no cover - depends on the jax build
        return None

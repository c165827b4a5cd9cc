"""Persistent XLA compilation cache.

TPU compiles in this toolchain go through a remote-compile helper and
cost 20-40 s per program; the JAX persistent cache eliminates that on
every process restart with an identical program (measured on the real
chip: 0.33 s cached vs 40.9 s uncached for a ~40 s compile). The CLI
enables it by default (``python -m surya_tpu ...``); library users call
:func:`enable_compilation_cache` themselves. Opt out with
``SURYA_NO_COMPILE_CACHE=1``.

No reference counterpart (torch caches kernels in-process only).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "surya_tpu", "xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on the JAX persistent compilation cache at ``path``
    (default ``~/.cache/surya_tpu/xla``). Returns the cache dir, or
    None if disabled via ``SURYA_NO_COMPILE_CACHE``.

    Safe to call before or after other jax use; only sets config, so
    it never fails the caller — cache write errors degrade to
    uncached compiles inside jax.
    """
    if os.environ.get("SURYA_NO_COMPILE_CACHE", "").lower() not in (
            "", "0", "false", "no"):
        return None
    import jax

    path = path or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:  # unwritable HOME: degrade, don't crash the CLI
        print(f"[cache] compilation cache disabled ({e})")
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERY program (jax's defaults skip sub-1s compiles — but
    # through the remote-compile tunnel even "cheap" programs cost
    # seconds of RPC, so nothing is too small to cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path

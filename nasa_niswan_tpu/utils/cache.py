"""Persistent XLA compilation cache.

The canonical programs here (training step, rollout scan, Pallas cell)
take 20-90 s to compile on a TPU backend; every CLI invocation, bench run,
and restart pays it again unless compiled executables persist.  JAX ships
a content-addressed on-disk cache — this module turns it on with sensible
defaults (opt out with NISWAN_NO_COMPILE_CACHE=1, redirect with
NISWAN_COMPILE_CACHE_DIR).

The reference has no equivalent (PyTorch eager + cuDNN autotune); this is
part of the TPU-native runtime story, alongside jit + AOT lowering.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nasa_niswan_tpu/xla")


def enable_compilation_cache(
    cache_dir: str | None = None, *, min_compile_secs: float | None = None
) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or None when disabled via
    NISWAN_NO_COMPILE_CACHE.  Safe to call before or after backend
    initialization; programs compiled earlier in the process simply are
    not cached.
    """
    if os.environ.get("NISWAN_NO_COMPILE_CACHE"):
        return None
    if min_compile_secs is None:
        # CI override: CPU-backend subprocess tests recompile many 1-5 s
        # programs per run; with a LOCAL disk cache a low threshold is a
        # clear win there.  The 5 s default protects the remote-compile
        # TPU tunnel, where caching tiny programs measured 14x slower.
        # An explicit argument always wins over the env var.
        min_compile_secs = float(
            os.environ.get("NISWAN_COMPILE_CACHE_MIN_S", 5.0)
        )
    cache_dir = (
        cache_dir
        or os.environ.get("NISWAN_COMPILE_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache only genuinely expensive programs (the rollout scan, the train
    # step, Pallas cells: 20-90 s compiles).  Caching tiny programs is a
    # measured LOSS through a remote-compile TPU tunnel — every lookup and
    # write is a round trip, and a small-program-heavy CLI run went 14x
    # slower with thresholds at zero.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return cache_dir

"""Platform selection helper.

On this image the axon TPU plugin registers itself from sitecustomize at
interpreter boot and overrides ``JAX_PLATFORMS``. Entry scripts call
:func:`ensure_platform` so a user-supplied ``JAX_PLATFORMS=cpu`` (or
``DIQT_PLATFORM=cpu``) still wins.
"""

from __future__ import annotations

import os


def ensure_platform():
    enable_persistent_cache()
    want = os.environ.get("DIQT_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass


def enable_persistent_cache(path: str = "/tmp/jax_cache"):
    """Point XLA's persistent compilation cache at a shared directory.

    The flagship sampler takes minutes to compile (the segmented EDM
    sampler compiles 4x more launch segments still); without this every
    `test.py`/`test_all.py`/`train.py` invocation pays it again — the
    cache turns that into a one-time cost per (shape, config) across all
    entries and bench runs. ``JAX_COMPILATION_CACHE_DIR`` in the
    environment wins; set ``DIQT_NO_CACHE=1`` to disable."""
    if os.environ.get("DIQT_NO_CACHE"):
        return
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    # default threshold only persists compiles >1 min; sampler segments
    # compile in seconds each but add up across segments/entries
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

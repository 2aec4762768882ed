"""Platform selection helper.

On this image the axon TPU plugin registers itself from sitecustomize at
interpreter boot and overrides ``JAX_PLATFORMS``. Entry scripts call
:func:`ensure_platform` so a user-supplied ``JAX_PLATFORMS=cpu`` (or
``DIQT_PLATFORM=cpu``) still wins.
"""

from __future__ import annotations

import os


def ensure_platform():
    want = os.environ.get("DIQT_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass

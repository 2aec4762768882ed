"""Opt-in NaN / anomaly detection (SURVEY.md §5).

The reference globally enables ``torch.autograd.set_detect_anomaly(True)``
(imagen_pytorch3D.py:34) — costly and always-on. The JAX analog is
``jax.config.debug_nans`` plus explicit finite-checks, exposed here behind
explicit calls so production runs pay nothing.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True):
    """Globally trap NaNs in jitted computations (recompiles affected fns)."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_check_scope():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_tree_finite(tree, name: str = "tree"):
    """Host-side finite check over a pytree (use in tests / debug loops)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:8]}")

"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native analog of a fake multi-process cluster (SURVEY.md §4):
``xla_force_host_platform_device_count`` gives 8 CPU devices so sharding /
collective code paths are exercised without TPU hardware.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin registers itself from sitecustomize at interpreter
# boot and overrides jax_platforms — force CPU back via the config API
# (env vars alone are clobbered by the plugin's register()).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import diffusioniqt_tpu` works without install
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# persistent compilation cache — keeps repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

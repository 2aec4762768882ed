"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dryrun_multichip_executes():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_data_parallel_grad_matches_single_device():
    """pjit-sharded loss/grad == replicated loss/grad."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffusioniqt_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(("data",), (8,))
    w = jnp.ones((4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-5)


def test_param_shardings_rules():
    from diffusioniqt_tpu.parallel.mesh import create_mesh
    from diffusioniqt_tpu.parallel.sharding import param_shardings

    mesh = create_mesh(("data", "model"), (4, 2))
    params = {
        "big_kernel": jnp.zeros((3, 3, 3, 64, 128)),
        "small_bias": jnp.zeros((8,)),
        "odd_out": jnp.zeros((64, 63)),  # not divisible by model=2
    }
    shardings = param_shardings(params, mesh, min_size=1024)
    assert shardings["big_kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, None, "model"
    )
    assert shardings["small_bias"].spec == jax.sharding.PartitionSpec()
    assert shardings["odd_out"].spec == jax.sharding.PartitionSpec()

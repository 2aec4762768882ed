"""utils/flops.py — analytic matmul/conv FLOP walker.

Exists because TPU ``cost_analysis()`` counts a scan body once (measured
20x under-report on the 20-step sampler); bench.py's roofline fields use
this walker instead.
"""

import jax
import jax.numpy as jnp

from diffusioniqt_tpu.utils.flops import matmul_flops


def test_dot_closed_form():
    a = jnp.zeros((16, 32))
    b = jnp.zeros((32, 8))
    assert matmul_flops(lambda x, y: x @ y, a, b) == 2 * 16 * 8 * 32


def test_conv_closed_form():
    k = jnp.zeros((3, 3, 3, 4, 8), jnp.float32)
    x = jnp.zeros((2, 8, 8, 8, 4))

    def f(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # 2 * prod(out) * k^3 * C_in
    assert matmul_flops(f, x) == 2.0 * (2 * 8 * 8 * 8 * 8) * (27 * 4)


def test_scan_multiplies_body():
    k = jnp.zeros((3, 3, 3, 4, 4), jnp.float32)
    x = jnp.zeros((2, 8, 8, 8, 4))

    def one(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def scanned(v):
        c, _ = jax.lax.scan(lambda c, _: (one(c), None), v, None, length=7)
        return c

    assert matmul_flops(scanned, x) == 7 * matmul_flops(one, x)


def test_jit_and_grad_traced_through():
    k = jnp.zeros((3, 3, 3, 4, 4), jnp.float32)
    x = jnp.zeros((2, 8, 8, 8, 4))

    def one(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fwd = matmul_flops(one, x)
    assert matmul_flops(jax.jit(one), x) == fwd
    # VJP adds the two transposed convs (dx and dk): ~3x forward
    bwd = matmul_flops(jax.grad(lambda v: jnp.sum(one(v))), x)
    assert bwd >= 2 * fwd

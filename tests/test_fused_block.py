"""Fused [GN -> scale-shift -> Mish -> halo -> conv] Pallas kernel:
tolerance vs the plain-jnp composition (interpreter mode on CPU), plus the
host-side coefficient algebra. The kernel is correct but measured SLOWER
than XLA's fused chain on v5e (PERF.md), so routing defaults off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffusioniqt_tpu.ops.pallas.fused_block as fb


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fb, "INTERPRET", True)


def _inputs(B=27, s=4, c=8, cout=8, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (B, s, s, s, c), jnp.float32)
    ns = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    nb = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, c, cout)) * 0.1
    return x, ns, nb, w


def test_fused_matches_reference_no_scale_shift():
    x, ns, nb, w = _inputs()
    ref = fb._reference_impl(x, ns, nb, None, w, 4, 3)
    out = fb.fused_boundary_block(x, ns, nb, None, w, 4, 3, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-3, atol=3e-4)


def test_fused_matches_reference_with_scale_shift():
    x, ns, nb, w = _inputs()
    B, c = x.shape[0], x.shape[-1]
    scale = jax.random.normal(jax.random.PRNGKey(4), (B, 1, 1, 1, c)) * 0.2
    shift = jax.random.normal(jax.random.PRNGKey(5), (B, 1, 1, 1, c)) * 0.2
    ref = fb._reference_impl(x, ns, nb, (scale, shift), w, 4, 3)
    out = fb.fused_boundary_block(x, ns, nb, (scale, shift), w, 4, 3,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-3, atol=3e-4)


def test_fused_gradients_via_reference_vjp():
    x, ns, nb, w = _inputs(B=27, s=4, c=8, cout=8)

    def loss_fused(w_):
        return jnp.sum(
            fb.fused_boundary_block(x, ns, nb, None, w_, 4, 3, jnp.float32) ** 2
        )

    def loss_ref(w_):
        return jnp.sum(fb._reference_impl(x, ns, nb, None, w_, 4, 3) ** 2)

    g_fused = jax.grad(loss_fused)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-3)


def test_groupnorm_affine_matches_subvol_group_norm():
    from diffusioniqt_tpu.models.blocks import subvol_group_norm

    x, ns, nb, _ = _inputs(B=8, s=6, c=8)
    a, b = fb.groupnorm_affine(x, ns, nb, groups=4)
    direct = subvol_group_norm(x, ns, 1, 4) + nb
    via_affine = x * a[:, None, None, None, :] + b[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(via_affine), np.asarray(direct),
                               rtol=2e-4, atol=2e-5)


def test_neighbor_tables_zero_outside_grid():
    a = jnp.arange(27.0)[:, None] + 1.0  # (27, 1), all nonzero
    ta, _ = fb._neighbor_tables(a, a, factor=3)
    # corner sub-volume (0,0,0): only offsets with d>=0 in every axis valid
    corner = np.asarray(ta[0, :, 0]).reshape(3, 3, 3)
    assert (corner[0] == 0).all() and (corner[:, 0] == 0).all() \
        and (corner[:, :, 0] == 0).all()
    assert corner[1, 1, 1] == 1.0  # itself
    assert corner[2, 1, 1] == 10.0  # +axis1 neighbour is b=9, value b+1
    # centre sub-volume (1,1,1) = b13: all 27 valid
    centre = np.asarray(ta[13, :, 0])
    assert (centre != 0).all()

"""Shape/dtype property tests for the 3D U-Net (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D, iqt_unet_from_config
from diffusioniqt_tpu.config import Config


def _init_and_apply(model, x, lowres=None):
    t = jnp.zeros((x.shape[0],), jnp.float32)
    log_snr = jnp.zeros((x.shape[0],), jnp.float32)
    # jit the whole init/apply: one XLA compile instead of one per eager op
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, log_snr,
                                 lowres_cond_img=lowres)
    out = jax.jit(model.apply)(params, x, t, log_snr, lowres_cond_img=lowres)
    return params, out


def small_unet(**kwargs):
    defaults = dict(
        dim=8, img_size=16, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        lowres_cond=True, att_type="linear", attend_at_middle=False,
        attend_at_enc=(False, False), use_se_attn=True, boundary=False,
        batch_sample=False, deep_feature=False, dtype=jnp.float32,
    )
    return UNet3D(**{**defaults, **kwargs})


def test_unet_shape_basic():
    model = small_unet()
    x = jnp.zeros((2, 16, 16, 16, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == (2, 16, 16, 16, 1)
    assert out.dtype == jnp.float32


def test_unet_shape_batch_sample_boundary():
    """27 sub-volumes with boundary halo convs keep static shapes."""
    model = small_unet(boundary=True, batch_sample=True, img_size=24)
    x = jnp.zeros((27, 8, 8, 8, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == (27, 8, 8, 8, 1)


@pytest.mark.slow
def test_unet_deep_feature_mid_block():
    model = small_unet(deep_feature=True, attend_at_middle=False)
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == x.shape


@pytest.mark.slow
@pytest.mark.parametrize("att_type", ["linear", "softmax"])
def test_unet_encoder_attention(att_type):
    model = small_unet(
        att_type=att_type, attend_at_enc=(True, False),
        attend_at_enc_depth=(1, 1), attend_at_enc_heads=(2, 2),
        attn_dim_head=4, init_patch_size=4, batch_sample=True, img_size=24,
    )
    x = jnp.zeros((27, 8, 8, 8, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == (27, 8, 8, 8, 1)


@pytest.mark.slow
def test_unet_vit_attention():
    model = small_unet(
        att_type="vit", attend_at_middle=True, deep_feature=True,
        attend_at_middle_heads=2, attn_dim_head=4, init_patch_size=4,
        batch_sample=False, img_size=16,
    )
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == x.shape


@pytest.mark.slow
def test_unet_memory_efficient():
    model = small_unet(memory_efficient=True)
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == x.shape


@pytest.mark.slow
def test_unet_three_levels_32():
    """The flagship config shape: dim 64 (1,2,4) at 32^3 — scaled down dims."""
    model = small_unet(dim=8, dim_mults=(1, 2, 4), num_resnet_blocks=(2, 2, 2),
                       attend_at_enc=(False, False, False), img_size=32)
    x = jnp.zeros((2, 32, 32, 32, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == x.shape


def test_unet_bf16_compute_fp32_out():
    model = small_unet(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.dtype == jnp.float32


def test_null_unet_identity():
    model = NullUnet()
    x = jnp.ones((2, 4, 4, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_cast_model_parameters():
    m = small_unet(lowres_cond=False)
    m2 = m.cast_model_parameters(lowres_cond=True, channels=1, channels_out=1)
    assert m2.lowres_cond and m2.channels == 1


def test_trilinear_upsample_and_combiner():
    from diffusioniqt_tpu.models.blocks import TrilinearUpsample, UpsampleCombiner

    x = jnp.zeros((1, 4, 4, 4, 8))
    up = TrilinearUpsample(8, dtype=jnp.float32)
    params = jax.jit(up.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(up.apply)(params, x)
    assert out.shape == (1, 8, 8, 8, 8)

    comb = UpsampleCombiner(dim=8, enabled=True, dim_outs=(4,),
                            dtype=jnp.float32)
    fmaps = [jnp.zeros((1, 2, 2, 2, 8))]
    params = jax.jit(comb.init)(jax.random.PRNGKey(0), x, fmaps)
    out = comb.apply(params, x, fmaps)
    assert out.shape == (1, 4, 4, 4, 12)

    disabled = UpsampleCombiner(dim=8, enabled=False)
    params = disabled.init(jax.random.PRNGKey(0), x, fmaps)
    np.testing.assert_array_equal(
        np.asarray(disabled.apply(params, x, fmaps)), np.asarray(x)
    )


@pytest.mark.slow
def test_iqt_unet_from_config_builds():
    cfg = Config()
    cfg.train.dim = 8
    cfg.train.init_dim = 8
    cfg.train.resnet_groups = 4
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 8
    cfg.train.compute_dtype = "float32"
    model = iqt_unet_from_config(cfg)
    x = jnp.zeros((27, 8, 8, 8, 1))
    _, out = _init_and_apply(model, x, lowres=x)
    assert out.shape == x.shape


@pytest.mark.slow
def test_merged_boundary_equals_split_path():
    """[halo + VALID conv] per sub-volume == one SAME conv over the merged
    volume: the merged-boundary execution path must match the split-layout
    halo-exchange path with identical parameters (group-uniform time, as
    batch_sample guarantees)."""
    import dataclasses

    common = dict(
        dim=8, img_size=12, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False,
        attend_at_enc=(False, False), use_se_attn=True, boundary=True,
        batch_sample=True, batch_sample_factor=3, deep_feature=True,
        lowres_cond=True, dtype=jnp.float32,
    )
    split = UNet3D(merged_boundary=False, **common)
    merged = dataclasses.replace(split, merged_boundary=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (27, 4, 4, 4, 1))
    lr = jax.random.normal(jax.random.PRNGKey(1), (27, 4, 4, 4, 1))
    t = jnp.full((27,), 0.3)

    params = split.init(jax.random.PRNGKey(2), x, t, t, lowres_cond_img=lr)
    out_split = split.apply(params, x, t, t, lowres_cond_img=lr)
    out_merged = merged.apply(params, x, t, t, lowres_cond_img=lr)
    assert out_merged.shape == out_split.shape
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out_split), rtol=2e-4, atol=2e-5
    )


def test_remat_identical_forward_and_grads():
    """remat=True (jax.checkpoint around ResnetBlocks) must not change the
    math — identical forward and parameter gradients, only the backward's
    memory/recompute schedule differs."""
    import dataclasses

    common = dict(
        dim=8, img_size=8, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False,
        attend_at_enc=(False, False), use_se_attn=True, boundary=False,
        batch_sample=False, deep_feature=False, lowres_cond=True,
        dtype=jnp.float32,
    )
    plain = UNet3D(remat=False, **common)
    remat = dataclasses.replace(plain, remat=True)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 1))
    lr = x * 0.5
    t = jnp.full((2,), 0.3)
    params = plain.init(jax.random.PRNGKey(1), x, t, t, lowres_cond_img=lr)

    def loss(model, p):
        return jnp.sum(model.apply(p, x, t, t, lowres_cond_img=lr) ** 2)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(plain, p))(params)
    l_remat, g_remat = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l_remat), float(l_plain), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    # selective policy (save conv_in/conv_out, recompute GN/Mish only) —
    # same math again, different residual set
    conv_policy = dataclasses.replace(plain, remat=True, remat_policy="conv")
    l_pol, g_pol = jax.value_and_grad(lambda p: loss(conv_policy, p))(params)
    np.testing.assert_allclose(float(l_pol), float(l_plain), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_pol)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    import pytest

    with pytest.raises(ValueError, match="remat_policy"):
        bad = dataclasses.replace(plain, remat=True, remat_policy="nope")
        bad.apply(params, x, t, t, lowres_cond_img=lr)

"""Golden-value tests for the continuous-time diffusion math.

Closed forms are re-derived independently (numpy/math), then the jnp
implementations are checked against them — the test strategy SURVEY.md §4
prescribes for the scheduler."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.core.schedules import (
    GaussianDiffusionContinuousTimes,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)


def np_cosine_log_snr(t, s=0.008):
    val = (np.cos((t + s) / (1 + s) * np.pi * 0.5) ** -2) - 1
    return -np.log(np.maximum(val, 1e-5))


def np_linear_log_snr(t):
    return -np.log(np.expm1(1e-4 + 10 * t ** 2))


def test_cosine_log_snr_matches_closed_form():
    t = np.linspace(0.0, 1.0, 101).astype(np.float32)
    got = np.asarray(alpha_cosine_log_snr(jnp.asarray(t)))
    want = np_cosine_log_snr(t)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_linear_log_snr_matches_closed_form():
    t = np.linspace(0.0, 1.0, 101).astype(np.float32)
    got = np.asarray(beta_linear_log_snr(jnp.asarray(t)))
    want = np_linear_log_snr(t)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_alpha_sigma_unit_energy():
    """alpha^2 + sigma^2 == 1 for any log-SNR (variance-preserving)."""
    log_snr = jnp.linspace(-20.0, 20.0, 201)
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    np.testing.assert_allclose(
        np.asarray(alpha ** 2 + sigma ** 2), 1.0, rtol=1e-5, atol=1e-6
    )


def test_q_sample_known_values():
    """x_t = alpha x0 + sigma eps with alpha = sqrt(sigmoid(log_snr))."""
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine", timesteps=10)
    x0 = jnp.ones((2, 4, 4, 4, 1), jnp.float32) * 3.0
    eps = jnp.ones_like(x0) * 0.5
    t = jnp.array([0.3, 0.7], jnp.float32)
    x_t, log_snr, alpha, sigma = sched.q_sample(x0, t, eps)

    want_log_snr = np_cosine_log_snr(np.array([0.3, 0.7], np.float32))
    np.testing.assert_allclose(np.asarray(log_snr), want_log_snr, rtol=1e-5)
    a = np.sqrt(1.0 / (1.0 + np.exp(-want_log_snr)))
    s = np.sqrt(1.0 / (1.0 + np.exp(want_log_snr)))
    want = a[:, None, None, None, None] * 3.0 + s[:, None, None, None, None] * 0.5
    np.testing.assert_allclose(np.asarray(x_t), np.broadcast_to(want, x_t.shape), rtol=1e-5)


def test_predict_start_from_noise_inverts_q_sample():
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine", timesteps=100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3, 8, 8, 8, 1))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0.1, 0.5, 0.9])
    x_t, *_ = sched.q_sample(x0, t, eps)
    x0_rec = sched.predict_start_from_noise(x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_predict_start_from_v_inverts():
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine", timesteps=100)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4, 1))
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([0.25, 0.75])
    x_t, *_ = sched.q_sample(x0, t, eps)
    v = sched.predict_v_from_start_and_noise(x0, t, eps)
    x0_rec = sched.predict_start_from_v(x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_q_posterior_closed_form():
    """Continuous-time posterior (eq. 33): mean/variance from alpha/sigma."""
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine", timesteps=1000)
    x0 = jnp.full((1, 2, 2, 2, 1), 0.7)
    xt = jnp.full((1, 2, 2, 2, 1), -0.2)
    t = jnp.array([0.5])
    t_next = jnp.array([0.4])
    mean, var, log_var = sched.q_posterior(x0, xt, t, t_next=t_next)

    ls = np_cosine_log_snr(np.array([0.5]))[0]
    ls_n = np_cosine_log_snr(np.array([0.4]))[0]
    a = math.sqrt(1 / (1 + math.exp(-ls)))
    a_n = math.sqrt(1 / (1 + math.exp(-ls_n)))
    s_n = math.sqrt(1 / (1 + math.exp(ls_n)))
    c = -math.expm1(ls - ls_n)
    want_mean = a_n * (-0.2 * (1 - c) / a + c * 0.7)
    want_var = s_n ** 2 * c
    np.testing.assert_allclose(np.asarray(mean)[0, 0, 0, 0, 0], want_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var)[0, 0, 0, 0, 0], want_var, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_var)[0, 0, 0, 0, 0], math.log(max(want_var, 1e-20)), rtol=1e-4
    )


def test_sampling_timesteps_fenceposts():
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine", timesteps=20)
    t_cur, t_next = sched.get_sampling_timesteps(batch=3)
    assert t_cur.shape == (20, 3)
    assert t_next.shape == (20, 3)
    assert float(t_cur[0, 0]) == 1.0
    assert float(t_next[-1, 0]) == 0.0
    # consecutive pairs share the fencepost
    np.testing.assert_allclose(np.asarray(t_next[:-1]), np.asarray(t_cur[1:]), rtol=1e-6)


def test_q_sample_from_to_composition():
    """Renoising t->t' then predicting x0 stays consistent."""
    sched = GaussianDiffusionContinuousTimes(noise_schedule="linear", timesteps=100)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 4, 1))
    eps1 = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    x_t, *_ = sched.q_sample(x0, 0.3, eps1)
    # renoise from 0.3 to 0.8 with zero extra noise keeps scaled mean
    x_t2 = sched.q_sample_from_to(x_t, 0.3, 0.8, jnp.zeros_like(x0))
    ls = np_linear_log_snr(np.array([0.3], np.float32))[0]
    ls2 = np_linear_log_snr(np.array([0.8], np.float32))[0]
    a, a2 = (math.sqrt(1 / (1 + math.exp(-v))) for v in (ls, ls2))
    np.testing.assert_allclose(
        np.asarray(x_t2), np.asarray(x_t) * (a2 / a), rtol=1e-4, atol=1e-5
    )


def test_invalid_schedule_raises():
    with pytest.raises(ValueError):
        GaussianDiffusionContinuousTimes(noise_schedule="bogus")


def test_non_uniform_sampling_timesteps():
    """Exp-weighted non-uniform times (reference :268-288): descending,
    endpoints included, correct fencepost pairing."""
    sched = GaussianDiffusionContinuousTimes(noise_schedule="cosine",
                                             timesteps=16)
    t_cur, t_next = sched.get_sampling_timesteps_non_uniform(batch=2, seed=3)
    tc = np.asarray(t_cur[:, 0])
    tn = np.asarray(t_next[:, 0])
    assert tc[0] == 1.0 and tn[-1] == 0.0
    assert (np.diff(tc) < 0).all()  # strictly descending
    np.testing.assert_allclose(tn[:-1], tc[1:])
    # exp(-10t) weighting concentrates times near 0
    assert (tc < 0.5).mean() > 0.5

"""Continuous-time Gaussian diffusion schedules (pure jnp, no parameters).

Re-derivation of the reference's ``GaussianDiffusionContinuousTimes``
(``/root/reference/imagen_pytorch3D.py:222-357``), which follows
@crowsonkb's v-diffusion-jax formulation. Everything here is a pure function
of ``t in [0, 1]`` and composes freely under ``jit`` / ``vmap`` / ``scan``.

Math contract (verified by golden tests against closed forms):
  log_snr(t)         — noise schedule, cosine or linear
  alpha, sigma       — sqrt(sigmoid(+/- log_snr))
  q_sample           — x_t = alpha * x0 + sigma * eps
  q_posterior        — DDPM ancestral posterior, eq. 33 continuous-time form
  predict_start_*    — invert the noise / v parameterisations
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


def safe_log(t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """log with the input clamped from below (reference ``log``, :141-142)."""
    return jnp.log(jnp.clip(t, min=eps))


def beta_linear_log_snr(t: jnp.ndarray) -> jnp.ndarray:
    """Linear-beta schedule in log-SNR form (reference :225-227)."""
    return -jnp.log(jnp.expm1(1e-4 + 10 * (t ** 2)))


def alpha_cosine_log_snr(t: jnp.ndarray, s: float = 0.008) -> jnp.ndarray:
    """Cosine schedule in log-SNR form (reference :229-231)."""
    return -safe_log(
        (jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2) - 1, eps=1e-5
    )


def log_snr_to_alpha_sigma(log_snr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """alpha = sqrt(sigmoid(log_snr)), sigma = sqrt(sigmoid(-log_snr))."""
    return jnp.sqrt(jax.nn.sigmoid(log_snr)), jnp.sqrt(jax.nn.sigmoid(-log_snr))


def right_pad_dims_to(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Append singleton dims to ``t`` until it broadcasts against ``x``."""
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(t.shape + (1,) * padding_dims)


_SCHEDULES = {
    "linear": beta_linear_log_snr,
    "cosine": alpha_cosine_log_snr,
}


@dataclass(frozen=True)
class GaussianDiffusionContinuousTimes:
    """Stateless continuous-time scheduler.

    Equivalent capability to reference ``imagen_pytorch3D.py:236-357`` but as
    a frozen pytree-free dataclass of pure functions: safe to close over in
    jitted code (hyperparameters are Python constants baked at trace time).
    """

    noise_schedule: str = "cosine"
    timesteps: int = 1000

    def __post_init__(self):
        if self.noise_schedule not in _SCHEDULES:
            raise ValueError(f"invalid noise schedule {self.noise_schedule}")

    # -- schedule ---------------------------------------------------------
    def log_snr(self, t: jnp.ndarray) -> jnp.ndarray:
        return _SCHEDULES[self.noise_schedule](t)

    def get_condition(self, times):
        """Time conditioning fed to the U-Net is the raw log-SNR
        (reference :258-259 and usage at :2307, :1994)."""
        return None if times is None else self.log_snr(times)

    def get_times(self, batch_size: int, noise_level: float) -> jnp.ndarray:
        return jnp.full((batch_size,), noise_level, dtype=jnp.float32)

    def sample_random_times(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        return jax.random.uniform(key, (batch_size,), dtype=jnp.float32)

    def get_sampling_timesteps(self, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fencepost pairs (t, t_next), each ``(T, batch)``.

        Reference :261-266 returns a python tuple of per-step pairs; here the
        steps live in a stacked leading axis so the sampling loop can be a
        single ``lax.scan``.
        """
        times = jnp.linspace(1.0, 0.0, self.timesteps + 1, dtype=jnp.float32)
        t_cur = jnp.broadcast_to(times[:-1, None], (self.timesteps, batch))
        t_next = jnp.broadcast_to(times[1:, None], (self.timesteps, batch))
        return t_cur, t_next

    def get_sampling_timesteps_non_uniform(
        self, batch: int, seed: int = 0, gamma: float = 10.0,
        large_timesteps: int = 10000,
    ):
        """Exponentially-weighted non-uniform sampling times (reference
        :268-288): draw ``timesteps`` distinct times with probability
        proportional to exp(-gamma * t), always including 1.0 and 0.0.
        Host-side numpy randomness (the reference uses np.random.choice);
        returns the same stacked (T', batch) fencepost pairs."""
        import numpy as np

        rng = np.random.default_rng(seed)
        times = np.linspace(1.0, 0.0, large_timesteps)
        probs = np.exp(-gamma * times).astype(np.float64)
        probs /= probs.sum()
        ts = rng.choice(times, self.timesteps, p=probs, replace=False)
        if 1.0 not in ts:
            ts = np.concatenate([ts, [1.0]])
        if 0.0 not in ts:
            ts = np.concatenate([ts, [0.0]])
        ts = np.sort(ts)[::-1].copy()
        ts = jnp.asarray(ts, jnp.float32)
        t_cur = jnp.broadcast_to(ts[:-1, None], (ts.shape[0] - 1, batch))
        t_next = jnp.broadcast_to(ts[1:, None], (ts.shape[0] - 1, batch))
        return t_cur, t_next

    # -- forward process --------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """Diffuse x0 to time t. Returns (x_t, log_snr, alpha, sigma)
        (reference :311-322)."""
        dtype = x_start.dtype
        if isinstance(t, float):
            t = jnp.full((x_start.shape[0],), t, dtype=dtype)
        log_snr = self.log_snr(t).astype(dtype)
        log_snr_padded = right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_padded)
        return alpha * x_start + sigma * noise, log_snr, alpha, sigma

    def q_sample_from_to(self, x_from, from_t, to_t, noise):
        """Renoise from time ``from_t`` to an earlier (more noised) ``to_t``
        (reference :324-344); used by inpaint-resample."""
        batch = x_from.shape[0]
        if isinstance(from_t, float):
            from_t = jnp.full((batch,), from_t, dtype=x_from.dtype)
        if isinstance(to_t, float):
            to_t = jnp.full((batch,), to_t, dtype=x_from.dtype)

        log_snr = right_pad_dims_to(x_from, self.log_snr(from_t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        log_snr_to = right_pad_dims_to(x_from, self.log_snr(to_t))
        alpha_to, sigma_to = log_snr_to_alpha_sigma(log_snr_to)

        return x_from * (alpha_to / alpha) + noise * (
            sigma_to * alpha - sigma * alpha_to
        ) / alpha

    # -- reverse process --------------------------------------------------
    def q_posterior(self, x_start, x_t, t, t_next=None):
        """Posterior q(x_s | x_t, x0) mean/variance, continuous-time eq. 33
        (reference :290-309). Returns (mean, var, log_var_clipped)."""
        if t_next is None:
            t_next = jnp.clip(t - 1.0 / self.timesteps, min=0.0)

        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        log_snr_next = right_pad_dims_to(x_t, self.log_snr(t_next))

        alpha, _sigma = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)

        c = -jnp.expm1(log_snr - log_snr_next)
        posterior_mean = alpha_next * (x_t * (1 - c) / alpha + c * x_start)
        posterior_variance = (sigma_next ** 2) * c
        posterior_log_variance = safe_log(posterior_variance, eps=1e-20)
        return posterior_mean, posterior_variance, posterior_log_variance

    def predict_start_from_v(self, x_t, t, v):
        """x0 from v-prediction (reference :346-350)."""
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * x_t - sigma * v

    def predict_start_from_noise(self, x_t, t, noise):
        """x0 from eps-prediction (reference :352-357)."""
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, min=1e-8)

    def predict_v_from_start_and_noise(self, x_start, t, noise):
        """v-target: v = alpha * eps - sigma * x0 (used by p_losses,
        reference :2356)."""
        log_snr = right_pad_dims_to(x_start, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * noise - sigma * x_start

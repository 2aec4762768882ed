"""EDM (Karras et al. 2022, "Elucidating the Design Space...") math.

Pure-jnp equivalents of the reference's ``ElucidatedImagen`` preconditioning
and schedule machinery (``/root/reference/elucidated_imagen.py:96-106`` for
the defaults, ``:314-379`` for the preconditioning/schedule math, ``:706-710``
for the training sigma distribution and loss weight).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EDMParams:
    """Per-unet EDM hyperparameters (reference ``Hparams`` fields,
    elucidated_imagen.py:96-106 / :245-259)."""

    num_sample_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_noise: float = 1.003

    # --- preconditioning, Table 1 (reference :314-324) --------------------
    def c_skip(self, sigma):
        return (self.sigma_data ** 2) / (sigma ** 2 + self.sigma_data ** 2)

    def c_out(self, sigma):
        return sigma * self.sigma_data * (self.sigma_data ** 2 + sigma ** 2) ** -0.5

    def c_in(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) ** -0.5

    def c_noise(self, sigma):
        return jnp.log(jnp.clip(sigma, min=1e-12)) * 0.25

    # --- sampling schedule, eq. 5 (reference :365-379) --------------------
    def sample_schedule(self, num_sample_steps: int | None = None) -> jnp.ndarray:
        """rho-spaced sigmas, descending, with a trailing 0. Shape (N+1,)."""
        n = num_sample_steps or self.num_sample_steps
        inv_rho = 1.0 / self.rho
        steps = jnp.arange(n, dtype=jnp.float32)
        sigmas = (
            self.sigma_max ** inv_rho
            + steps / (n - 1) * (self.sigma_min ** inv_rho - self.sigma_max ** inv_rho)
        ) ** self.rho
        return jnp.concatenate([sigmas, jnp.zeros((1,), dtype=jnp.float32)])

    def gammas(self, sigmas: jnp.ndarray, num_sample_steps: int | None = None) -> jnp.ndarray:
        """Churn amount per step (reference :418-422)."""
        n = num_sample_steps or self.num_sample_steps
        churn = min(self.S_churn / n, math.sqrt(2.0) - 1.0)
        return jnp.where(
            (sigmas >= self.S_tmin) & (sigmas <= self.S_tmax), churn, 0.0
        )

    # --- training distribution & loss weight (reference :702-710) ---------
    def noise_distribution(self, key: jax.Array, batch: int) -> jnp.ndarray:
        """sigma ~ exp(N(P_mean, P_std))."""
        return jnp.exp(
            self.P_mean + self.P_std * jax.random.normal(key, (batch,), jnp.float32)
        )

    def loss_weight(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) * (sigma * self.sigma_data) ** -2

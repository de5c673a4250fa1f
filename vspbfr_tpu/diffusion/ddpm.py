"""Latent DDPM machinery for the code diffuser (T=4, x0-parameterization).

Re-design of `ldm/ddpm.py:253-429` + `ldm/util2.py:21-26`. Key facts
replicated exactly (SURVEY.md §3 Q1):

  * "linear" beta schedule in sqrt space: linspace(sqrt(b0), sqrt(b1), T)^2
    computed in float64, with b0=0.1, b1=0.99, T=4.
  * x0-parameterization, clip_denoised=False.
  * p_sample returns ONLY the posterior mean — the sampler is deterministic
    given its initial noise; no per-step noise is added (`ldm/ddpm.py:370-376`).
  * training unrolls the full reverse chain with gradients, starting from
    q_sample(x, t=T-1); eval starts from pure N(0, I) shaped like the
    condition (`ldm/ddpm.py:400-429`).

With T=4 static the reverse chain is a 4-step unrolled loop inside one jit —
XLA fuses the whole sampler into a single program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Precomputed diffusion constants (all shape (T,) float32)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @staticmethod
    def linear(timesteps: int = 4, linear_start: float = 0.1,
               linear_end: float = 0.99, v_posterior: float = 0.0) -> "DDPMSchedule":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps,
                            dtype=np.float64) ** 2
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        f32 = lambda a: a.astype(np.float32)
        return DDPMSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
        )


class LatentDDPM:
    """Functional sampler around a denoiser fn(x, cond, t) -> x0_hat."""

    def __init__(self, denoise_fn: Callable, schedule: DDPMSchedule | None = None):
        self.denoise = denoise_fn
        self.sched = schedule or DDPMSchedule.linear()

    def q_sample(self, x_start: jnp.ndarray, t: int,
                 noise: jnp.ndarray) -> jnp.ndarray:
        """Forward noising q(x_t | x_0) at a static timestep (`ldm/ddpm.py:393-397`)."""
        s = self.sched
        return (s.sqrt_alphas_cumprod[t] * x_start
                + s.sqrt_one_minus_alphas_cumprod[t] * noise)

    def p_sample_mean(self, x: jnp.ndarray, cond: jnp.ndarray, t: int) -> jnp.ndarray:
        """One reverse step: predict x0, return the posterior mean only (Q1)."""
        s = self.sched
        b = x.shape[0]
        tb = jnp.full((b,), t, dtype=jnp.int32)
        x0_hat = self.denoise(x, cond, tb)
        return (s.posterior_mean_coef1[t] * x0_hat
                + s.posterior_mean_coef2[t] * x)

    def sample(self, cond: jnp.ndarray, init_noise: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode reverse chain from pure noise (`ldm/ddpm.py:421-429`).

        init_noise must be N(0, I) shaped like cond; given the mean-only
        update the output is a deterministic function of (cond, init_noise).
        """
        x = init_noise
        for t in reversed(range(self.sched.num_timesteps)):
            x = self.p_sample_mean(x, cond, t)
        return x

    def training_chain(self, x_start: jnp.ndarray, cond: jnp.ndarray,
                       noise: jnp.ndarray):
        """Training-mode chain (`ldm/ddpm.py:408-420`): noise x_start to
        t=T-1, then run the full reverse loop WITH gradients.

        Returns (final, [x_noisy, step outputs...]) like the reference's
        (last_deno, de_no_list).
        """
        T = self.sched.num_timesteps
        x = self.q_sample(x_start, T - 1, noise)
        chain = [x]
        for t in reversed(range(T)):
            x = self.p_sample_mean(x, cond, t)
            chain.append(x)
        return x, chain

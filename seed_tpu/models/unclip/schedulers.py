"""Diffusion schedulers (DDIM + DDPM-add-noise), jit-friendly.

Rebuilds the scheduler math used by the reference pipeline
(models/pipeline_stable_unclip_img2img.py:753-775 denoise loop and
noise_image_embeddings :528-573): the stable-diffusion-2-1-unclip checkpoint
runs DDIM with v-prediction and a scaled-linear beta schedule; the image-
embedding noising uses a squaredcos_cap_v2 DDPM ``add_noise``.

All tables are precomputed host-side as numpy; the step function is pure
jnp so the whole denoise loop compiles into one XLA program
(lax.fori_loop over static num_inference_steps).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int = 1000, schedule: str = "scaled_linear",
               beta_start: float = 0.00085, beta_end: float = 0.012) -> np.ndarray:
    if schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if schedule == "squaredcos_cap_v2":
        # Karlo/unCLIP cosine schedule
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = []
        for i in range(num_train_timesteps):
            t1, t2 = i / num_train_timesteps, (i + 1) / num_train_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.asarray(betas, dtype=np.float64)
    raise ValueError(schedule)


@dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM (eta=0) supporting epsilon / v_prediction."""
    num_train_timesteps: int = 1000
    beta_schedule: str = "scaled_linear"
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "v_prediction"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    clip_sample: bool = False

    def alphas_cumprod(self) -> np.ndarray:
        betas = make_betas(self.num_train_timesteps, self.beta_schedule,
                           self.beta_start, self.beta_end)
        return np.cumprod(1.0 - betas)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        # diffusers 'leading' spacing + steps_offset
        ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
        return (ts + self.steps_offset).astype(np.int64)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def make_tables(self, num_inference_steps: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-inference-step (timestep, alpha_t, alpha_prev) jnp tables."""
        ac = self.alphas_cumprod()
        ts = self.timesteps(num_inference_steps)
        alpha_t = ac[ts]
        prev_ts = ts - self.num_train_timesteps // num_inference_steps
        final = 1.0 if self.set_alpha_to_one else float(ac[0])
        alpha_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, None)], final)
        return (jnp.asarray(ts, jnp.int32),
                jnp.asarray(alpha_t, jnp.float32),
                jnp.asarray(alpha_prev, jnp.float32))

    def step(self, model_output: jnp.ndarray, sample: jnp.ndarray,
             alpha_t: jnp.ndarray, alpha_prev: jnp.ndarray) -> jnp.ndarray:
        """One deterministic DDIM update x_t -> x_{t-1} (fp32)."""
        x = sample.astype(jnp.float32)
        eps_or_v = model_output.astype(jnp.float32)
        sqrt_a, sqrt_1ma = jnp.sqrt(alpha_t), jnp.sqrt(1.0 - alpha_t)
        if self.prediction_type == "v_prediction":
            # x0 = sqrt(a)*x - sqrt(1-a)*v ; eps = sqrt(a)*v + sqrt(1-a)*x
            x0 = sqrt_a * x - sqrt_1ma * eps_or_v
            eps = sqrt_a * eps_or_v + sqrt_1ma * x
        elif self.prediction_type == "epsilon":
            eps = eps_or_v
            x0 = (x - sqrt_1ma * eps) / sqrt_a
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps


@dataclass(frozen=True)
class DDPMNoiser:
    """add_noise only — the image-embedding noising scheduler
    (StableUnCLIP image_noising_scheduler, squaredcos_cap_v2)."""
    num_train_timesteps: int = 1000
    beta_schedule: str = "squaredcos_cap_v2"

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  timesteps) -> jnp.ndarray:
        ac = np.cumprod(1.0 - make_betas(self.num_train_timesteps,
                                         self.beta_schedule))
        ac = jnp.asarray(ac, jnp.float32)
        a = ac[jnp.asarray(timesteps)]
        while a.ndim < sample.ndim:
            a = a[..., None]
        return (jnp.sqrt(a) * sample.astype(jnp.float32)
                + jnp.sqrt(1 - a) * noise.astype(jnp.float32)).astype(sample.dtype)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb

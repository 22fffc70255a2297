"""unCLIP de-tokenizer pipeline: SEED embedding -> pixels.

TPU rebuild of StableUnCLIPImg2ImgPipeline.__call__
(models/pipeline_stable_unclip_img2img.py:575-794) restricted to the SEED
use (precomputed ``image_embeds`` conditioning, ImageTokenizer.decode
:92-113):

1. noise_image_embeddings (:528-573): normalize -> DDPM add_noise at
   noise_level -> unnormalize -> concat sinusoidal noise-level embedding
   (1024 -> 2048)
2. classifier-free guidance over the *image embedding*: uncond = zeros (or
   a negative-embedding), cond/uncond batched in one UNet pass (:755-770)
3. DDIM v-prediction denoise, 20 steps, guidance 10, 96x96x4 latents
4. VAE decode -> [0, 1] images, 768x768

TPU-first: the ENTIRE loop (2N UNet passes + guidance + scheduler) plus the
VAE decode compiles into ONE XLA program via lax.fori_loop with precomputed
per-step alpha tables — no host round trips between steps.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import layers as L
from .schedulers import DDIMScheduler, DDPMNoiser, timestep_embedding
from .unet import SD21_UNCLIP_UNET, UNetConfig, init_unet, unet_apply
from .vae import SD_VAE, VAEConfig, init_vae_decoder, vae_decode


@dataclass(frozen=True)
class UnCLIPConfig:
    unet: UNetConfig = SD21_UNCLIP_UNET
    vae: VAEConfig = SD_VAE
    scheduler: DDIMScheduler = DDIMScheduler()
    noiser: DDPMNoiser = DDPMNoiser()
    image_embed_dim: int = 1024
    latent_size: int = 96
    text_ctx_dim: int = 1024
    text_ctx_len: int = 77


SD21_UNCLIP = UnCLIPConfig()

from .unet import TINY_UNET
from .vae import TINY_VAE
TINY_UNCLIP = UnCLIPConfig(
    unet=TINY_UNET, vae=TINY_VAE, image_embed_dim=5, latent_size=8,
    text_ctx_dim=TINY_UNET.cross_attention_dim, text_ctx_len=4)


def init_unclip(key, cfg: UnCLIPConfig = SD21_UNCLIP, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "unet": init_unet(k1, cfg.unet, dtype),
        "vae": init_vae_decoder(k2, cfg.vae, dtype),
        # StableUnCLIPImageNormalizer (mean/std over the CLIP embedding)
        "image_normalizer": {"mean": jnp.zeros((cfg.image_embed_dim,), dtype),
                             "std": jnp.ones((cfg.image_embed_dim,), dtype)},
        # cached empty-prompt text context ("" through the CLIP text tower);
        # conversion fills this from the real checkpoint
        "empty_prompt_embeds": jnp.zeros(
            (1, cfg.text_ctx_len, cfg.text_ctx_dim), dtype),
    }


def noise_image_embeddings(params, image_embeds: jnp.ndarray,
                           noise_level: int, noise: Optional[jnp.ndarray],
                           cfg: UnCLIPConfig) -> jnp.ndarray:
    """[B, D] -> [B, 2D]: noised embedding ++ noise-level embedding."""
    norm = params["image_normalizer"]
    x = (image_embeds.astype(jnp.float32) - norm["mean"].astype(jnp.float32)) \
        / norm["std"].astype(jnp.float32)
    if noise is None:
        noise = jnp.zeros_like(x)
    ts = jnp.full((x.shape[0],), noise_level, jnp.int32)
    x = cfg.noiser.add_noise(x, noise, ts)
    x = x * norm["std"].astype(jnp.float32) + norm["mean"].astype(jnp.float32)
    lvl = timestep_embedding(ts, image_embeds.shape[-1], flip_sin_to_cos=True,
                             downscale_freq_shift=0.0)
    return jnp.concatenate([x, lvl], axis=1).astype(image_embeds.dtype)


def generate_latents(params, image_embeds: jnp.ndarray, latents: jnp.ndarray,
                     cfg: UnCLIPConfig, num_inference_steps: int = 20,
                     guidance_scale: float = 10.0,
                     negative_image_embeds: Optional[jnp.ndarray] = None,
                     noise_level: int = 0,
                     embed_noise: Optional[jnp.ndarray] = None,
                     prompt_embeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Denoise loop -> final latents [B, h, w, 4] (pre-VAE)."""
    B = image_embeds.shape[0]
    cond = noise_image_embeddings(params, image_embeds, noise_level,
                                  embed_noise, cfg)
    if negative_image_embeds is not None:
        uncond = noise_image_embeddings(params, negative_image_embeds, 0,
                                        None, cfg)
    else:
        uncond = jnp.zeros_like(cond)
    class_labels = jnp.concatenate([uncond, cond], axis=0)     # CFG batch

    if prompt_embeds is None:
        prompt_embeds = params["empty_prompt_embeds"]
    ctx = jnp.broadcast_to(prompt_embeds,
                           (2 * B, *prompt_embeds.shape[-2:])).astype(latents.dtype)

    ts, alpha_t, alpha_prev = cfg.scheduler.make_tables(num_inference_steps)
    x = latents * cfg.scheduler.init_noise_sigma

    def body(i, x):
        lat2 = jnp.concatenate([x, x], axis=0)
        t = jnp.full((2 * B,), ts[i], jnp.int32)
        pred = unet_apply(params["unet"], lat2, t, ctx, class_labels, cfg.unet)
        pu, pc = jnp.split(pred, 2, axis=0)
        pred = pu + guidance_scale * (pc - pu)
        return cfg.scheduler.step(pred, x, alpha_t[i], alpha_prev[i]).astype(x.dtype)

    return jax.lax.fori_loop(0, num_inference_steps, body, x)


def decode_to_images(params, latents: jnp.ndarray,
                     cfg: UnCLIPConfig) -> jnp.ndarray:
    imgs = vae_decode(params["vae"], latents / cfg.vae.scaling_factor, cfg.vae)
    return jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)   # [-1,1] -> [0,1]


class UnCLIPDecoder:
    """The serving-side de-tokenizer (diffusion half of ImageTokenizer).

    Holds compiled generate+decode and the fixed latents/noise buffers the
    reference uses for deterministic decoding (seed_llama_tokenizer.py:61-65).
    """

    def __init__(self, params, cfg: UnCLIPConfig = SD21_UNCLIP,
                 num_inference_steps: int = 20, guidance_scale: float = 10.0,
                 dtype=jnp.bfloat16, seed: int = 42, offload: bool = False):
        from ...serving.offload import wrap_params
        self._params = wrap_params(params, offload)
        self.params = self._params.params
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        k1, _ = jax.random.split(key)
        self.latents = jax.random.normal(
            k1, (1, cfg.latent_size, cfg.latent_size, 4)).astype(dtype)

        def run(p, image_embeds, latents):
            lat = generate_latents(p, image_embeds, latents, cfg,
                                   num_inference_steps, guidance_scale)
            return decode_to_images(p, lat, cfg)

        self._run = jax.jit(run)

    def generate(self, image_embeds) -> np.ndarray:
        """[B, 1024] unCLIP embeddings -> float images [B, H, W, 3] in [0,1]."""
        emb = jnp.asarray(image_embeds)
        B = emb.shape[0]
        lat = jnp.broadcast_to(self.latents, (B, *self.latents.shape[1:]))
        with self._params as p:     # np.asarray syncs before release
            return np.asarray(self._run(p, emb, lat), dtype=np.float32)

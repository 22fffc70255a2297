"""SEED tokenizer training: stage-1 (causal Q-Former) + stage-2 (codebook).

Stage 1 — contrastive causal Q-Former
(SEED_Tokenizer/lavis/models/blip2_models/blip2_qformer_casual.py):
  frozen EVA-ViT (:121-122) -> causal Q-Former 32 queries -> vision_proj
  of the LAST query token (:143 ``image_feats[:, -1]``) vs text_proj of
  the text CLS (:152-158), label-smoothed InfoNCE over the cross-device
  global batch (:166-199), learnable temperature.

Stage 2 — codebook distillation
(blip2_qformer_codebook_all_image.py:208-328):
  frozen ViT + Q-Former (:212-226); trains encode_task -> VQ -> decode_task
  + recon blocks + image-distill head. Loss = 5*vq + 2*recon_s +
  0.5*distill (:322-328): recon_s = cosine recon of Q-Former features
  through 4 blocks (:202-206, 236-243); distill = MSE to the frozen
  CLIP-ViT-H image embedding (:246-285).

Both are pure loss functions (params, batch, rng) -> (loss, metrics) ready
for seed_tpu.train.Trainer; the frozen towers are stop_gradient'ed so one
param tree serves both frozen and trainable parts (the trainable/frozen
split for checkpointing uses lora.split_trainable patterns).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import layers as L
from ..models import quantizer as VQ
from ..models.qformer import qformer_apply, qformer_text_apply
from ..models.seed_tokenizer import SeedTokenizerConfig, _decode_block_cfg
from ..models.vit import blocks_apply, vit_apply
from .losses import cosine_recon_loss, info_nce, mse_loss


# --------------------------- stage 1 ---------------------------------------

@dataclass(frozen=True)
class Stage1Config:
    tokenizer: SeedTokenizerConfig
    embed_dim: int = 256          # vision/text projection dim (blip2.py)
    label_smoothing: float = 0.1
    init_temp: float = 0.07


def init_stage1_head(key, cfg: Stage1Config, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    h = cfg.tokenizer.hidden
    return {
        "vision_proj": L.init_linear(k1, h, cfg.embed_dim, dtype=dtype),
        "text_proj": L.init_linear(k2, h, cfg.embed_dim, dtype=dtype),
        "temp": jnp.asarray(cfg.init_temp, jnp.float32),
    }


def stage1_features(tok_params, head, images, text_ids, text_pad,
                    cfg: Stage1Config):
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient
    # frozen vision tower (no-grad fwd, blip2_qformer_casual.py:121-122)
    feats = sg(vit_apply(tok_params["vit"], images, tcfg.vit))
    feats = L.layer_norm(tok_params["ln_vision"], feats)
    q = qformer_apply(tok_params["qformer"], feats, tcfg.qformer)
    img_f = L.linear(head["vision_proj"], q[:, -1])        # LAST query token
    img_f = img_f / (jnp.linalg.norm(img_f, axis=-1, keepdims=True) + 1e-8)

    t = qformer_text_apply(tok_params["qformer"], text_ids, tcfg.qformer,
                           text_pad)
    txt_f = L.linear(head["text_proj"], t[:, 0])           # CLS
    txt_f = txt_f / (jnp.linalg.norm(txt_f, axis=-1, keepdims=True) + 1e-8)
    return img_f, txt_f


def stage1_loss(params, batch, rng, cfg: Stage1Config,
                axis_name: Optional[str] = None):
    """params: {"tokenizer": ..., "head": ...};
    batch: {"images": [B,H,W,3], "text_ids": [B,T], "text_pad": [B,T]}."""
    img_f, txt_f = stage1_features(params["tokenizer"], params["head"],
                                   batch["images"], batch["text_ids"],
                                   batch.get("text_pad"), cfg)
    temp = jnp.clip(params["head"]["temp"], 0.001, 0.5)
    return info_nce(img_f, txt_f, temp, axis_name=axis_name,
                    label_smoothing=cfg.label_smoothing)


def init_itm_head(key, cfg: Stage1Config, dtype=jnp.float32):
    """Binary image-text-matching head (blip2_qformer_casual.py:204-272)."""
    return L.init_linear(key, cfg.tokenizer.hidden, 2, dtype=dtype)


def stage1_itm_loss(tok_params, itm_head, images, text_ids, text_pad,
                    cfg: Stage1Config, rng, sim_feats=None):
    """ITM with in-batch hard negatives (blip2_qformer_casual.py:204-272).

    ``sim_feats`` = (img_f, txt_f) normalized contrastive features (from
    ``stage1_features``): negatives are then *similarity-weighted* — each
    image draws a hard negative text (and each text a hard negative image)
    with probability softmax(sim) over the batch, diagonal masked
    (:219-241), all in-graph via jax.random.categorical. Without
    ``sim_feats`` falls back to rolled negatives (the cheap variant)."""
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient
    feats = sg(vit_apply(tok_params["vit"], images, tcfg.vit))
    feats = L.layer_norm(tok_params["ln_vision"], feats)
    return _itm_from_feats(tok_params, itm_head, feats, text_ids, text_pad,
                           cfg, rng, sim_feats)


def _itm_from_feats(tok_params, itm_head, feats, text_ids, text_pad,
                    cfg: Stage1Config, rng, sim_feats=None):
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient
    B = feats.shape[0]
    if sim_feats is not None:
        img_f, txt_f = (sg(f.astype(jnp.float32)) for f in sim_feats)
        sim = img_f @ txt_f.T                      # [B, B] rows: image->text
        diag = jnp.eye(B, dtype=bool)
        masked = jnp.where(diag, -jnp.inf, sim)
        k_t, k_i = jax.random.split(rng)
        # per image: a hard negative TEXT; per text: a hard negative IMAGE
        neg_txt_idx = jax.random.categorical(k_t, masked / 0.07, axis=1)
        neg_img_idx = jax.random.categorical(k_i, masked.T / 0.07, axis=1)
    else:
        neg_txt_idx = jnp.roll(jnp.arange(B), 1)
        neg_img_idx = jnp.roll(jnp.arange(B), -1)
    neg_text = text_ids[neg_txt_idx]
    neg_pad = text_pad[neg_txt_idx] if text_pad is not None else None

    def joint_last_query(img_feats, t_ids, t_pad):
        h = qformer_apply(tok_params["qformer"], img_feats, tcfg.qformer,
                          text_ids=t_ids, text_pad=t_pad)
        return h[:, tcfg.qformer.query_len - 1]   # last query token (:252)

    pos = L.linear(itm_head, joint_last_query(feats, text_ids, text_pad))
    neg_t = L.linear(itm_head, joint_last_query(feats, neg_text, neg_pad))
    neg_i = L.linear(itm_head,
                     joint_last_query(feats[neg_img_idx], text_ids, text_pad))
    logits = jnp.concatenate([pos, neg_t, neg_i], axis=0).astype(jnp.float32)
    labels = jnp.concatenate([jnp.ones((B,), jnp.int32),
                              jnp.zeros((2 * B,), jnp.int32)])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))


def stage1_caption_loss(tok_params, lm_head, images, text_ids, text_pad,
                        cfg: Stage1Config):
    """Captioning LM loss through the decoder-mode Q-Former
    (blip2_qformer_casual.py:275-296)."""
    from ..models.qformer import lm_head_apply, qformer_caption_apply
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient
    feats = sg(vit_apply(tok_params["vit"], images, tcfg.vit))
    feats = L.layer_norm(tok_params["ln_vision"], feats)
    hidden = qformer_caption_apply(tok_params["qformer"], feats, text_ids,
                                   tcfg.qformer, text_pad)
    logits = lm_head_apply(lm_head, tok_params["qformer"]["embeddings"]
                           ["word_embeddings"], hidden, tcfg.qformer)
    from .losses import cross_entropy
    labels = jnp.where(text_pad.astype(bool), text_ids, -100) \
        if text_pad is not None else text_ids
    return cross_entropy(logits[:, :-1], labels[:, 1:])


def stage1_total_loss(params, batch, rng, cfg: Stage1Config,
                      axis_name: Optional[str] = None,
                      w_itc: float = 1.0, w_itm: float = 1.0,
                      w_lm: float = 1.0
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Joint stage-1 objective: ITC + ITM + captioning LM — the reference
    trains all three in one forward (blip2_qformer_casual.py:199-296
    ``loss_itc + loss_itm + loss_lm``). The frozen ViT runs ONCE; ITM uses
    similarity-weighted hard negatives from the ITC features.

    params: {"tokenizer", "head", "itm_head", "lm_head"};
    batch: {"images", "text_ids", "text_pad"}. Returns (loss, metrics)."""
    from ..models.qformer import lm_head_apply, qformer_caption_apply
    from .losses import cross_entropy
    tok = params["tokenizer"]
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient
    images, text_ids = batch["images"], batch["text_ids"]
    text_pad = batch.get("text_pad")

    feats = sg(vit_apply(tok["vit"], images, tcfg.vit))
    feats = L.layer_norm(tok["ln_vision"], feats)

    q = qformer_apply(tok["qformer"], feats, tcfg.qformer)
    img_f = L.linear(params["head"]["vision_proj"], q[:, -1])
    img_f = img_f / (jnp.linalg.norm(img_f, axis=-1, keepdims=True) + 1e-8)
    t = qformer_text_apply(tok["qformer"], text_ids, tcfg.qformer, text_pad)
    txt_f = L.linear(params["head"]["text_proj"], t[:, 0])
    txt_f = txt_f / (jnp.linalg.norm(txt_f, axis=-1, keepdims=True) + 1e-8)
    temp = jnp.clip(params["head"]["temp"], 0.001, 0.5)
    loss_itc = info_nce(img_f, txt_f, temp, axis_name=axis_name,
                        label_smoothing=cfg.label_smoothing)

    loss_itm = _itm_from_feats(tok, params["itm_head"], feats, text_ids,
                               text_pad, cfg, rng, sim_feats=(img_f, txt_f))

    hidden = qformer_caption_apply(tok["qformer"], feats, text_ids,
                                   tcfg.qformer, text_pad)
    logits = lm_head_apply(params["lm_head"],
                           tok["qformer"]["embeddings"]["word_embeddings"],
                           hidden, tcfg.qformer)
    labels = jnp.where(text_pad.astype(bool), text_ids, -100) \
        if text_pad is not None else text_ids
    loss_lm = cross_entropy(logits[:, :-1], labels[:, 1:])

    total = w_itc * loss_itc + w_itm * loss_itm + w_lm * loss_lm
    return total, {"itc": loss_itc, "itm": loss_itm, "lm": loss_lm}


# --------------------------- stage 2 ---------------------------------------

@dataclass(frozen=True)
class Stage2Config:
    tokenizer: SeedTokenizerConfig
    w_embed: float = 5.0          # loss weights (:322-328)
    w_recon: float = 2.0
    w_distill: float = 0.5
    vq_beta: float = 0.25


def stage2_loss(params, batch, rng, cfg: Stage2Config
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """params: the full seed-tokenizer tree (init with
    with_recon_blocks=True); batch: {"images": [B,H,W,3],
    "clip_embeds": [B,1024] precomputed frozen CLIP-ViT-H targets}.

    Returns (total_loss, metrics). Frozen towers stop-gradient'ed.
    """
    tcfg = cfg.tokenizer
    sg = jax.lax.stop_gradient

    feats = sg(vit_apply(params["vit"], batch["images"], tcfg.vit))
    feats = sg(L.layer_norm(params["ln_vision"], feats))
    query_out = sg(qformer_apply(params["qformer"], feats, tcfg.qformer))

    h = jnp.tanh(L.linear(params["encode_task"]["fc1"], query_out))
    z = L.linear(params["encode_task"]["fc2"], h)
    quant, indices, vq_loss = VQ.quantize(params["vq"], z, beta=cfg.vq_beta)

    up = jnp.tanh(L.linear(params["decode_task"]["fc1"], quant))
    up = L.linear(params["decode_task"]["fc2"], up)

    # recon_s: 4 blocks reconstruct the frozen Q-Former features (:236-243)
    rec = up + params["pos_embed"].astype(up.dtype)
    rec = blocks_apply(params["blocks"], rec, _decode_block_cfg(tcfg))
    loss_recon = cosine_recon_loss(rec, query_out)

    # image distillation head (:246-285): Reverse Q-Former (training
    # default, use_qformer_image=True) or image_down MLP, per config
    from ..models.seed_tokenizer import distill_head
    img = up + params["pos_embed_image"].astype(up.dtype)
    img = blocks_apply(params["blocks_image"], img, _decode_block_cfg(tcfg))
    pred_embed = distill_head(params, img, tcfg)
    loss_distill = mse_loss(pred_embed, batch["clip_embeds"])

    total = (cfg.w_embed * vq_loss + cfg.w_recon * loss_recon
             + cfg.w_distill * loss_distill)
    # codebook usage: fraction of distinct codes hit in this batch
    n_codes = params["vq"]["codebook"].shape[0]
    hits = jnp.zeros((n_codes,), jnp.float32).at[indices.reshape(-1)].set(1.0)
    metrics = {"vq": vq_loss, "recon": loss_recon, "distill": loss_distill,
               "codebook_usage": jnp.mean(hits)}
    return total, metrics


def stage2_loss_scalar(params, batch, rng, cfg: Stage2Config) -> jnp.ndarray:
    """Trainer-compatible scalar wrapper."""
    return stage2_loss(params, batch, rng, cfg)[0]


# trainable-path regexes: drive BOTH the requires-grad-filtered checkpoints
# (runner_base.py:411-434 semantics) and the optimizer freeze mask
# (optim.masked_trainable). Segment-anchored so e.g. "vit/blocks" does not
# match the stage-2 "blocks" recon stack.
# Stage 1 trains Q-Former + ln_vision + projection/ITM/LM heads (only the
# ViT forward is no-grad, blip2_qformer_casual.py:121-124).
STAGE1_TRAINABLE = r"(^|/)(qformer|ln_vision|head|itm_head|lm_head)(/|$)"
STAGE2_TRAINABLE = (r"^(encode_task|decode_task|vq|pos_embed|blocks|"
                    r"pos_embed_image|blocks_image|image_down|"
                    r"reverse_qformer|distill_image_proj)(/|$)")

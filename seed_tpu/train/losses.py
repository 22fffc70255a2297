"""Training losses.

- next-token cross entropy with -100 label masking (the reference's HF
  convention everywhere: torchdata_sft.py mask_left_label / question-span
  masking, train.py compute_loss :70-99)
- label-smoothed InfoNCE contrastive loss with cross-device all-gather
  (stage-1 causal Q-Former: blip2_qformer_casual.py:166-199 /
  base_model.py all_gather_with_grad). On TPU the autograd-aware gather is
  just lax.all_gather inside shard_map — differentiable by construction.
- cosine reconstruction + distillation MSE of stage-2
  (blip2_qformer_codebook_all_image.py:202-206, :322-328)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = IGNORE_INDEX) -> jnp.ndarray:
    """Mean CE over non-ignored positions. logits [B,N,V], labels [B,N]."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = -jnp.sum(tok * valid) / jnp.maximum(1, jnp.sum(valid))
    return loss


def next_token_loss(logits: jnp.ndarray, input_ids: jnp.ndarray,
                    labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Shifted LM loss (labels default to input_ids)."""
    labels = input_ids if labels is None else labels
    return cross_entropy(logits[:, :-1], labels[:, 1:])


def info_nce(image_feat: jnp.ndarray, text_feat: jnp.ndarray,
             temp: jnp.ndarray, axis_name: Optional[str] = None,
             label_smoothing: float = 0.1) -> jnp.ndarray:
    """Bidirectional contrastive loss over all devices.

    image_feat/text_feat [B, D] L2-normalized. When ``axis_name`` is given
    (inside shard_map/pjit with a named axis) features are all-gathered so
    each device contrasts its B local examples against the global batch —
    the semantics of concat_all_gather in the reference (:166-170), but
    differentiable without the manual grad-stitching.
    """
    if axis_name is not None:
        all_img = jax.lax.all_gather(image_feat, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(text_feat, axis_name, tiled=True)
        my = jax.lax.axis_index(axis_name)
    else:
        all_img, all_txt = image_feat, text_feat
        my = 0
    B = image_feat.shape[0]
    sim_i2t = (image_feat @ all_txt.T) / temp           # [B, G]
    sim_t2i = (text_feat @ all_img.T) / temp
    targets = my * B + jnp.arange(B)

    G = all_txt.shape[0]
    onehot = jax.nn.one_hot(targets, G)
    smoothed = onehot * (1 - label_smoothing) + label_smoothing / G

    def ce(sim):
        logp = jax.nn.log_softmax(sim.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(smoothed * logp, axis=-1))

    return 0.5 * (ce(sim_i2t) + ce(sim_t2i))


def cosine_recon_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """calculate_rec_loss (:202-206): mean(1 - cos_sim) over tokens."""
    pn = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
    tn = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    return jnp.mean(1.0 - jnp.sum(pn * tn, axis=-1))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))

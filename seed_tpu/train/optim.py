"""Optimizers and LR schedules.

Rebuilds the reference's training hyperparameters:
- cosine-with-minimum-floor schedule (MultiModalLLM/src/train/
  optimization.py:18-67, ``0.5*((1+r)+(1-r)cos(pi*2c*p))``)
- AdamW beta=(0.9, 0.95)/(0.9, 0.999), eps, weight decay with
  no-decay param groups (LAVIS runner_base.py:103-134: 1-d params and
  biases excluded from decay)
- LinearWarmupCosineLR of the tokenizer stages (lavis/common/optims.py)
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.partition import path_str


def cosine_with_floor(base_lr: float, warmup_steps: int, total_steps: int,
                      min_lr_ratio: float = 0.0, num_cycles: float = 0.5):
    """transformers-style cosine schedule with a floor (optimization.py:18-29).

    lr(p) = base * max(min_ratio,
                       0.5 * ((1+r) + (1-r) * cos(pi * 2*cycles * p)))"""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        r = min_lr_ratio
        cos = 0.5 * ((1 + r) + (1 - r) * jnp.cos(math.pi * 2.0 * num_cycles * progress))
        decay = jnp.maximum(r, cos)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_lr: float = 0.0, warmup_start_lr: float = -1.0):
    """LAVIS LinearWarmupCosineLRScheduler (optims.py:57-95)."""
    init = warmup_start_lr if warmup_start_lr >= 0 else base_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init + (base_lr - init) * step / jnp.maximum(1.0, warmup_steps)
        progress = step / jnp.maximum(1.0, total_steps)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_step_decay(base_lr: float, warmup_steps: int,
                      steps_per_epoch: int, min_lr: float = 0.0,
                      decay_rate: float = 1.0, warmup_start_lr: float = -1.0):
    """LAVIS LinearWarmupStepLRScheduler (optims.py:13-52): linear warmup
    over epoch 0 (clamped at base_lr past ``warmup_steps``), then a
    per-EPOCH exponential step decay ``max(min_lr, base * rate**epoch)``.

    The reference steps it with (cur_epoch, cur_step); here one global
    step drives both via ``steps_per_epoch``, so it drops into the same
    jitted-train-step slot as the cosine schedules."""
    init = warmup_start_lr if warmup_start_lr >= 0 else base_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(
            base_lr,
            init + (base_lr - init) * step / jnp.maximum(1.0, warmup_steps))
        epoch = jnp.floor(step / jnp.maximum(1.0, steps_per_epoch))
        decay = jnp.maximum(min_lr, base_lr * decay_rate ** epoch)
        return jnp.where(epoch < 1, warm, decay)

    return schedule


def _decay_mask(params):
    """True = apply weight decay. Excludes 1-d params (norm scales, biases)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: (x.ndim >= 2
                         and "bias" not in path_str(path)
                         and "embedding" not in path_str(path)),
        params)


def adamw(schedule, b1: float = 0.9, b2: float = 0.95, eps: float = 1e-5,
          weight_decay: float = 0.0, clip_norm: Optional[float] = 1.0,
          params: Any = None):
    """AdamW with global-norm clipping and no-decay groups.

    Defaults match the LLM pretrain recipe
    (train_a100_lora_multi_node_pretrain.sh: adam beta2 0.95, eps 1e-5,
    max_grad_norm 1.0).
    """
    txs = []
    if clip_norm:
        txs.append(optax.clip_by_global_norm(clip_norm))
    mask = _decay_mask(params) if (params is not None and weight_decay) else None
    txs.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=mask))
    return optax.chain(*txs)


def masked_trainable(tx, params: Any, trainable_pattern: str):
    """Zero updates for params NOT matching ``trainable_pattern``.

    stop_gradient on frozen towers zeroes their *gradients*, but AdamW's
    decoupled weight decay still shrinks them (update = adam + wd*param) —
    this wrapper pins frozen params exactly, matching the reference's
    requires_grad=False semantics (blip2_qformer_codebook_all_image.py
    :69-100: frozen ViT/Q-Former never enter the optimizer)."""
    import re
    pat = re.compile(trainable_pattern)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if pat.search(path_str(path)) else "freeze",
        params)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                 param_labels=labels)


def learnable_image_embeddings_only(tx, old_vocab_size: int,
                                    vocab_size: Optional[int] = None):
    """Restrict embed_tokens / lm_head updates to the NEW image-token rows.

    The reference's ``get_learnable_image_embedding_model`` registers a
    gradient hook that zeroes every OLD-vocab row of the input and output
    embedding gradients, so only the 8194 added rows (image codes + BOI/
    EOI) train (MultiModalLLM/src/model/peft_model.py:130-163). Here the
    same contract is an optax wrapper that zeroes the frozen rows of the
    RAW gradients before ``tx`` — exactly where the reference hook acts,
    so global-norm clipping and Adam moments inside ``tx`` see identical
    gradients — AND masks the final update again (stronger than the hook:
    decoupled weight decay cannot shrink frozen rows either):

    - ``embed_tokens/embedding`` [V, D]: rows outside
      [old_vocab_size, vocab_size) get a zero update;
    - ``lm_head/kernel`` [D, V] (in->out convention; torch's [V, D]
      transposed at conversion): same mask on the LAST axis;
    - every other leaf passes through untouched.

    ``vocab_size`` bounds the trainable region so vocab-PADDING rows
    (padded_vocab > vocab_size) stay pinned too; None = no upper bound.
    """
    def row_mask(n):                      # True = trainable row
        idx = jnp.arange(n)
        keep = idx >= old_vocab_size
        if vocab_size is not None:
            keep &= idx < vocab_size
        return keep

    def mask_updates(updates):
        def apply(path, u):
            name = path_str(path)
            if name.endswith("embed_tokens/embedding"):
                return jnp.where(row_mask(u.shape[-2])[:, None], u, 0)
            if name.endswith("lm_head/kernel"):
                return jnp.where(row_mask(u.shape[-1])[None, :], u, 0)
            return u
        return jax.tree_util.tree_map_with_path(apply, updates)

    def init_fn(params):
        return tx.init(params)

    def update_fn(grads, state, params=None):
        updates, state = tx.update(mask_updates(grads), state, params)
        return mask_updates(updates), state

    return optax.GradientTransformation(init_fn, update_fn)

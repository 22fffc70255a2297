"""LoRA adapters, functional style.

Reference recipe (MultiModalLLM/src/model/peft_model.py:84-117 +
configs/model/vicuna_7b_lora.yaml): r=16, alpha=32, adapters on all 7
projection matrices (q/k/v/o/gate/up/down), with embed_tokens / lm_head /
norm scales fully trainable (``modules_to_save``) so the 8194 new image-
token rows can learn.

TPU-first: adapters live in a *parallel pytree*; the train step merges
``kernel + (alpha/r) * A @ B`` functionally before the forward — XLA fuses
the rank-16 matmul + add into the parameter all-gather epilogue under FSDP,
so there is no persistent merged copy. Gradients are taken w.r.t. the
adapter tree only; the base tree stays frozen (and can stay bf16).

``merge_lora_weights`` reproduces src/tools/merge_lora_weights.py:27-45.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..parallel.partition import path_str

DEFAULT_TARGETS = r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$"
DEFAULT_SAVE = r"(embed_tokens|lm_head|input_layernorm|post_attention_layernorm|/norm)/"


def init_lora(key, params, r: int = 16, alpha: int = 32,
              targets: str = DEFAULT_TARGETS, dtype=jnp.float32):
    """Build the adapter tree: for every matched [in, out] kernel, A [in, r]
    (gaussian) and B [r, out] (zeros — adapters start as identity).

    The returned tree contains only arrays (differentiable/shardable);
    the alpha/r scale is folded into a 0-d array leaf."""
    pat = re.compile(targets)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapters = {}
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        name = path_str(path)
        if pat.search(name) and leaf.ndim >= 2:
            # leading dims (e.g. the stacked-layer axis) become batch dims
            *batch, d_in, d_out = leaf.shape
            adapters[name] = {
                "a": (jax.random.normal(k, (*batch, d_in, r)) * 0.02).astype(dtype),
                "b": jnp.zeros((*batch, r, d_out), dtype),
            }
    return {"adapters": adapters,
            "scale": jnp.asarray(alpha / r, jnp.float32)}


def apply_lora(params, lora) -> Any:
    """Return params with adapters merged (pure; no copy of unmatched leaves)."""
    if lora is None:
        return params
    # fixed hyperparameter, not a learnable: block its gradient
    scale = jax.lax.stop_gradient(lora["scale"])
    adapters = lora["adapters"]

    def merge(path, leaf):
        name = path_str(path)
        ad = adapters.get(name)
        if ad is None:
            return leaf
        # batched matmul over any leading (stacked-layer) axes
        delta = jnp.matmul(ad["a"].astype(jnp.float32),
                           ad["b"].astype(jnp.float32)) * scale
        return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora_weights(params, lora):
    """Permanent merge for export (merge_and_unload equivalent)."""
    return apply_lora(params, lora)


# --- trainable/frozen split (modules_to_save) ------------------------------

def split_trainable(params, patterns: str = DEFAULT_SAVE):
    """Split a param tree into (trainable, frozen) by path regex.

    Returns (trainable_tree, frozen_tree, combine_fn) where the trees have
    the full structure with None at complementary leaves.
    """
    pat = re.compile(patterns)

    def pick(path, leaf, want_trainable):
        hit = bool(pat.search(path_str(path)))
        return leaf if hit == want_trainable else None

    trainable = jax.tree_util.tree_map_with_path(
        lambda p, l: pick(p, l, True), params)
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, l: pick(p, l, False), params)

    def combine(tr, fr):
        return jax.tree.map(lambda a, b: a if a is not None else b, tr, fr,
                            is_leaf=lambda x: x is None)

    return trainable, frozen, combine

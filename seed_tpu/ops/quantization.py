"""Int8 weight-only quantization for serving.

The reference serves SEED-LLaMA-8B/14B in 8-bit via bitsandbytes
(configs/llm/seed_llama_8b_8bit.yaml ``load_in_8bit: True`` — the 16GB/24GB
single-GPU demo). TPU-native equivalent: per-output-channel absmax int8
weights with an fp scale folded into the matmul epilogue —
``y = (x @ w_q) * scale`` is exact w.r.t. the per-column quantization and
XLA fuses the cast + scale into the MXU matmul. Halves HBM for weights
(the decode-bandwidth bottleneck), so it is also a throughput feature, not
just a memory one.

``layers.linear`` understands the quantized param format
({"kernel_q": int8 [in, out], "scale": [out], "bias"?}) transparently, so
quantized trees drop into every model unchanged.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..parallel.partition import path_str

DEFAULT_TARGETS = (r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|"
                   r"down_proj|lm_head)/kernel$")


def quantize_weight(w: jnp.ndarray) -> dict:
    """[..., in, out] float -> int8 + per-output-channel scale."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)       # per column
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.squeeze(-2)}


def dequantize_weight(p: dict) -> jnp.ndarray:
    return p["kernel_q"].astype(jnp.float32) * p["scale"][..., None, :]


def quantize_acts(x: jnp.ndarray, axis: int = -1):
    """Dynamic per-token absmax int8 activation quantization.

    Returns (q int8, scale fp32 with ``axis`` kept at size 1). Used by the
    W8A8 path (layers.linear_w8a8): on v5e the int8 MXU path has 2x the
    bf16 TOPS (394 vs 197), so quantizing the *activations* of big frozen
    matmuls (the EVA-ViT encoder — reference 8-bit serving,
    configs/llm/seed_llama_8b_8bit.yaml) roughly doubles encode throughput.
    The quantize/dequantize VPU work fuses into the surrounding ops."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


# the four hot matmuls of every stacked ViT block (qkv/proj/fc1/fc2);
# patch_embed (one thin K=588 matmul) and all norms/VQ stay high precision
VIT_TARGETS = r"blocks/(attn/(qkv|proj)|mlp/fc[12])/kernel$"


def quantize_tree(params: Any, targets: str = DEFAULT_TARGETS) -> Any:
    """Quantize all kernels whose path matches ``targets``; bias and other
    leaves pass through. Works on stacked [L, in, out] kernels."""
    pat = re.compile(targets)

    def walk(tree, prefix):
        if isinstance(tree, dict):
            if "kernel" in tree and pat.search(prefix + "/kernel"):
                out = {k: v for k, v in tree.items() if k != "kernel"}
                out.update(quantize_weight(tree["kernel"]))
                return out
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
        return tree

    return walk(params, "")


def quantized_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

"""Functional NN primitives on plain pytree params.

Models in seed_tpu are pure functions over nested-dict parameter trees
(leaves are jnp arrays). This keeps pjit sharding, checkpoint conversion
(torch name -> tree path) and functional transforms trivial compared to a
stateful module system.

Conventions:
- ``linear`` params: {"kernel": [in, out], "bias": [out]} (JAX layout;
  torch ``nn.Linear.weight`` [out, in] is transposed at conversion time).
- LayerNorm always computes in fp32 and casts back — matching the
  reference's fp32-LayerNorm wrapper (models/seed_qformer/blip2.py:179-184)
  and required for bit-stable statistics in bf16.
- ``gelu`` is the *exact* erf GELU: torch ``nn.GELU`` / BERT's ACT2FN["gelu"]
  are erf-based, while jax.nn.gelu defaults to the tanh approximation.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:
        # int8 weight-only path (ops/quantization.py): per-output-channel
        # scale applied in the matmul epilogue — exact w.r.t. quantization.
        # On TPU, 2-D weights route through the fused Pallas kernel that
        # dequantizes in VMEM (no bf16 weight copy in HBM).
        wq = p["kernel_q"]
        if wq.ndim == 2:
            from ..ops.int8_matmul import can_use_kernel, int8_matmul
            K, N = wq.shape
            lead = x.shape[:-1]
            M = 1
            for d in lead:
                M *= d
            if can_use_kernel(M, K, N):
                y = int8_matmul(x.reshape(M, K), wq, p["scale"])
                y = y.reshape(*lead, N)
            else:
                y = (x @ wq.astype(x.dtype)) * p["scale"].astype(x.dtype)
        else:
            y = (x @ wq.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def linear_w8a8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 linear: dynamic int8 activations x int8 weights -> int32 MXU.

    v5e has 394 int8 TOPS vs 197 bf16 TFLOP/s; routing a big frozen matmul
    here ~doubles its ceiling. Exactness: the int8 x int8 -> int32 product
    is exact; the only error is the two absmax quantizations (per-token
    activation row, per-output-channel weight column).
    p: {"kernel_q": int8 [in, out], "scale": [out], "bias"?: [out]}.
    """
    # NOTE: always the XLA dot. A Pallas int8 kernel was built and
    # measured (ops/int8_matmul.w8a8_matmul): Mosaic's int8 dot lowering
    # reaches only ~67 TOP/s at square-4096 (XLA: 229) and 0.35x XLA at
    # the ViT qkv shape — the native int8 MXU path is not reachable from
    # Pallas today, so XLA wins. See PERF.md round 2.
    from ..ops.quantization import quantize_acts
    xq, xs = quantize_acts(x)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * p["scale"].astype(jnp.float32)
    y = y.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig)


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    orig = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(orig)


def embed(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    # clip OOB ids: JAX's default fill mode yields NaN rows for bad inputs
    return jnp.take(p["embedding"], ids, axis=0, mode="clip")


# --------------------------- initializers ---------------------------------

def init_linear(key, d_in: int, d_out: int, bias: bool = True,
                dtype=jnp.float32, std: Optional[float] = None) -> Params:
    std = std if std is not None else (1.0 / jnp.sqrt(d_in))
    k = jax.random.truncated_normal(key, -2, 2, (d_in, d_out)) * std
    p = {"kernel": k.astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def init_embed(key, n: int, dim: int, dtype=jnp.float32, std: float = 0.02) -> Params:
    e = jax.random.normal(key, (n, dim)) * std
    return {"embedding": e.astype(dtype)}


def split_keys(key, n: int):
    return list(jax.random.split(key, n))


def cast_tree(tree, dtype):
    """Cast all float leaves of a param tree (bf16 serving / fp32 training)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))

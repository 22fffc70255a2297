#!/usr/bin/env python
"""Attribute EVA-ViT-g encode time: which component eats the non-matmul half?

In-graph fc1-shaped matmuls hit ~150 TF/s but the full ViT runs at ~83
TF/s (PERF.md). This probe times the 39-block scan at batch 64 with
components ablated one at a time (attention -> identity, exact-erf GELU ->
tanh, fp32 LN -> bf16, head_dim 88 -> padded 128) to find the overhead.
Ablated variants are NOT numerically equivalent — timing only.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, N, D, HEADS, MLP, DEPTH = 64, 257, 1408, 16, 6144, 39
HD = D // HEADS  # 88


def make_params(pad_hd=False):
    rng = np.random.RandomState(0)
    hd = 128 if pad_hd else HD
    qkv_out = 3 * HEADS * hd

    def m(*s):
        return jnp.asarray(rng.randn(*s) * 0.02, jnp.bfloat16)

    blk = {
        "ln1_s": jnp.ones((DEPTH, D), jnp.float32),
        "ln1_b": jnp.zeros((DEPTH, D), jnp.float32),
        "qkv": m(DEPTH, D, qkv_out),
        "proj": m(DEPTH, HEADS * hd, D),
        "ln2_s": jnp.ones((DEPTH, D), jnp.float32),
        "ln2_b": jnp.zeros((DEPTH, D), jnp.float32),
        "fc1": m(DEPTH, D, MLP),
        "fc2": m(DEPTH, MLP, D),
    }
    return blk


def ln(x, s, b, fp32=True):
    if fp32:
        xf = x.astype(jnp.float32)
    else:
        xf = x
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * s + b
    return y.astype(x.dtype)


def vit_scan(p, x, *, attn="real", gelu="erf", ln_fp32=True, hd=HD):
    def block(carry, bp):
        x = carry
        h = ln(x, bp["ln1_s"], bp["ln1_b"], ln_fp32)
        qkv = h @ bp["qkv"]
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(B, N, HEADS, hd)
        k = k.reshape(B, N, HEADS, hd)
        v = v.reshape(B, N, HEADS, hd)
        if attn == "real":
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits / np.sqrt(hd), axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", w.astype(v.dtype), v)
        elif attn == "skip":
            o = v
        o = o.reshape(B, N, HEADS * hd)
        x = x + o @ bp["proj"]
        h = ln(x, bp["ln2_s"], bp["ln2_b"], ln_fp32)
        h1 = h @ bp["fc1"]
        if gelu == "erf":
            h1 = jax.nn.gelu(h1, approximate=False)
        elif gelu == "tanh":
            h1 = jax.nn.gelu(h1, approximate=True)
        x = x + h1 @ bp["fc2"]
        return x, None

    out, _ = jax.lax.scan(block, x, p)
    return out


def timeit(fn, *args, iters=6):
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    x = jnp.asarray(np.random.RandomState(1).randn(B, N, D), jnp.bfloat16)
    p = make_params()
    p128 = make_params(pad_hd=True)
    # matmul flops only (attn flops excluded for comparability)
    flops = 2 * B * N * D * (3 * D + D + 2 * MLP) * DEPTH

    variants = [
        ("baseline (erf, fp32 LN, hd88)",
         dict(attn="real", gelu="erf", ln_fp32=True)),
        ("attn skipped",
         dict(attn="skip", gelu="erf", ln_fp32=True)),
        ("gelu tanh",
         dict(attn="real", gelu="tanh", ln_fp32=True)),
        ("ln bf16",
         dict(attn="real", gelu="erf", ln_fp32=False)),
        ("all cheap",
         dict(attn="skip", gelu="tanh", ln_fp32=False)),
    ]
    for tag, kw in variants:
        f = jax.jit(functools.partial(vit_scan, **kw))
        dt = timeit(f, p, x)
        print(f"{tag:32s}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TF/s "
              f" {B/dt:6.1f} img/s", flush=True)
    # head_dim padded to 128 (qkv/proj reshaped accordingly)
    f = jax.jit(functools.partial(vit_scan, attn="real", gelu="erf",
                                  ln_fp32=True, hd=128))
    dt = timeit(f, p128, x)
    print(f"{'hd padded 128':32s}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TF/s "
          f" {B/dt:6.1f} img/s", flush=True)

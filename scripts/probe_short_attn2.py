#!/usr/bin/env python
"""Round-3 tuning probes for the short-sequence ViT attention kernel.

Shipped kernel (ops/flash_attention._short_mha): grid (B, 2), 8 heads per
program, per-head python loop, fp32 one-pass softmax, norm-at-end —
1.57 ms/call at the EVA shape (B=64 S=257 H=16 D=88), 61 ms of a 234 ms
fast-path encode. MXU floor for the padded matmuls is ~3.1 us/program vs
12.3 us measured, so ~4x is in softmax VPU passes / head-loop serialization.

Variants probed here:
- base:      the shipped kernel (reference point)
- batched:   ONE jax.lax.dot_general with a batch dim over the head group
             (Mosaic schedules a fused batched matmul instead of a python
             loop of 8 small ones)
- bf16sm:    softmax VPU passes in bf16 (exp/max/sum) — numerics ceiling
             check; NOT parity-safe, measures what fp32 VPU traffic costs
- natural:   q/k/v consumed in the model's natural [B, S, H, D] layout
             (BlockSpec picks (1, S, hg, D)) — no host-side transposes
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, H, D = 64, 257, 16, 88
ITERS = 30
SCALE = D ** -0.5


def _kernel_base(q_ref, k_ref, v_ref, o_ref, *, heads):
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _kernel_batched(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                                    # [hg, S, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * SCALE  # [hg, S, S]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [hg, S, D]
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_bf16sm(q_ref, k_ref, v_ref, o_ref, *, heads):
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16) * jnp.bfloat16(SCALE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _kernel_natural(q_ref, k_ref, v_ref, o_ref, *, heads):
    # refs are [1, S, hg, D]
    for h in range(heads):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h, :] = (o / l).astype(o_ref.dtype)


def attn(qt, kt, vt, variant, groups):
    hg = H // groups
    if variant == "natural":
        # inputs [B, S, H, D]
        return pl.pallas_call(
            functools.partial(_kernel_natural, heads=hg),
            out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            grid=(B, groups),
            in_specs=[pl.BlockSpec((1, S, hg, D), lambda b, g: (b, 0, g, 0))] * 3,
            out_specs=pl.BlockSpec((1, S, hg, D), lambda b, g: (b, 0, g, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(qt, kt, vt)
    kern = {"base": functools.partial(_kernel_base, heads=hg),
            "bf16sm": functools.partial(_kernel_bf16sm, heads=hg),
            "batched": _kernel_batched}[variant]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=(B, groups),
        in_specs=[pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt)


def timeit(variant, groups):
    rng = np.random.RandomState(0)
    shape = (B, S, H, D) if variant == "natural" else (B, H, S, D)
    qt = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    vt = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    def body(i, q):
        return attn(q, kt, vt, variant, groups)

    @jax.jit
    def loop(q):
        return jax.lax.fori_loop(0, ITERS, body, q)

    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  shape B{B} S{S} H{H} D{D}", flush=True)
    for variant, groups_list in (
        ("base", (2,)),
        ("batched", (1, 2, 4)),
        ("bf16sm", (2,)),
        ("natural", (2,)),
    ):
        for groups in groups_list:
            try:
                ms = timeit(variant, groups)
                print(f"{variant:8s} groups={groups}: {ms:6.3f} ms/call "
                      f"({ms*39:5.1f} ms per encode)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"{variant:8s} groups={groups}: failed "
                      f"{type(e).__name__}: {msg}", flush=True)

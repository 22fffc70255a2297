#!/usr/bin/env python
"""Tune the short-sequence attention kernel (ops/flash_attention._short_mha)
at the EVA-ViT shape: B=64, S=257, H=16, D=88.

Times kernel variants inside one compiled fori_loop (o fed back into q for
data dependence). Shipped kernel = variant "base". Tested levers:
- "norm_end": scale the [S, D] output by 1/l instead of dividing the
  [S, S] probability block (fewer VPU passes)
- "groups=G": grid (B, G) with H/G heads per program (smaller DMA chunks,
  more grid-level pipelining overlap)
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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads, norm_end):
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
        if norm_end:
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = (o / l).astype(o_ref.dtype)
        else:
            p = (p / l).astype(v.dtype)
            o_ref[0, h] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def attn(qt, kt, vt, groups, norm_end):
    hg = H // groups
    return pl.pallas_call(
        functools.partial(_kernel, heads=hg, norm_end=norm_end),
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=(B, groups),
        in_specs=[
            pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, S, D), lambda b, g: (b, g, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt)


def timeit(groups, norm_end):
    rng = np.random.RandomState(0)
    qt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    vt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    def body(i, q):
        return attn(q, kt, vt, groups, norm_end)

    @jax.jit
    def loop(q):
        return jax.lax.fori_loop(0, ITERS, body, q)

    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  shape B{B} S{S} H{H} D{D}",
          flush=True)
    for groups in (1, 2, 4):
        for norm_end in (False, True):
            try:
                ms = timeit(groups, norm_end)
                print(f"groups={groups} norm_end={int(norm_end)}: "
                      f"{ms:6.3f} ms/call ({ms*39:5.1f} ms per encode)",
                      flush=True)
            except Exception as e:
                print(f"groups={groups} norm_end={int(norm_end)}: "
                      f"failed {type(e).__name__}: {e}", flush=True)

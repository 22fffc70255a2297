#!/usr/bin/env python
"""Round-5 tuning probes for the short-sequence ViT attention kernel.

State after round 3 (probe_short_attn2.py): shipped kernel = grid (B, 2),
8 heads/program, ONE batched dot_general pair, fp32 one-pass softmax,
norm-at-end — 1.327 ms/call at the EVA shape (B=64 S=257 H=16 D=88),
~52 ms of a 231 ms fast-path encode. Residue vs the ~3.1 us/program MXU
floor is fp32 softmax VPU passes over the [hg, S, S] score block.
Direct bf16 matmul accumulation and the natural [B,S,H,D] BlockSpec both
failed to compile in round-3 Mosaic.

Round-5 variants (VERDICT r04 next #8 — "land one new lever or prove
the floor"):

- batched:   the shipped kernel (reference point)
- onescol:   fuse the softmax row-sum into the PV matmul — append a
             ones column to v ([hg, S, D+1]); since D=88 pads to 128
             lanes the extra column is FREE on the MXU, and the
             separate [hg, S, S] VPU sum pass disappears.
             l = o_ext[..., D:D+1], o = o_ext[..., :D] / l.
- bf16pass:  fp32-accumulated QK dot (Mosaic-legal), then ONE cast of
             the score block to bf16; max/exp run on bf16 (half the
             VPU bytes per pass); sum+normalize fp32. Numerics: exp in
             bf16 — fast path only, agreement re-measured end-to-end.
- bf16ones:  bf16pass + onescol composed (cast, bf16 max/exp, PV+sum
             in one MXU dot with fp32 acc).
- b2:        two batch elements per program (block (2, hg, S, D)) —
             halves the program count; probes the per-program fixed
             cost that head-grouping left on the table.
- bf16acc:   re-test of the round-3 Mosaic failure (QK dot with
             preferred_element_type=bf16) on the current toolchain.

    PYTHONPATH=/root/repo python scripts/probe_short_attn3.py
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


def _qk(q, k, acc=jnp.float32):
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=acc)


def _pv(p, v):
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _kernel_batched(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = _qk(q, k) * SCALE                            # [hg, S, S] fp32
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = _pv(p.astype(v.dtype), v)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_onescol(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = _qk(q, k) * SCALE
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m).astype(v.dtype)
    ones = jnp.ones((v.shape[0], v.shape[1], 1), v.dtype)
    vx = jnp.concatenate([v, ones], axis=2)          # [hg, S, D+1]
    ox = _pv(p, vx)                                  # [hg, S, D+1] fp32
    l = ox[:, :, D:D + 1]
    o_ref[0] = (ox[:, :, :D] / l).astype(o_ref.dtype)


def _kernel_bf16pass(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = (_qk(q, k) * SCALE).astype(jnp.bfloat16)     # one cast pass
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)                               # bf16 VPU pass
    l = jnp.sum(p.astype(jnp.float32), axis=2, keepdims=True)
    o = _pv(p, v)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_bf16ones(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = (_qk(q, k) * SCALE).astype(jnp.bfloat16)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    ones = jnp.ones((v.shape[0], v.shape[1], 1), v.dtype)
    vx = jnp.concatenate([v, ones], axis=2)
    ox = _pv(p, vx)
    l = ox[:, :, D:D + 1]
    o_ref[0] = (ox[:, :, :D] / l).astype(o_ref.dtype)


def _kernel_b2(q_ref, k_ref, v_ref, o_ref):
    for b in range(2):
        q, k, v = q_ref[b], k_ref[b], v_ref[b]
        s = _qk(q, k) * SCALE
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=2, keepdims=True)
        o = _pv(p.astype(v.dtype), v)
        o_ref[b] = (o / l).astype(o_ref.dtype)


def _kernel_bf16acc(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = _qk(q, k, acc=jnp.bfloat16) * jnp.bfloat16(SCALE)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p.astype(jnp.float32), axis=2, keepdims=True)
    o = _pv(p, v)
    o_ref[0] = (o / l).astype(o_ref.dtype)


KERNELS = {
    "batched": _kernel_batched,
    "onescol": _kernel_onescol,
    "bf16pass": _kernel_bf16pass,
    "bf16ones": _kernel_bf16ones,
    "b2": _kernel_b2,
    "bf16acc": _kernel_bf16acc,
}


def attn(qt, kt, vt, variant, groups):
    hg = H // groups
    bb = 2 if variant == "b2" else 1
    return pl.pallas_call(
        KERNELS[variant],
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=(B // bb, groups),
        in_specs=[pl.BlockSpec((bb, hg, S, D), lambda b, g: (b, g, 0, 0))] * 3,
        out_specs=pl.BlockSpec((bb, hg, S, D), lambda b, g: (b, g, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt)


def timeit(variant, groups):
    rng = np.random.RandomState(0)
    qt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    vt = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    def body(i, q):
        return attn(q, kt, vt, variant, groups)

    @jax.jit
    def loop(q):
        return jax.lax.fori_loop(0, ITERS, body, q)

    ref = np.asarray(attn(qt, kt, vt, "batched", 2), np.float32)
    got = np.asarray(attn(qt, kt, vt, variant, groups), np.float32)
    err = float(np.max(np.abs(ref - got)))
    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    out = loop(qt); np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3, err


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  shape B{B} S{S} H{H} D{D}", flush=True)
    for variant, groups_list in (
        ("batched", (2,)),
        ("onescol", (1, 2)),
        ("bf16pass", (2,)),
        ("bf16ones", (1, 2)),
        ("b2", (2,)),
        ("bf16acc", (2,)),
    ):
        for groups in groups_list:
            try:
                ms, err = timeit(variant, groups)
                print(f"{variant:9s} groups={groups}: {ms:6.3f} ms/call "
                      f"({ms*39:5.1f} ms/encode)  max|err|={err:.3e}",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"{variant:9s} groups={groups}: failed "
                      f"{type(e).__name__}: {msg}", flush=True)

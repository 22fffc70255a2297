"""Fused int8-weight matmul Pallas kernel.

Why: the XLA lowering of ``x @ w_q.astype(bf16) * scale`` materializes a
full bf16 copy of the weights in HBM — for the 8B decoder that triples the
weight traffic (int8 read + bf16 write + bf16 read ~= 33 GB/step) and
erases the memory-bandwidth win of int8 serving. This kernel dequantizes
*in VMEM*: HBM sees only the int8 bytes.

    y[M, N] = (x[M, K] @ w_q[K, N]) * scale[N]

- grid (M/bm, N/bn, K/bk), fp32 VMEM accumulator, per-output-column scale
  applied on the last K tile (exact w.r.t. per-column quantization)
- int8 tiles convert to bf16 inside the kernel (VPU) right before the MXU
- falls back to the XLA path for shapes that don't tile (layers.linear
  handles dispatch).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, k_tiles: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = wq_ref[...].astype(x_ref.dtype)          # int8 -> bf16 in VMEM
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _store():
        scale = scale_ref[...].astype(jnp.float32)     # [1, bn]
        o_ref[...] = (acc_ref[...] * scale).astype(o_ref.dtype)


def _pick_block(dim: int, prefer: int) -> Optional[int]:
    for b in (prefer, 512, 256, 128):
        if b <= dim and dim % b == 0:
            return b
    return None


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 256, block_n: int = 512,
                block_k: int = 512) -> jnp.ndarray:
    """x [M, K] (bf16/f32), w_q [K, N] int8, scale [N] -> [M, N] x.dtype."""
    M, K = x.shape
    N = w_q.shape[1]
    bm = min(block_m, max(16, M))
    # pad M to the tile
    m_pad = (-M) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = x.shape[0]
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    if bn is None or bk is None:
        raise ValueError(f"N={N} K={K} must tile by 128")
    k_tiles = K // bk

    out = pl.pallas_call(
        functools.partial(_kernel, k_tiles=k_tiles),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Mp // bm, N // bn, k_tiles),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(x, w_q, scale.reshape(1, N))
    return out[:M] if m_pad else out


def can_use_kernel(m: int, k: int, n: int) -> bool:
    """Dispatch predicate: tiling feasibility AND a shape where the kernel
    measured faster than the XLA dequant path.

    At decode shapes (M = batch <= 32) the kernel is a measured regression
    (118 -> 109 tok/s at B8, PERF.md): with tiny M the MXU is idle either
    way and the kernel's own grid overhead dominates, while XLA fuses the
    dequant into its matmul. Require a real M tile (>= 256) so only
    prefill/training-sized matmuls route here."""
    return (m >= 256
            and _pick_block(n, 512) is not None
            and _pick_block(k, 512) is not None)

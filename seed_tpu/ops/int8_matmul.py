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


def _w8a8_kernel(xq_ref, wq_ref, xs_ref, ws_ref, o_ref, acc_ref, *,
                 k_tiles: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 x int8 -> int32 natively on the MXU (394 TOP/s on v5e).
    # This is the whole point: XLA's lowering of the same dot_general at
    # ViT shapes (K=1408) only reaches ~112-155 TOP/s (PERF.md round 2,
    # scripts/probe_int8_shapes.py) — barely above its bf16 rate.
    acc_ref[...] += jax.lax.dot(xq_ref[...], wq_ref[...],
                                preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _store():
        # exact dequant epilogue: int32 products scaled by per-token
        # activation scale [bm, 1] x per-column weight scale [1, bn]
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * xs_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def w8a8_matmul(xq: jnp.ndarray, x_scale: jnp.ndarray, w_q: jnp.ndarray,
                w_scale: jnp.ndarray, out_dtype=jnp.bfloat16,
                block_m: int = 512, block_n: int = 1536,
                block_k: int = 2048) -> jnp.ndarray:
    """Fully-quantized matmul: ``(xq @ w_q) * x_scale * w_scale``.

    xq [M, K] int8, x_scale [M, 1] f32 (per-token), w_q [K, N] int8,
    w_scale [N] f32 (per-column) -> [M, N] ``out_dtype``. M is padded to
    the tile internally (zero rows quantize exactly).

    **NOT dispatched in production** (layers.linear_w8a8 uses the XLA
    dot): measured on v5e, Mosaic's int8 dot lowering reaches only
    ~67 TOP/s at square-4096 where XLA reaches 229, and 0.35x XLA at the
    ViT qkv shape — Pallas cannot currently emit the native int8 MXU
    path. Kept (with parity tests) as the harness to re-measure against
    future Mosaic releases.
    """
    M, K = xq.shape
    N = w_q.shape[1]
    bn = _pick_w8a8_block(N, block_n)
    bk = _pick_w8a8_block(K, block_k)
    bm = min(block_m, max(128, M))
    m_pad = (-M) % bm
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, m_pad), (0, 0)),
                          constant_values=1.0)
    Mp = xq.shape[0]
    k_tiles = K // bk

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, k_tiles=k_tiles),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Mp // bm, N // bn, k_tiles),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(xq, w_q, x_scale.astype(jnp.float32), w_scale.reshape(1, N).astype(jnp.float32))
    return out[:M] if m_pad else out


def _pick_w8a8_block(dim: int, prefer: int) -> int:
    """Largest 128-multiple divisor of ``dim`` that is <= ``prefer``
    (falling back to the full dim when it is itself small)."""
    if dim <= prefer:
        return dim
    best = None
    for mult in range(prefer // 128, 0, -1):
        b = mult * 128
        if dim % b == 0:
            best = b
            break
    if best is None:
        raise ValueError(f"dim {dim} has no 128-multiple block <= {prefer}")
    return best


def can_use_w8a8_kernel(m: int, k: int, n: int) -> bool:
    """W8A8 kernel dispatch: K and N must tile by 128; require a real M
    so the grid amortizes (encode/prefill/training shapes, not decode)."""
    if m < 256 or k % 128 or n % 128:
        return False
    try:
        _pick_w8a8_block(n, 1536), _pick_w8a8_block(k, 2048)
        return True
    except ValueError:
        return False


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

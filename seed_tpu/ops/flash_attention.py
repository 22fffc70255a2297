"""Pallas TPU flash attention (forward) with online softmax.

Replaces the capability the reference gets from xformers
memory-efficient attention (models/llama_xformer.py:244-255) and
flash-attn-2 (MultiModalLLM/src/model/modeling_llama_4_35_0.py:415-576):
O(seq) memory attention that never materializes the [S, S] score matrix.

Kernel design (see the JAX pallas ops it is modeled on):
- grid (batch, heads, q_tiles, kv_tiles); kv dimension is the sequential
  online-softmax reduction, the rest are parallel
- fp32 running max m / sum l / accumulator in VMEM scratch, persisting
  across kv tiles of one q tile
- causal mode skips whole kv tiles above the diagonal and element-masks
  the diagonal tile; mask value is -0.7*f32_max (never -inf: exp(-inf -
  -inf) = NaN)
- differentiable via custom_vjp: the backward recomputes attention with
  the XLA einsum path (training seq lens in the reference are <= 1024,
  where recompute is cheaper than a dedicated bwd kernel; pair with
  jax.checkpoint for layer-level remat)

The public entry ``flash_attention(q, k, v)`` takes [B, S, H, D] (the
seed_tpu convention), handles GQA by repeating kv heads, pads S to the
128-tile and D to the 128-lane boundary, and falls back to the XLA path
for tiny shapes where kernel launch overhead dominates.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
BLOCK_Q = 128
BLOCK_K = 128
MIN_FLASH_SEQ = 256   # below this the XLA path is faster (launch overhead)


def _interpret() -> bool:
    # CPU has no Mosaic backend: run the kernel in interpreter mode there
    # (the CI/test path); on TPU compile for real.
    return jax.default_backend() != "tpu"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  causal: bool, sm_scale: float, kv_tiles: int,
                  q_offset: int, kv_len: int, block_q: int, block_k: int):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal tile skip: run only if this kv tile intersects the triangle
    if causal:
        should_run = (qi + 1) * block_q + q_offset > ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]                       # [BLOCK_Q, D]
        k = k_ref[0, 0]                       # [BLOCK_K, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + qi * block_q + q_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if kv_len % block_k != 0:
            # suppress zero-padded kv columns (non-tile-multiple kv length,
            # e.g. the ViT's 257 patches): zero K rows score 0, not -inf.
            # Only the last kv tile contains padding; others short-circuit
            # on the iota compare (cols < kv_len is all-True there).
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
            s = jnp.where(cols < kv_len, s, MASK_VALUE)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)            # [BQ, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = m_next
        l_scr[:] = l_next

        v = v_ref[0, 0]                       # [BLOCK_K, D]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _store():
        l = l_scr[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def _flash_fwd_bhsd(q, k, v, causal: bool, sm_scale: float, q_offset: int,
                    kv_len: int, block_q: int = BLOCK_Q,
                    block_k: int = BLOCK_K):
    """q [B, H, Sq, D], k/v [B, H, Sk, D] — all padded to tile multiples;
    ``kv_len`` = the real (pre-padding) kv length, masked in-kernel."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    q_tiles, kv_tiles = Sq // block_q, Sk // block_k

    grid = (B, H, q_tiles, kv_tiles)
    kernel = functools.partial(_flash_kernel, causal=causal,
                               sm_scale=sm_scale, kv_tiles=kv_tiles,
                               q_offset=q_offset, kv_len=kv_len,
                               block_q=block_q, block_k=block_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D),
                                   lambda b, h, i, j: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(q, k, v)


def _short_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    """All-heads-per-program attention for short sequences.

    The flash grid above runs ONE (b, h, q_tile, kv_tile) program per
    step, and the TPU grid is sequential: at the ViT's S=257 that is
    B*H tiny programs whose fixed per-step cost (DMA pipeline fill,
    program switch) dwarfs the ~0.4 GFLOP of attention math — measured
    barely faster than the XLA path (398 vs 420 ms full-encode, B=64).
    Here one program handles ALL heads of one batch element: grid (B,),
    an unrolled head loop, and a plain one-pass softmax (the whole
    [S, S] score block lives in VMEM — no online rescaling needed).
    Shapes stay logical (S=257, D=88): Mosaic masks the ragged
    sublane/lane edges, so no host-side padding, masking, or transposed
    copies of the score matrix ever touch HBM.
    """
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]                       # [S, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        # normalize the [S, D] output, not the [S, S] probabilities —
        # one fewer full-score-block VPU pass (measured -21%/call)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _short_mha(q, k, v, sm_scale):
    """Non-causal attention, q/k/v [B, S, H, D], whole-sequence VMEM."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # ~8 heads per program (largest divisor of H): smaller DMA chunks
    # pipeline better across grid steps than one all-heads program
    # (measured: 16 heads 2.09 ms/call, 8 heads 1.57 at the ViT shape)
    groups = 1
    for g in range(max(1, H // 8), 0, -1):
        if H % g == 0:
            groups = g
            break
    hg = H // groups
    out = pl.pallas_call(
        functools.partial(_short_mha_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=(B, groups),
        in_specs=[
            pl.BlockSpec((1, hg, Sq, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, Sk, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, hg, Sk, D), lambda b, g: (b, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, Sq, D), lambda b, g: (b, g, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _short_mha_fwd_rule(q, k, v, sm_scale):
    return _short_mha(q, k, v, sm_scale), (q, k, v)


def _short_mha_bwd_rule(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: mha(q, k, v, scale=sm_scale), q, k, v)
    return vjp(g)


_short_mha.defvjp(_short_mha_fwd_rule, _short_mha_bwd_rule)


def _short_vmem_bytes(Sq, Sk, H, D, itemsize=2):
    """Rough VMEM footprint of one _short_mha program (padded blocks,
    double-buffered in/out) — used to gate dispatch."""
    sp = lambda s: -(-s // 16) * 16          # bf16 sublane tile
    lp = lambda d: -(-d // 128) * 128
    blocks = H * (sp(Sq) + 2 * sp(Sk) + sp(Sq)) * lp(D) * itemsize * 2
    scores = sp(Sq) * lp(Sk) * 4 * 3         # s, p, exp temporaries
    return blocks + scores


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, sm_scale, q_offset, block_q=BLOCK_Q,
           block_k=BLOCK_K):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    # to [B, H, S, D]; pad S to block multiples and D to the 128-lane
    # boundary. For short sequences (the ViT's 257) pass block sizes that
    # hold the WHOLE padded sequence: one program per (batch, head) —
    # 128x128 tiling there spends more time on grid overhead + k/v
    # re-reads than on math (measured 546 vs 419 ms full-encode).
    qt = _pad_to(_pad_to(q.transpose(0, 2, 1, 3), 2, block_q), 3, 128)
    kt = _pad_to(_pad_to(k.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    vt = _pad_to(_pad_to(v.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    # padded kv columns (Sk not a 128 multiple, e.g. the ViT's 257) are
    # masked INSIDE the kernel via kv_len — zero K rows would otherwise
    # score 0 (not -inf) and leak weight into the softmax.
    out = _flash_fwd_bhsd(qt, kt, vt, causal, sm_scale, q_offset, Sk,
                          block_q, block_k)
    return out[:, :, :Sq, :D].transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v, causal, sm_scale, q_offset,
                    block_q=BLOCK_Q, block_k=BLOCK_K):
    return (_flash(q, k, v, causal, sm_scale, q_offset, block_q, block_k),
            (q, k, v))


def _flash_bwd_rule(causal, sm_scale, q_offset, block_q, block_k, res, g):
    q, k, v = res

    def ref(q, k, v):
        from .attention import sliced_causal_mask
        mask = None
        if causal:
            mask = sliced_causal_mask(q.shape[1], k.shape[1], q_offset)
        return mha(q, k, v, mask=mask, scale=sm_scale)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False, scale: Optional[float] = None,
                    q_offset: int = 0) -> jnp.ndarray:
    """Flash attention on [B, S, H, D] tensors. GQA supported.

    Falls back to the XLA path when the sequence is too short for the
    kernel to win, or when kv padding would need explicit masking in the
    non-causal case (kv length not a tile multiple).
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = scale if scale is not None else D ** -0.5
    h_kv = k.shape[2]
    if h_kv != H:
        rep = H // h_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    use_kernel = (Sq >= MIN_FLASH_SEQ and Sk >= MIN_FLASH_SEQ
                  and D <= 256)
    if not use_kernel:
        from .attention import sliced_causal_mask
        mask = sliced_causal_mask(Sq, Sk, q_offset) if causal else None
        return mha(q, k, v, mask=mask, scale=scale)

    # non-causal short sequences (the ViT's 257): all-heads-per-program
    # kernel — the tiled flash grid's per-program overhead dominates at
    # this size (B*H sequential tiny programs; see _short_mha_kernel)
    if (not causal and Sq <= 1024 and Sk <= 1024
            and _short_vmem_bytes(Sq, Sk, H, D) < 12 * 1024 * 1024):
        return _short_mha(q, k, v, scale)

    return _flash(q, k, v, causal, scale, q_offset)

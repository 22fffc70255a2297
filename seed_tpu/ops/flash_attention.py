"""Pallas TPU flash attention (forward) with online softmax.

Replaces the capability the reference gets from xformers
memory-efficient attention (models/llama_xformer.py:244-255) and
flash-attn-2 (MultiModalLLM/src/model/modeling_llama_4_35_0.py:415-576):
O(seq) memory attention that never materializes the [S, S] score matrix.

Kernel design (TPU-first: the grid is SEQUENTIAL, so each program must
do substantial work — tiny per-(tile, tile) programs measured slower
than XLA at every shape tried):
- forward: grid (batch, heads, q_tiles) with 512-row q tiles; the kv
  dimension is an IN-KERNEL fori_loop over VMEM-resident whole k/v rows
  (online softmax: fp32 running max/sum/accumulator as loop carry)
- causal mode bounds the kv loop at the diagonal and element-masks the
  diagonal tile; mask value is -0.7*f32_max (never -inf: exp(-inf -
  -inf) = NaN); non-tile-multiple kv lengths are masked via kv_len
- the forward also emits per-row log-sum-exp, consumed by a FLASH
  BACKWARD (custom_vjp): a dq kernel (grid over q tiles, kv in-kernel)
  and a dk/dv kernel (grid over kv tiles, q in-kernel) implementing the
  standard FA-2 recurrence (delta = rowsum(dO*O) precomputed in XLA);
  chunked-prefill offsets fall back to an XLA recompute
- short NON-causal sequences (the ViT's S=257): _short_mha — grid over
  (batch, head-groups) only, ~8 heads per program via one batched
  dot_general pair, one-pass fp32 softmax entirely in VMEM, no
  host-side padding (Mosaic masks the ragged S=257 / D=88 edges)

The public entry ``flash_attention(q, k, v)`` takes [B, S, H, D] (the
seed_tpu convention), handles GQA by repeating kv heads, pads S to the
block and D to the 128-lane boundary, and falls back to the XLA path
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
# Big q tiles, kv as an in-kernel loop over VMEM-resident whole rows:
# program count B*H*(S/512) with ~0.5 GFLOP each. 128x128 tiles with kv
# on the (sequential!) TPU grid measured SLOWER than XLA at S=1024-2048.
BLOCK_Q = 512
BLOCK_K = 512
MIN_FLASH_SEQ = 256   # below this the XLA path is faster (launch overhead)
MAX_KERNEL_KV = 8192  # whole-row k/v must fit (double-buffered) in VMEM


def _interpret() -> bool:
    # CPU has no Mosaic backend: run the kernel in interpreter mode there
    # (the CI/test path); on TPU compile for real.
    return jax.default_backend() != "tpu"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                  causal: bool, sm_scale: float, q_offset: int,
                  kv_len: int, block_q: int, block_k: int):
    """One (batch, head, q_tile) program; the kv dimension is an
    IN-KERNEL fori_loop over [block_k, D] slices of the whole-row k/v
    blocks already resident in VMEM.

    The first version of this kernel put kv tiles on the grid instead —
    on TPU the grid is SEQUENTIAL, so S=1024 B=4 H=32 meant ~4,600 tiny
    programs whose fixed cost made the kernel slower than the XLA path
    it replaces (430 vs 388 ms fwd+bwd, L=8). Here the program count is
    B*H*(S/block_q) and each program does block_q*Sk worth of math.
    """
    qi = pl.program_id(2)
    Sk = k_ref.shape[2]
    kv_tiles = Sk // block_k
    q = q_ref[0, 0]                           # [block_q, D]
    q_row0 = qi * block_q + q_offset

    if causal:
        # last kv tile intersecting the triangle for this q tile
        hi = jnp.minimum(kv_tiles,
                         pl.cdiv(q_row0 + block_q, block_k))
    else:
        hi = kv_tiles

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        needs_kv_mask = kv_len % block_k != 0
        if causal or needs_kv_mask:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_row0
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if needs_kv_mask:
            # suppress zero-padded kv columns (non-tile-multiple kv
            # length): zero K rows score 0, not -inf
            s = jnp.where(cols < kv_len, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)            # [BQ, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    D = q_ref.shape[3]
    init = (jnp.full((block_q, 1), -jnp.inf, jnp.float32),
            jnp.zeros((block_q, 1), jnp.float32),
            jnp.zeros((block_q, D), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, hi, body, init)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)
    # log-sum-exp per row, saved for the flash backward (rows that saw
    # no kv tiles — fully-masked causal padding — get a finite dummy)
    lse = jnp.where(l == 0.0, 0.0, m + jnp.log(l))
    lse_ref[0, 0] = lse


def _flash_fwd_bhsd(q, k, v, causal: bool, sm_scale: float, q_offset: int,
                    kv_len: int, block_q: int = BLOCK_Q,
                    block_k: int = BLOCK_K):
    """q [B, H, Sq, D], k/v [B, H, Sk, D] — all padded to tile multiples;
    ``kv_len`` = the real (pre-padding) kv length, masked in-kernel."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    q_tiles = Sq // block_q

    grid = (B, H, q_tiles)
    kernel = functools.partial(_flash_kernel, causal=causal,
                               sm_scale=sm_scale,
                               q_offset=q_offset, kv_len=kv_len,
                               block_q=block_q, block_k=block_k)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            # trailing dim 1 keeps the block 2D-tiled in-kernel (Mosaic
            # requires the last two block dims divisible by (8, 128) OR
            # equal to the array dims — 1 == 1 qualifies)
            jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32),   # lse
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=_interpret(),
    )(q, k, v)


def _short_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                      exact: bool = False):
    """All-heads-per-program attention for short sequences.

    The flash grid above runs ONE (b, h, q_tile, kv_tile) program per
    step, and the TPU grid is sequential: at the ViT's S=257 that is
    B*H tiny programs whose fixed per-step cost (DMA pipeline fill,
    program switch) dwarfs the ~0.4 GFLOP of attention math — measured
    barely faster than the XLA path (398 vs 420 ms full-encode, B=64).
    Here one program handles a GROUP of heads of one batch element:
    grid (B, groups), one batched-over-heads dot_general pair, and a
    plain one-pass softmax (the whole [hg, S, S] score block lives in
    VMEM — no online rescaling needed).
    Shapes stay logical (S=257, D=88): Mosaic masks the ragged
    sublane/lane edges, so no host-side padding, masking, or transposed
    copies of the score matrix ever touch HBM.
    """
    q = q_ref[0]                              # [hg, S, D]
    k = k_ref[0]
    v = v_ref[0]
    # ONE batched dot_general over the head group instead of a python
    # loop of per-head matmuls: Mosaic schedules a fused batched matmul,
    # removing the head-loop serialization (probe_short_attn2.py:
    # 1.405 -> 1.327 ms/call at the EVA shape, B=64 S=257 hg=8 D=88)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale   # [hg, S, S]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    if exact:
        l = jnp.sum(p, axis=2, keepdims=True)
        # OP-FAITHFUL to the XLA path (ops/attention.mha): normalize the
        # fp32 probabilities, round them to the io dtype, THEN P@V — the
        # identical fp32->bf16 rounding sequence, so the exact encode
        # path can route here without changing a single VQ index
        # (agreement measured on-chip; see PERF.md round 4). One extra
        # full-score-block VPU pass vs the fast branch below.
        pn = (p / l).astype(v.dtype)
        o_ref[0] = jax.lax.dot_general(
            pn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
    else:
        D = v.shape[2]
        if D % 128 != 0:
            # FUSE the softmax row-sum into the PV matmul: append a ones
            # column to v — D pads up to the next 128-lane tile anyway
            # (88 -> 128 at the ViT shape), so the extra column rides the
            # MXU for free and the separate [hg, S, S] VPU sum pass
            # disappears (probe_short_attn3.py: 1.391 -> 1.289 ms/call).
            # l here sums the bf16-rounded p (fp32 MXU accumulate) — the
            # same rounding P@V sees, fast path only.
            ones = jnp.ones((v.shape[0], v.shape[1], 1), v.dtype)
            vx = jnp.concatenate([v, ones], axis=2)      # [hg, S, D+1]
            ox = jax.lax.dot_general(
                p.astype(v.dtype), vx, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [hg, S, D+1]
            o_ref[0] = (ox[:, :, :D] / ox[:, :, D:D + 1]).astype(o_ref.dtype)
        else:
            # no spare lane (D already a multiple of 128): normalize the
            # [hg, S, D] output, not the [hg, S, S] probabilities — one
            # fewer full-score-block VPU pass (measured -21%/call)
            l = jnp.sum(p, axis=2, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [hg, S, D]
            o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _short_mha(q, k, v, sm_scale, exact=False):
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
        functools.partial(_short_mha_kernel, sm_scale=sm_scale, exact=exact),
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


def _short_mha_fwd_rule(q, k, v, sm_scale, exact=False):
    return _short_mha(q, k, v, sm_scale, exact), (q, k, v)


def _short_mha_bwd_rule(sm_scale, exact, res, g):
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


def _flash_impl(q, k, v, causal, sm_scale, q_offset, block_q, block_k):
    """-> (out [B, Sq, H, D], lse [B, H, Sq_padded] f32)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    # to [B, H, S, D]; pad S to block multiples and D to the 128-lane
    # boundary. Padded kv columns (Sk not a 128 multiple, e.g. the ViT's
    # 257) are masked INSIDE the kernel via kv_len — zero K rows would
    # otherwise score 0 (not -inf) and leak weight into the softmax.
    qt = _pad_to(_pad_to(q.transpose(0, 2, 1, 3), 2, block_q), 3, 128)
    kt = _pad_to(_pad_to(k.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    vt = _pad_to(_pad_to(v.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    out, lse = _flash_fwd_bhsd(qt, kt, vt, causal, sm_scale, q_offset, Sk,
                               block_q, block_k)
    return out[:, :, :Sq, :D].transpose(0, 2, 1, 3), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, sm_scale, q_offset, block_q=BLOCK_Q,
           block_k=BLOCK_K):
    return _flash_impl(q, k, v, causal, sm_scale, q_offset,
                       block_q, block_k)[0]


def _flash_fwd_rule(q, k, v, causal, sm_scale, q_offset,
                    block_q=BLOCK_Q, block_k=BLOCK_K):
    out, lse = _flash_impl(q, k, v, causal, sm_scale, q_offset,
                           block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, causal, sm_scale, kv_len,
                         block_q, block_k):
    qi = pl.program_id(2)
    Sk = k_ref.shape[2]
    kv_tiles = Sk // block_k
    q = q_ref[0, 0]                           # [bq, D] bf16
    do = do_ref[0, 0]                         # [bq, D]
    lse = lse_ref[0, 0]                       # [bq, 1] f32
    delta = delta_ref[0, 0]                   # [bq, 1] f32
    q_row0 = qi * block_q
    hi = jnp.minimum(kv_tiles, pl.cdiv(q_row0 + block_q, block_k)) \
        if causal else kv_tiles

    def body(ki, dq):
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        needs_kv_mask = kv_len % block_k != 0
        if causal or needs_kv_mask:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_row0
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if needs_kv_mask:
            s = jnp.where(cols < kv_len, s, MASK_VALUE)
        p = jnp.exp(s - lse)                  # [bq, bk] f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    D = q_ref.shape[3]
    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((block_q, D), jnp.float32))
    dq_ref[0, 0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, causal, sm_scale, kv_len,
                          block_q, block_k):
    ki = pl.program_id(2)
    Sq = q_ref.shape[2]
    q_tiles = Sq // block_q
    k = k_ref[0, 0]                           # [bk, D]
    v = v_ref[0, 0]
    col0 = ki * block_k
    # causal: first q tile whose rows reach this kv tile (block_q ==
    # block_k enforced at dispatch, so tile index == ki)
    lo = ki if causal else 0

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        needs_kv_mask = kv_len % block_k != 0
        if causal or needs_kv_mask:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + qi * block_q
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if needs_kv_mask:
            s = jnp.where(cols < kv_len, s, MASK_VALUE)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    D = q_ref.shape[3]
    zeros = jnp.zeros((block_k, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, q_tiles, body, (zeros, zeros))
    dk_ref[0, 0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd_bhsd(qt, kt, vt, dot_, lse, delta, causal, sm_scale,
                    kv_len, block_q, block_k):
    """All inputs [B, H, S*, D] padded (lse/delta [B, H, Sq_pad]) ->
    (dq, dk, dv) in the same padded layout."""
    B, H, Sq, D = qt.shape
    Sk = kt.shape[2]
    kern_kwargs = dict(causal=causal, sm_scale=sm_scale, kv_len=kv_len,
                       block_q=block_q, block_k=block_k)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **kern_kwargs),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), qt.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H, Sq // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D),
                                   lambda b, h, i: (b, h, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=_interpret(),
    )(qt, kt, vt, dot_, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **kern_kwargs),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sk, D), kt.dtype),
            jax.ShapeDtypeStruct((B, H, Sk, D), vt.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H, Sk // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, Sq, D), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, Sq, D), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sq, 1), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sq, 1), lambda b, h, j: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=_interpret(),
    )(qt, kt, vt, dot_, lse, delta)
    return dq, dk, dv


def _flash_bwd_rule(causal, sm_scale, q_offset, block_q, block_k, res, g):
    q, k, v, out, lse = res
    B, Sq, H, D = q.shape
    Sk = k.shape[1]

    # flash backward requires equal square tiles (causal lo-bound math)
    # and no prefill offset; otherwise recompute through the XLA path
    if q_offset != 0 or block_q != block_k:
        def ref(q, k, v):
            from .attention import sliced_causal_mask
            mask = None
            if causal:
                mask = sliced_causal_mask(q.shape[1], k.shape[1], q_offset)
            return mha(q, k, v, mask=mask, scale=sm_scale)
        _, vjp = jax.vjp(ref, q, k, v)
        return vjp(g)

    # delta_i = sum_d dO_id * O_id (fp32), padded alongside q rows
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                          # [B, Sq, H]
    delta = _pad_to(delta.transpose(0, 2, 1), 2, block_q)[..., None]
    qt = _pad_to(_pad_to(q.transpose(0, 2, 1, 3), 2, block_q), 3, 128)
    kt = _pad_to(_pad_to(k.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    vt = _pad_to(_pad_to(v.transpose(0, 2, 1, 3), 2, block_k), 3, 128)
    gt = _pad_to(_pad_to(g.transpose(0, 2, 1, 3), 2, block_q), 3, 128)
    dq, dk, dv = _flash_bwd_bhsd(qt, kt, vt, gt, lse, delta, causal,
                                 sm_scale, Sk, block_q, block_k)
    unpad = lambda t, S: t[:, :, :S, :D].transpose(0, 2, 1, 3)
    return (unpad(dq, Sq).astype(q.dtype), unpad(dk, Sk).astype(k.dtype),
            unpad(dv, Sk).astype(v.dtype))


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False, scale: Optional[float] = None,
                    q_offset: int = 0, exact: bool = False) -> jnp.ndarray:
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

    # whole k/v rows are double-buffered in VMEM at padded D: gate the
    # admit by actual bytes (Sk*rnd(D) * 2B * {k,v} * double-buffer), not
    # a fixed Sk cap — D=256 at Sk=8192 would be ~16MB and fail at Mosaic
    # compile time rather than fall back.
    rnd128 = lambda s: -(-s // 128) * 128
    kv_vmem = rnd128(Sk) * rnd128(D) * 2 * 2 * 2
    use_kernel = (Sq >= MIN_FLASH_SEQ and Sk >= MIN_FLASH_SEQ
                  and D <= 256 and Sk <= MAX_KERNEL_KV
                  and kv_vmem <= 12 * 1024 * 1024)
    if not use_kernel:
        from .attention import sliced_causal_mask
        mask = sliced_causal_mask(Sq, Sk, q_offset) if causal else None
        return mha(q, k, v, mask=mask, scale=scale)

    # non-causal short sequences (the ViT's 257): all-heads-per-program
    # kernel — per-(b,h) programs are too small at this size
    # (see _short_mha_kernel)
    if (not causal and Sq <= 1024 and Sk <= 1024
            and _short_vmem_bytes(Sq, Sk, H, D) < 12 * 1024 * 1024):
        return _short_mha(q, k, v, scale, exact)

    if exact:
        # exact=True promises the op-faithful epilogue (fp32-normalize,
        # bf16-round, then P@V — the identical op sequence as ops.attention
        # .mha); only _short_mha implements it. Falling through to the
        # tiled kernel would silently swap in reassociated online-softmax
        # numerics, losing the guarantee ViTConfig.flash_exact relies on
        # for VQ-index stability — take the XLA path instead.
        from .attention import sliced_causal_mask
        mask = sliced_causal_mask(Sq, Sk, q_offset) if causal else None
        return mha(q, k, v, mask=mask, scale=scale)

    rnd = lambda s: -(-s // 128) * 128
    return _flash(q, k, v, causal, scale, q_offset,
                  min(BLOCK_Q, rnd(Sq)), min(BLOCK_K, rnd(Sk)))

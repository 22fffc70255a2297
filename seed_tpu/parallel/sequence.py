"""Sequence (context) parallelism: ring attention over a mesh axis.

The reference has no sequence-parallel strategy (its long-context story is
flash-attn-2 inside one GPU, MultiModalLLM/src/model/modeling_llama_4_35_0.py
:415-576); this is a beyond-parity addition that completes the SURVEY §2.4
parallelism table. TPU-native design: the sequence dimension is sharded over
a named mesh axis, and attention is computed as a ring — each device holds
its local Q block resident and rotates the K/V blocks one hop per step with
``lax.ppermute`` (nearest-neighbor ICI), merging per-block partial softmax
results with the flash-attention online-softmax recurrence (running max m,
normalizer l, accumulator o). The whole ring is one compiled program inside
``shard_map``; XLA overlaps each permute with the next block's matmuls, and
``jax.grad`` differentiates straight through it (ppermute's transpose is the
reverse permute), so no hand-written backward schedule is needed.

Memory: each device ever holds O(S/sp) keys/values and an [Nl, Nl] score
block — attention memory AND FLOPs-per-device drop by the axis size, which
is what lets training sequence length scale past one chip's HBM.

Causal note: blocks that lie entirely in the future are computed then
zero-masked (uniform SPMD — every ring step runs the same program on every
device). A load-balanced "striped" variant would halve that waste; at the
sp<=8 sizes this targets, uniformity wins on compile simplicity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import NEG_INF
from .mesh import DATA_AXIS
from .pipeline import shard_map  # jax>=0.8 check_vma shim


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, causal: bool = True,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Exact attention over a sequence-sharded axis. MUST run inside
    ``shard_map`` with ``axis_name`` mapped.

    q [B, Nl, H, D], k/v [B, Nl, H_kv, D] — the LOCAL sequence shard
    (global S = Nl * axis_size, contiguous blocks in rank order).
    Supports GQA (H_kv divides H). fp32 softmax statistics; the P@V
    matmuls run in the input dtype with fp32 accumulation (mha numerics).
    """
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Nl, H, D = q.shape
    h_kv = k.shape[2]
    g = H // h_kv
    # GQA: K/V stay at H_kv width through the whole ring (each ppermute hop
    # moves H_kv*D bytes per position, not H*D) — the grouped einsum below
    # broadcasts the shared heads instead of materializing repeats.
    qg = q.reshape(B, Nl, h_kv, g, D)
    scale = D ** -0.5 if scale is None else scale

    rows = idx * Nl + jax.lax.broadcasted_iota(jnp.int32, (Nl, Nl), 0)
    cols_local = jax.lax.broadcasted_iota(jnp.int32, (Nl, Nl), 1)

    m = jnp.full((B, H, Nl), NEG_INF, jnp.float32)   # running row max
    l = jnp.zeros((B, H, Nl), jnp.float32)           # running normalizer
    o = jnp.zeros((B, Nl, H, D), jnp.float32)        # unnormalized output
    perm = [(j, (j + 1) % size) for j in range(size)]

    kb, vb = k, v
    for step in range(size):                          # size is static: unrolled
        src = (idx - step) % size                     # origin rank of kb/vb
        scores = jnp.einsum("bnkgd,bmkd->bkgnm", qg, kb,
                            preferred_element_type=jnp.float32) * scale
        scores = scores.reshape(B, H, Nl, Nl)
        if causal:
            mask = (src * Nl + cols_local) <= rows    # [Nl, Nl] global causal
            scores = jnp.where(mask, scores, NEG_INF)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        if causal:                                    # exact zero for masked
            p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        pg = p.astype(vb.dtype).reshape(B, h_kv, g, Nl, Nl)
        o = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bkgnm,bmkd->bnkgd", pg, vb,
            preferred_element_type=jnp.float32).reshape(B, Nl, H, D)
        m = m_new
        if step < size - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)

    out = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def sequence_parallel_attention(q, k, v, mesh: Mesh, axis: str = DATA_AXIS,
                                causal: bool = True,
                                scale: Optional[float] = None):
    """Convenience wrapper: shard q/k/v over ``axis`` on the sequence dim
    and run :func:`ring_attention`. Inputs/outputs are GLOBAL [B, S, H, D]
    arrays; S must divide by the axis size."""
    spec = P(None, axis)
    f = shard_map(
        functools.partial(ring_attention, axis_name=axis, causal=causal,
                          scale=scale),
        mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return f(q, k, v)


def llama_loss_sp(params, input_ids: jnp.ndarray, cfg, mesh: Mesh,
                  axis: str = DATA_AXIS,
                  labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sequence-parallel LLaMA next-token loss: activations sharded over the
    sequence dim, attention as a ppermute ring, everything else (RMSNorm,
    projections, MLP, logits, CE) purely local. Numerically equal to
    ``next_token_loss(forward(params, ids), ids, labels)`` on one device.

    The shifted-target boundary (the last local position's label is the
    FIRST token of the right neighbor's shard) is closed with one more
    ppermute; the final global position carries no loss, matching the
    [:, :-1] / [:, 1:] shift of train/losses.py next_token_loss.

    Params are replicated within the ring (compose fsdp on an orthogonal
    mesh axis for weight sharding — same composition note as
    pipeline_llama_loss).
    """
    from ..models import llama as M
    from ..train.losses import IGNORE_INDEX

    size = mesh.shape[axis]
    B, S = input_ids.shape
    if S % size:
        raise ValueError(f"seq len {S} not divisible by sp={size}")
    labels = input_ids if labels is None else labels
    recv_right = [((j + 1) % size, j) for j in range(size)]

    def local(p, ids, labs):
        idx = jax.lax.axis_index(axis)
        Nl = ids.shape[1]
        positions = idx * Nl + jnp.arange(Nl, dtype=jnp.int32)
        logits = M.forward(
            p, ids, cfg, positions=positions,
            attn_fn=functools.partial(ring_attention, axis_name=axis))
        # next-token targets: local shift + right neighbor's first label
        nxt = jax.lax.ppermute(labs[:, :1], axis, recv_right)
        tgt = jnp.concatenate([labs[:, 1:], nxt], axis=1)       # [B, Nl]
        valid = tgt != IGNORE_INDEX
        # the last GLOBAL position has no next token
        is_tail = (jnp.arange(Nl) == Nl - 1) & (idx == size - 1)
        valid = valid & ~is_tail[None, :]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = jnp.take_along_axis(
            logp, jnp.where(valid, tgt, 0)[..., None], axis=-1)[..., 0]
        loss_sum = jax.lax.psum(-jnp.sum(tok * valid), axis)
        count = jax.lax.psum(jnp.sum(valid), axis)
        return loss_sum / jnp.maximum(1, count)

    f = shard_map(local, mesh,
                  in_specs=(P(), P(None, axis), P(None, axis)),
                  out_specs=P())
    return f(params, input_ids, labels)

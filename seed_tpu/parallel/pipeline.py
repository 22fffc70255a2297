"""Pipeline parallelism: GPipe-style microbatch pipelining over the
``pipe`` mesh axis.

The reference only *stubs* pipeline parallel (ColossalAI
configs/colossal/hybrid_parallel_plugin.yaml — never wired); here it is a
real strategy. TPU-native design: no process groups, no send/recv threads —
the schedule is a single ``lax.scan`` inside ``shard_map`` whose step
computes every stage's resident layers and rotates activations one hop
along the ``pipe`` axis with ``lax.ppermute`` (nearest-neighbor ICI). XLA
overlaps the permute with the next step's compute; the whole pipeline —
bubbles included — is one compiled program, and ``jax.grad`` differentiates
straight through it (ppermute's transpose is the reverse permute), so the
1F1B/backward schedule falls out of autodiff instead of hand-written
bookkeeping.

Layer weights live stacked on a leading depth axis [L, ...] (the same
layout every seed_tpu model already uses for ``lax.scan``), sharded over
``pipe`` — each stage holds L/pp contiguous layers, so FSDP/TP axes still
apply to the per-layer dims orthogonally.

Throughput note: with M microbatches the bubble fraction is
(pp-1)/(M+pp-1); choose M >= 4*pp for >80% pipeline efficiency.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
try:                                   # jax >= 0.8 renamed check_rep
    from jax import shard_map as _smap

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _smap(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=check_rep)
except ImportError:                    # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import PIPE_AXIS


def pipeline_forward(layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                     stage_params: Any,
                     x_mb: jnp.ndarray,
                     axis: str = PIPE_AXIS) -> jnp.ndarray:
    """Run a stacked layer sequence as a microbatch pipeline.

    MUST be called inside ``shard_map`` with ``axis`` mapped.

    layer_fn(one_layer_params, h) -> h        (applies ONE layer)
    stage_params: this stage's layer stack [L/pp, ...] (leading dim =
        layers resident on this device — i.e. the global [L, ...] tree
        sharded over ``axis``)
    x_mb: [M, mb, ...] microbatches, identical on every stage (stage 0
        consumes them; other stages ignore the values)

    Returns [M, mb, ...] outputs of the LAST stage, broadcast to all
    stages (so the caller can compute the loss without leaving shard_map).
    """
    pp = jax.lax.axis_size(axis)
    stage = jax.lax.axis_index(axis)
    M = x_mb.shape[0]

    def apply_stage(h):
        def body(c, lp):
            return layer_fn(lp, c), None
        out, _ = jax.lax.scan(body, h, stage_params)
        return out

    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def step(carry, t):
        h_in, outs = carry
        # stage 0 ingests microbatch t (clipped — bubble steps recompute
        # the last microbatch and their results are never recorded)
        x_t = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1), 0,
                                           keepdims=False)
        h = jnp.where(stage == 0, x_t, h_in)
        h = apply_stage(h)
        # the last stage records microbatch t-(pp-1) once it emerges
        out_idx = jnp.clip(t - (pp - 1), 0, M - 1)
        record = jnp.logical_and(stage == pp - 1, t >= pp - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, out_idx, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(record, h, cur), out_idx, 0)
        # rotate activations one hop down the pipe
        h_next = jax.lax.ppermute(h, axis, perm)
        return (h_next, outs), None

    init = (jnp.zeros(x_mb.shape[1:], x_mb.dtype), jnp.zeros_like(x_mb))
    (_, outs), _ = jax.lax.scan(step, init,
                                jnp.arange(M + pp - 1, dtype=jnp.int32))
    # broadcast the last stage's outputs to every stage (all_gather + take:
    # its autodiff transpose is exact, unlike a where+psum select)
    return jax.lax.all_gather(outs, axis)[pp - 1]


def num_stage_layers(total_layers: int, mesh) -> int:
    pp = mesh.shape[PIPE_AXIS]
    if total_layers % pp != 0:
        raise ValueError(f"{total_layers} layers not divisible by pp={pp}")
    return total_layers // pp


def pipeline_llama_loss(params, input_ids: jnp.ndarray, cfg,
                        mesh, num_microbatches: int) -> jnp.ndarray:
    """Next-token LM loss for the stacked-layer LLaMA, pipelined over
    ``pipe`` (layers split into stages) and data-parallel over ``data``.

    Embedding and lm_head are computed replicated on every stage (their
    FLOPs are <2% of the stack). Weight residency: ``in_specs`` maps the
    stacked layers to ``P(PIPE_AXIS)`` on the leading [L] dim and
    everything else to ``P()`` — i.e. each stage's weights are REPLICATED
    across any fsdp/tensor axes in the mesh inside its pipe group. Memory
    scales 1/pp only; composing per-layer FSDP gathering inside the stage
    scan is a separate strategy (see ``pipeline_fsdp_llama_loss``).

    Returns the scalar mean loss (same value on every device).
    """
    from ..models import llama as M
    from ..models import layers as L
    from ..ops.attention import sliced_causal_mask
    from ..train.losses import next_token_loss

    B, N = input_ids.shape
    if B % num_microbatches != 0:
        raise ValueError(f"batch {B} not divisible by M={num_microbatches}")

    positions = jnp.arange(N, dtype=jnp.int32)
    mask = sliced_causal_mask(N, N, 0)

    def layer_fn(lp, h):
        out, _ = M._layer_apply(lp, h, positions, mask, cfg)
        return out

    layer_specs = jax.tree.map(lambda _: P(PIPE_AXIS),
                               params["layers"])
    specs = {k: (layer_specs if k == "layers"
                 else jax.tree.map(lambda _: P(), v))
             for k, v in params.items()}

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P("data")),
        out_specs=P(),
        check_rep=False)
    def run(p, ids):
        x = L.embed(p["embed_tokens"], ids)
        Mb = ids.shape[0] // num_microbatches
        x_mb = x.reshape(num_microbatches, Mb, N, -1)
        h_mb = pipeline_forward(layer_fn, p["layers"], x_mb)
        h = h_mb.reshape(ids.shape[0], N, -1)
        logits = M._logits(p, h, cfg)
        loss = next_token_loss(logits, ids)
        return jax.lax.pmean(loss, "data")

    return run(params, input_ids)


def _fsdp_gather_dim(per_layer_shape, fsdp: int) -> int:
    """Which per-layer dim the fsdp axis shards (mirrors
    ``partition._auto_fsdp_spec``: largest divisible dim); -1 = replicate."""
    order = sorted(range(len(per_layer_shape)),
                   key=lambda i: -per_layer_shape[i])
    for i in order:
        if per_layer_shape[i] % fsdp == 0 and per_layer_shape[i] >= 2 * fsdp:
            return i
    return -1


def pipeline_fsdp_llama_loss(params, input_ids: jnp.ndarray, cfg,
                             mesh, num_microbatches: int) -> jnp.ndarray:
    """:func:`pipeline_llama_loss` with REAL weight sharding inside each
    stage: the stacked layers split over ``pipe`` on [L] AND shard their
    largest per-layer dim over ``fsdp``; each layer is all-gathered
    just-in-time inside the stage scan (ZeRO-3), so its autodiff
    transpose reduce-scatters the grads back — per-device layer
    residency is L/pp/fsdp instead of L/pp. The batch shards over
    (data, fsdp) jointly, like the flat-FSDP trainer. Embedding/lm_head
    stay replicated (<2% of 8B FLOPs/bytes; shard them via the flat
    trainer if they ever dominate)."""
    from ..models import llama as M
    from ..models import layers as L
    from ..ops.attention import sliced_causal_mask
    from ..train.losses import next_token_loss
    from .mesh import DATA_AXIS, FSDP_AXIS

    fsdp = mesh.shape[FSDP_AXIS]
    B, N = input_ids.shape
    shards = mesh.shape[DATA_AXIS] * fsdp
    if B % (shards * num_microbatches) != 0:
        raise ValueError(
            f"batch {B} not divisible by data*fsdp*M={shards}*"
            f"{num_microbatches}")

    positions = jnp.arange(N, dtype=jnp.int32)
    mask = sliced_causal_mask(N, N, 0)

    # per-leaf fsdp dim, decided on GLOBAL per-layer shapes (static)
    gather_dims = jax.tree.map(
        lambda w: _fsdp_gather_dim(w.shape[1:], fsdp), params["layers"])

    def layer_fn(lp, h):
        full = jax.tree.map(
            lambda w, d: w if d < 0 else jax.lax.all_gather(
                w, FSDP_AXIS, axis=d, tiled=True),
            lp, gather_dims)
        out, _ = M._layer_apply(full, h, positions, mask, cfg)
        return out

    def lspec(w, d):
        spec = [None] * w.ndim
        spec[0] = PIPE_AXIS
        if d >= 0:
            spec[1 + d] = FSDP_AXIS
        return P(*spec)

    layer_specs = jax.tree.map(lspec, params["layers"], gather_dims)
    specs = {k: (layer_specs if k == "layers"
                 else jax.tree.map(lambda _: P(), v))
             for k, v in params.items()}

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P((DATA_AXIS, FSDP_AXIS))),
        out_specs=P(),
        check_rep=False)
    def run(p, ids):
        x = L.embed(p["embed_tokens"], ids)
        Mb = ids.shape[0] // num_microbatches
        x_mb = x.reshape(num_microbatches, Mb, N, -1)
        h_mb = pipeline_forward(layer_fn, p["layers"], x_mb)
        h = h_mb.reshape(ids.shape[0], N, -1)
        logits = M._logits(p, h, cfg)
        loss = next_token_loss(logits, ids)
        return jax.lax.pmean(loss, (DATA_AXIS, FSDP_AXIS))

    return run(params, input_ids)

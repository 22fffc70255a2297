"""Device-mesh construction and sharding helpers.

The reference scales with NCCL process groups + DeepSpeed ZeRO / DDP
(models/seed_qformer/utils.py:58-87, MultiModalLLM/configs/deepspeed/).
TPU-native, all of that becomes one ``jax.sharding.Mesh`` with named axes
and ``NamedSharding`` annotations; XLA emits the collectives over ICI.

Axis conventions used across seed_tpu:

- ``data``   — pure data parallelism (batch split; gradients psum'd)
- ``fsdp``   — ZeRO-3 style parameter/optimizer sharding (params are
               all-gathered by XLA just-in-time; grads reduce-scattered)
- ``tensor`` — tensor parallelism (attention heads / MLP hidden sharded)

The batch is sharded over (data, fsdp) jointly; params over fsdp(+tensor).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
PIPE_AXIS = "pipe"
TENSOR_AXIS = "tensor"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, PIPE_AXIS, TENSOR_AXIS)


def make_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, pipe, tensor) mesh.

    ``fsdp=-1`` absorbs all remaining devices. A single-device mesh is valid
    and yields fully-replicated shardings, so model code never special-cases
    device count. Axis order puts tensor innermost (highest-bandwidth ICI
    neighbors), pipe next (ppermute rides nearest-neighbor links), then
    fsdp, with pure data parallel outermost (cheapest collective — one
    gradient psum per step, fine over DCN).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp == -1:
        fsdp = n // (dp * tp * pp)
    if dp * fsdp * tp * pp != n:
        raise ValueError(f"mesh {dp}x{fsdp}x{pp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp, pp, tp)
    return Mesh(arr, AXIS_NAMES)


def auto_mesh(n: Optional[int] = None, tp: int = 1) -> Mesh:
    """Default mesh: tensor-parallel innermost (rides ICI), fsdp over the rest."""
    devices = jax.devices()[:n] if n else jax.devices()
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    return make_mesh(dp=1, fsdp=n // tp, tp=tp, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batches shard over data+fsdp jointly (standard FSDP batch layout)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the canonical batch sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def local_mesh_size(mesh: Mesh) -> int:
    return math.prod(mesh.devices.shape)

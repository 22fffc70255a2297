"""Rule-based parameter partitioning (the ZeRO/TP replacement).

The reference's DeepSpeed ZeRO configs (MultiModalLLM/configs/deepspeed/) and
ColossalAI tp/pp stubs (configs/colossal/hybrid_parallel_plugin.yaml) map to
regex rules: a param's tree path is matched against ordered ``(pattern,
PartitionSpec)`` rules; the first hit wins. Unmatched params get an automatic
FSDP spec: the largest dimension divisible by the fsdp axis size is sharded.

This keeps model code sharding-agnostic — models only build pytrees, and the
trainer/server decide layouts.
"""
from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS

Rules = List[Tuple[str, P]]


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _auto_fsdp_spec(shape, mesh: Mesh) -> P:
    """Shard the largest divisible dim over fsdp; replicate small params."""
    fsdp = mesh.shape[FSDP_AXIS]
    if fsdp == 1 or not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp == 0 and shape[i] >= 2 * fsdp:
            spec = [None] * len(shape)
            spec[i] = FSDP_AXIS
            return P(*spec)
    return P()


def make_param_specs(params, mesh: Mesh, rules: Optional[Rules] = None):
    """Pytree of PartitionSpec matching ``params``."""
    rules = rules or []
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path, leaf):
        name = path_str(path)
        rank = len(np.shape(leaf))
        for pat, spec in compiled:
            if pat.search(name):
                # rules are written for the *trailing* dims (2-D kernels);
                # stacked-layer params [L, in, out] get None on leading axes
                if 0 < len(spec) < rank:
                    return P(*([None] * (rank - len(spec)) + list(spec)))
                return spec
        return _auto_fsdp_spec(np.shape(leaf), mesh)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_shardings(params, mesh: Mesh, rules: Optional[Rules] = None):
    specs = make_param_specs(params, mesh, rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh, rules: Optional[Rules] = None):
    """Device-put a param tree with its computed shardings."""
    shardings = make_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


# --- Tensor-parallel rules for the LLaMA decoder ------------------------
# Megatron-style: qkv/gate/up column-parallel (shard output dim over
# 'tensor'), o/down row-parallel (shard input dim). Embedding/lm_head shard
# the vocab dim. XLA inserts the reduce at row-parallel outputs.
LLAMA_TP_RULES: Rules = [
    (r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"(o_proj|down_proj)/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"embed_tokens/embedding$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"lm_head/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"(input_layernorm|post_attention_layernorm|norm)/scale$", P()),
]

# ViT / Q-Former towers are frozen at LLM-train time and small relative to
# the LLM; FSDP-shard big matrices, replicate the rest (auto rules).
VIT_TP_RULES: Rules = [
    (r"(fc1|qkv)/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"(fc2|proj)/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
]

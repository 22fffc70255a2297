"""PyTorch checkpoint -> seed_tpu param-tree conversion.

Owns the name mapping for the reference's checkpoint families
(SURVEY.md §7 'HF->native weight conversion'):

1. ``seed_quantizer.pt`` — Blip2QformerQuantizer state_dict
   (models/seed_qformer/qformer_quantizer.py:372 load_state_dict)
2. HF LLaMA (vicuna-7b / llama2-13b) — ``model.layers.*`` keys
3. PEFT LoRA adapters — ``lora_A/lora_B`` per projection
4. (unCLIP SD handled in seed_tpu/models/unclip/convert once the UNet
   lands)

Layout conventions converted here:
- torch ``nn.Linear.weight`` [out, in]  ->  kernel [in, out] (transpose)
- torch conv patch-embed [D, C, P, P]   ->  kernel [(P,P,C), D]
- per-layer module lists               ->  stacked [L, ...] trees (lax.scan)
- embedding/lm_head vocab rows          ->  padded to a multiple of 128
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.bin/.safetensors file into numpy arrays (host only)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # LAVIS-style {"model": state_dict, "optimizer": ...}
    return {k: v.float().numpy() if v.dtype.is_floating_point else v.numpy()
            for k, v in sd.items()}


def _t(w: np.ndarray) -> np.ndarray:          # torch Linear -> kernel
    return np.ascontiguousarray(w.T)


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _linear(sd, prefix, bias=True):
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _stack(trees):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *trees)


def _num_layers(sd, pattern):
    pat = re.compile(pattern)
    idx = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(idx) + 1 if idx else 0


# ------------------------ 1. SEED quantizer --------------------------------

def _convert_vit_block(sd, p):
    """EVA block (q/v-only bias) or plain block (full qkv bias)."""
    attn = {"qkv": {"kernel": _t(sd[f"{p}.attn.qkv.weight"])},
            "proj": _linear(sd, f"{p}.attn.proj")}
    if f"{p}.attn.qkv.bias" in sd:
        attn["qkv"]["bias"] = sd[f"{p}.attn.qkv.bias"]
    elif f"{p}.attn.q_bias" in sd:
        attn["q_bias"] = sd[f"{p}.attn.q_bias"]
        attn["v_bias"] = sd[f"{p}.attn.v_bias"]
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn": attn,
        "norm2": _ln(sd, f"{p}.norm2"),
        "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2")},
    }


def _convert_patch_embed(sd, prefix):
    w = sd[f"{prefix}.proj.weight"]            # [D, C, P, P]
    kernel = np.ascontiguousarray(
        w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))  # [(P,P,C), D]
    p = {"kernel": kernel}
    if f"{prefix}.proj.bias" in sd:
        p["bias"] = sd[f"{prefix}.proj.bias"]
    return p


def _convert_qformer_layer(sd, p, with_text=False):
    def attn_block(a_prefix):
        return {
            "q": _linear(sd, f"{a_prefix}.self.query"),
            "k": _linear(sd, f"{a_prefix}.self.key"),
            "v": _linear(sd, f"{a_prefix}.self.value"),
            "out": _linear(sd, f"{a_prefix}.output.dense"),
            "norm": _ln(sd, f"{a_prefix}.output.LayerNorm"),
        }

    layer = {
        "self": attn_block(f"{p}.attention"),
        "ffn_q": {"fc1": _linear(sd, f"{p}.intermediate_query.dense"),
                  "fc2": _linear(sd, f"{p}.output_query.dense"),
                  "norm": _ln(sd, f"{p}.output_query.LayerNorm")},
    }
    if f"{p}.crossattention.self.query.weight" in sd:
        layer["cross"] = attn_block(f"{p}.crossattention")
    if with_text and f"{p}.intermediate.dense.weight" in sd:
        layer["ffn_t"] = {"fc1": _linear(sd, f"{p}.intermediate.dense"),
                          "fc2": _linear(sd, f"{p}.output.dense"),
                          "norm": _ln(sd, f"{p}.output.LayerNorm")}
    return layer


def convert_quantizer(sd: Dict[str, np.ndarray],
                      with_text: bool = False) -> Dict[str, Any]:
    """seed_quantizer.pt state_dict -> init_seed_tokenizer()-shaped tree."""
    n_vit = _num_layers(sd, r"visual_encoder\.blocks\.(\d+)\.")
    n_qf = _num_layers(sd, r"Qformer\.bert\.encoder\.layer\.(\d+)\.")
    n_img = _num_layers(sd, r"blocks_image\.(\d+)\.")

    params = {
        "vit": {
            "patch_embed": _convert_patch_embed(sd, "visual_encoder.patch_embed"),
            "cls_token": sd["visual_encoder.cls_token"],
            "pos_embed": sd["visual_encoder.pos_embed"],
            "blocks": _stack([
                _convert_vit_block(sd, f"visual_encoder.blocks.{i}")
                for i in range(n_vit)]),
        },
        "ln_vision": _ln(sd, "ln_vision"),
        "qformer": {
            "query_tokens": sd["query_tokens"],
            "embeddings": {"norm": _ln(sd, "Qformer.bert.embeddings.LayerNorm")},
            "layers": [
                _convert_qformer_layer(sd, f"Qformer.bert.encoder.layer.{i}",
                                       with_text)
                for i in range(n_qf)],
        },
        "encode_task": {"fc1": _linear(sd, "encode_task_layer.0"),
                        "fc2": _linear(sd, "encode_task_layer.2")},
        "vq": {"codebook": sd["quantize.embedding.weight"]},
        "decode_task": {"fc1": _linear(sd, "decode_task_layer.0"),
                        "fc2": _linear(sd, "decode_task_layer.2")},
        "pos_embed_image": sd["pos_embed_image"],
        "blocks_image": _stack([
            _convert_vit_block(sd, f"blocks_image.{i}") for i in range(n_img)]),
        "distill_image_proj": _linear(sd, "distill_image_proj"),
    }
    if "reverse_tokens" in sd:
        # Reverse Q-Former distill head (use_qformer_image=True,
        # blip2_qformer_codebook_all_image.py:145-157)
        n_rev = _num_layers(sd, r"Reverse_Qformer\.bert\.encoder\.layer\.(\d+)\.")
        params["reverse_qformer"] = {
            "query_tokens": sd["reverse_tokens"],
            "embeddings": {
                "norm": _ln(sd, "Reverse_Qformer.bert.embeddings.LayerNorm")},
            "layers": [
                _convert_qformer_layer(
                    sd, f"Reverse_Qformer.bert.encoder.layer.{i}")
                for i in range(n_rev)],
        }
    else:
        params["image_down"] = {
            "fc1": _linear(sd, "image_down.0", bias=False),
            "fc2": _linear(sd, "image_down.2", bias=False),
            "fc3": _linear(sd, "image_down.4", bias=False)}
    if "pos_embed" in sd:  # recon_s stack (stage-2 training artifacts)
        n_rec = _num_layers(sd, r"blocks\.(\d+)\.")
        if n_rec:
            params["pos_embed"] = sd["pos_embed"]
            params["blocks"] = _stack([
                _convert_vit_block(sd, f"blocks.{i}") for i in range(n_rec)])
    return params


# ------------------------ 2. HF LLaMA --------------------------------------

def convert_llama(sd: Dict[str, np.ndarray],
                  padded_vocab: Optional[int] = None) -> Dict[str, Any]:
    """HF llama state_dict -> init_llama()-shaped tree (stacked layers)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    n = _num_layers(sd, r"layers\.(\d+)\.")

    def layer(i):
        p = f"layers.{i}"
        return {
            "input_layernorm": {"scale": sd[f"{p}.input_layernorm.weight"]},
            "q_proj": _linear(sd, f"{p}.self_attn.q_proj", bias=False),
            "k_proj": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
            "v_proj": _linear(sd, f"{p}.self_attn.v_proj", bias=False),
            "o_proj": _linear(sd, f"{p}.self_attn.o_proj", bias=False),
            "post_attention_layernorm": {
                "scale": sd[f"{p}.post_attention_layernorm.weight"]},
            "gate_proj": _linear(sd, f"{p}.mlp.gate_proj", bias=False),
            "up_proj": _linear(sd, f"{p}.mlp.up_proj", bias=False),
            "down_proj": _linear(sd, f"{p}.mlp.down_proj", bias=False),
        }

    embed = sd["embed_tokens.weight"]
    head = _t(sd["lm_head.weight"])
    if padded_vocab and padded_vocab > embed.shape[0]:
        pad = padded_vocab - embed.shape[0]
        embed = np.concatenate(
            [embed, np.zeros((pad, embed.shape[1]), embed.dtype)], 0)
        head = np.concatenate(
            [head, np.zeros((head.shape[0], pad), head.dtype)], 1)
    return {
        "embed_tokens": {"embedding": embed},
        "layers": _stack([layer(i) for i in range(n)]),
        "norm": {"scale": sd["norm.weight"]},
        "lm_head": {"kernel": head},
    }


# ------------------------ 3. PEFT LoRA -------------------------------------

def convert_lora(sd: Dict[str, np.ndarray], alpha: float = 32.0,
                 r: Optional[float] = None) -> Dict[str, Any]:
    """PEFT adapter state_dict -> seed_tpu lora tree (stacked per layer).

    PEFT keys look like
    ``base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight``
    with lora_A [r, in], lora_B [out, r]; merged delta = B@A * alpha/r —
    our layout is a=[L, in, r], b=[L, r, out].
    """
    pat = re.compile(
        r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+_proj)\.lora_([AB])\.weight$")
    found: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for k, v in sd.items():
        m = pat.search(k)
        if not m:
            continue
        i, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        found.setdefault(proj, {}).setdefault(i, {})[ab] = v

    adapters = {}
    rank = None
    for proj, per_layer in found.items():
        n = max(per_layer) + 1
        a = np.stack([_t(per_layer[i]["A"]) for i in range(n)], 0)  # [L,in,r]
        b = np.stack([_t(per_layer[i]["B"]) for i in range(n)], 0)  # [L,r,out]
        rank = a.shape[-1]
        adapters[f"layers/{proj}/kernel"] = {"a": a, "b": b}
    r = r if r is not None else (rank or 16)
    return {"adapters": adapters,
            "scale": np.asarray(alpha / r, np.float32)}


def convert_inception_torch(sd: Dict[str, np.ndarray],
                            dtype=np.float32) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state dict -> seed_tpu inception tree
    (eval/inception.py), for the FID pool3 feature extractor
    (MultiModalLLM/src/eval/inception.py:56 models.inception_v3).

    Each BasicConv2d's eval-mode BatchNorm (eps=1e-3) is FOLDED into a
    per-channel (scale, bias):
        scale = gamma / sqrt(running_var + eps)
        bias  = beta - running_mean * scale
    and the conv weight goes [out, in, kh, kw] -> [kh, kw, in, out].
    The fc classifier head is converted when present (Inception Score
    runs the full net, inception_score.py:35); aux-classifier keys are
    ignored (eval-mode torchvision never runs them).
    """
    from ..eval.inception import BN_EPS, INCEPTION_CONVS
    params = {}
    for name, (cin, cout, k, _, _) in INCEPTION_CONVS.items():
        w = np.asarray(sd[f"{name}.conv.weight"])
        assert w.shape == (cout, cin, *k), (name, w.shape)
        gamma = np.asarray(sd[f"{name}.bn.weight"], np.float64)
        beta = np.asarray(sd[f"{name}.bn.bias"], np.float64)
        mean = np.asarray(sd[f"{name}.bn.running_mean"], np.float64)
        var = np.asarray(sd[f"{name}.bn.running_var"], np.float64)
        scale = gamma / np.sqrt(var + BN_EPS)
        params[name] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(dtype),
            "scale": scale.astype(dtype),
            "bias": (beta - mean * scale).astype(dtype),
        }
    if "fc.weight" in sd:
        # 1000-way classifier head — the Inception-Score feature path
        # (inception_score.py:35-43 uses the full torchvision net);
        # torch [out, in] -> [in, out]
        w = np.asarray(sd["fc.weight"])
        assert w.shape == (1000, 2048), w.shape
        params["fc"] = {"kernel": w.T.astype(dtype),
                        "bias": np.asarray(sd["fc.bias"]).astype(dtype)}
    return params

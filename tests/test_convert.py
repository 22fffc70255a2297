"""Checkpoint conversion: synthetic torch state dicts -> param trees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.convert import convert_llama, convert_lora, convert_quantizer
from seed_tpu.models import llama as M
from seed_tpu.models import (TINY_TOKENIZER, encode, init_seed_tokenizer)
from seed_tpu.train import apply_lora


def rand(*shape):
    return np.random.RandomState(hash(shape) % 2**31).randn(*shape).astype(np.float32)


def make_quantizer_sd(cfg):
    """Synthetic state dict with the reference's key names/shapes
    (qformer_quantizer.py module structure) at tiny scale."""
    v, q = cfg.vit, cfg.qformer
    sd = {}
    D = v.dim
    sd["visual_encoder.patch_embed.proj.weight"] = rand(D, 3, v.patch_size, v.patch_size)
    sd["visual_encoder.patch_embed.proj.bias"] = rand(D)
    sd["visual_encoder.cls_token"] = rand(1, 1, D)
    sd["visual_encoder.pos_embed"] = rand(1, v.num_patches + 1, D)
    for i in range(v.depth):
        p = f"visual_encoder.blocks.{i}"
        sd[f"{p}.norm1.weight"] = rand(D); sd[f"{p}.norm1.bias"] = rand(D)
        sd[f"{p}.attn.qkv.weight"] = rand(3 * D, D)
        sd[f"{p}.attn.q_bias"] = rand(D); sd[f"{p}.attn.v_bias"] = rand(D)
        sd[f"{p}.attn.proj.weight"] = rand(D, D); sd[f"{p}.attn.proj.bias"] = rand(D)
        sd[f"{p}.norm2.weight"] = rand(D); sd[f"{p}.norm2.bias"] = rand(D)
        sd[f"{p}.mlp.fc1.weight"] = rand(v.mlp_dim, D); sd[f"{p}.mlp.fc1.bias"] = rand(v.mlp_dim)
        sd[f"{p}.mlp.fc2.weight"] = rand(D, v.mlp_dim); sd[f"{p}.mlp.fc2.bias"] = rand(D)
    sd["ln_vision.weight"] = rand(D); sd["ln_vision.bias"] = rand(D)

    H = q.hidden
    sd["query_tokens"] = rand(1, q.query_len, H)
    sd["Qformer.bert.embeddings.LayerNorm.weight"] = rand(H)
    sd["Qformer.bert.embeddings.LayerNorm.bias"] = rand(H)
    for i in range(q.layers):
        p = f"Qformer.bert.encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            dim_in = H
            sd[f"{p}.attention.self.{nm}.weight"] = rand(H, dim_in)
            sd[f"{p}.attention.self.{nm}.bias"] = rand(H)
        sd[f"{p}.attention.output.dense.weight"] = rand(H, H)
        sd[f"{p}.attention.output.dense.bias"] = rand(H)
        sd[f"{p}.attention.output.LayerNorm.weight"] = rand(H)
        sd[f"{p}.attention.output.LayerNorm.bias"] = rand(H)
        if i % q.cross_freq == 0:
            sd[f"{p}.crossattention.self.query.weight"] = rand(H, H)
            sd[f"{p}.crossattention.self.query.bias"] = rand(H)
            sd[f"{p}.crossattention.self.key.weight"] = rand(H, q.encoder_width)
            sd[f"{p}.crossattention.self.key.bias"] = rand(H)
            sd[f"{p}.crossattention.self.value.weight"] = rand(H, q.encoder_width)
            sd[f"{p}.crossattention.self.value.bias"] = rand(H)
            sd[f"{p}.crossattention.output.dense.weight"] = rand(H, H)
            sd[f"{p}.crossattention.output.dense.bias"] = rand(H)
            sd[f"{p}.crossattention.output.LayerNorm.weight"] = rand(H)
            sd[f"{p}.crossattention.output.LayerNorm.bias"] = rand(H)
        sd[f"{p}.intermediate_query.dense.weight"] = rand(q.intermediate, H)
        sd[f"{p}.intermediate_query.dense.bias"] = rand(q.intermediate)
        sd[f"{p}.output_query.dense.weight"] = rand(H, q.intermediate)
        sd[f"{p}.output_query.dense.bias"] = rand(H)
        sd[f"{p}.output_query.LayerNorm.weight"] = rand(H)
        sd[f"{p}.output_query.LayerNorm.bias"] = rand(H)

    sd["encode_task_layer.0.weight"] = rand(H, H)
    sd["encode_task_layer.0.bias"] = rand(H)
    sd["encode_task_layer.2.weight"] = rand(cfg.code_dim, H)
    sd["encode_task_layer.2.bias"] = rand(cfg.code_dim)
    sd["quantize.embedding.weight"] = rand(cfg.codebook_size, cfg.code_dim)
    sd["decode_task_layer.0.weight"] = rand(cfg.code_dim, cfg.code_dim)
    sd["decode_task_layer.0.bias"] = rand(cfg.code_dim)
    sd["decode_task_layer.2.weight"] = rand(H, cfg.code_dim)
    sd["decode_task_layer.2.bias"] = rand(H)
    sd["pos_embed_image"] = rand(1, q.query_len, H)
    for i in range(cfg.decode_depth):
        p = f"blocks_image.{i}"
        sd[f"{p}.norm1.weight"] = rand(H); sd[f"{p}.norm1.bias"] = rand(H)
        sd[f"{p}.attn.qkv.weight"] = rand(3 * H, H)
        sd[f"{p}.attn.qkv.bias"] = rand(3 * H)
        sd[f"{p}.attn.proj.weight"] = rand(H, H); sd[f"{p}.attn.proj.bias"] = rand(H)
        sd[f"{p}.norm2.weight"] = rand(H); sd[f"{p}.norm2.bias"] = rand(H)
        sd[f"{p}.mlp.fc1.weight"] = rand(4 * H, H); sd[f"{p}.mlp.fc1.bias"] = rand(4 * H)
        sd[f"{p}.mlp.fc2.weight"] = rand(H, 4 * H); sd[f"{p}.mlp.fc2.bias"] = rand(H)
    sd["image_down.0.weight"] = rand(256, H)
    sd["image_down.2.weight"] = rand(128, 256)
    sd["image_down.4.weight"] = rand(32, 128)
    sd["distill_image_proj.weight"] = rand(cfg.image_embed_dim, q.query_len * 32)
    sd["distill_image_proj.bias"] = rand(cfg.image_embed_dim)
    return sd


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


class TestQuantizerConvert:
    def test_structure_matches_init(self):
        cfg = TINY_TOKENIZER
        sd = make_quantizer_sd(cfg)
        converted = convert_quantizer(sd)
        ref = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        ref_s, conv_s = tree_shapes(ref), tree_shapes(converted)
        assert jax.tree_util.tree_structure(ref_s) == jax.tree_util.tree_structure(conv_s)
        assert ref_s == conv_s

    def test_codebook_identity_and_transpose(self):
        cfg = TINY_TOKENIZER
        sd = make_quantizer_sd(cfg)
        converted = convert_quantizer(sd)
        np.testing.assert_array_equal(converted["vq"]["codebook"],
                                      sd["quantize.embedding.weight"])
        np.testing.assert_array_equal(converted["encode_task"]["fc1"]["kernel"],
                                      sd["encode_task_layer.0.weight"].T)

    def test_converted_params_run(self):
        cfg = TINY_TOKENIZER
        converted = jax.tree.map(jnp.asarray,
                                 convert_quantizer(make_quantizer_sd(cfg)))
        img = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3))
        ids = encode(converted, img, cfg)
        assert ids.shape == (1, cfg.qformer.query_len)


class TestLlamaConvert:
    def make_sd(self, cfg):
        sd = {"model.embed_tokens.weight": rand(cfg.vocab_size, cfg.dim),
              "model.norm.weight": rand(cfg.dim),
              "lm_head.weight": rand(cfg.vocab_size, cfg.dim)}
        kv = cfg.kv_heads * cfg.head_dim
        for i in range(cfg.layers):
            p = f"model.layers.{i}"
            sd[f"{p}.input_layernorm.weight"] = rand(cfg.dim)
            sd[f"{p}.self_attn.q_proj.weight"] = rand(cfg.dim, cfg.dim)
            sd[f"{p}.self_attn.k_proj.weight"] = rand(kv, cfg.dim)
            sd[f"{p}.self_attn.v_proj.weight"] = rand(kv, cfg.dim)
            sd[f"{p}.self_attn.o_proj.weight"] = rand(cfg.dim, cfg.dim)
            sd[f"{p}.post_attention_layernorm.weight"] = rand(cfg.dim)
            sd[f"{p}.mlp.gate_proj.weight"] = rand(cfg.ffn_dim, cfg.dim)
            sd[f"{p}.mlp.up_proj.weight"] = rand(cfg.ffn_dim, cfg.dim)
            sd[f"{p}.mlp.down_proj.weight"] = rand(cfg.dim, cfg.ffn_dim)
        return sd

    def test_structure_and_vocab_padding(self):
        cfg = M.TINY_LLAMA
        sd = self.make_sd(cfg)
        converted = convert_llama(sd, padded_vocab=cfg.padded_vocab)
        ref = init_llama_shapes = tree_shapes(
            M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
        assert tree_shapes(converted) == init_llama_shapes
        # padding rows are zero
        emb = converted["embed_tokens"]["embedding"]
        assert (emb[cfg.vocab_size:] == 0).all()

    def test_converted_forward_runs(self):
        cfg = M.TINY_LLAMA
        converted = jax.tree.map(
            jnp.asarray, convert_llama(self.make_sd(cfg),
                                       padded_vocab=cfg.padded_vocab))
        logits = M.forward(converted, jnp.asarray([[1, 2, 3]], jnp.int32), cfg)
        assert logits.shape == (1, 3, cfg.padded_vocab)


class TestLoraConvert:
    def test_peft_roundtrip(self):
        cfg = M.TINY_LLAMA
        r = 4
        sd = {}
        for i in range(cfg.layers):
            for mod, proj, d_out in (
                    ("self_attn", "q_proj", cfg.dim),
                    ("self_attn", "v_proj", cfg.kv_heads * cfg.head_dim),
                    ("mlp", "down_proj", cfg.dim)):
                d_in = cfg.dim if proj != "down_proj" else cfg.ffn_dim
                base = f"base_model.model.model.layers.{i}.{mod}.{proj}"
                sd[f"{base}.lora_A.weight"] = rand(r, d_in)
                sd[f"{base}.lora_B.weight"] = rand(d_out, r)
        lora = convert_lora(sd, alpha=32)
        assert float(lora["scale"]) == 32.0 / r
        assert set(lora["adapters"]) == {
            "layers/q_proj/kernel", "layers/v_proj/kernel",
            "layers/down_proj/kernel"}
        a = lora["adapters"]["layers/q_proj/kernel"]["a"]
        assert a.shape == (cfg.layers, cfg.dim, r)

        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        lora = jax.tree.map(jnp.asarray, lora)
        merged = apply_lora(params, lora)
        logits = M.forward(merged, jnp.asarray([[1, 2]], jnp.int32), cfg)
        assert np.isfinite(np.asarray(logits[..., :cfg.vocab_size])).all()

    def test_merged_delta_matches_torch_convention(self):
        """delta = (alpha/r) * B @ A in torch == a @ b in our layout."""
        r, d_in, d_out = 2, 4, 6
        A = rand(r, d_in)
        B = rand(d_out, r)
        sd = {"base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
              "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B}
        lora = convert_lora(sd, alpha=4)
        ours = lora["adapters"]["layers/q_proj/kernel"]
        delta = (ours["a"][0] @ ours["b"][0]) * float(lora["scale"])
        torch_delta = (B @ A).T * (4 / r)       # [out,in].T -> [in,out]
        np.testing.assert_allclose(delta, torch_delta, rtol=1e-5, atol=1e-6)

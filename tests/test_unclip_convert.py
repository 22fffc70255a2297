"""unCLIP conversion: diffusers-style state dict -> our trees.

Strategy: serialize our randomly-initialized tree INTO diffusers key
names/layouts (inverse mapping written here in the test), run the
converter, and require exact round-trip equality — this pins the name map
and the transpose conventions at once.
"""
import jax
import jax.numpy as jnp
import numpy as np

from seed_tpu.convert.unclip_convert import (convert_clip_text, convert_unet,
                                             convert_vae_decoder)
from seed_tpu.models.unclip import (TINY_TEXT, TINY_UNET, TINY_VAE,
                                    init_clip_text, init_unet,
                                    init_vae_decoder)


def n(x):
    return np.asarray(x)


def inv_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = n(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = n(p["bias"])


def inv_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = n(p["kernel"]).transpose(3, 2, 0, 1)
    sd[f"{prefix}.bias"] = n(p["bias"])


def inv_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = n(p["scale"])
    sd[f"{prefix}.bias"] = n(p["bias"])


def inv_resnet(sd, prefix, p):
    inv_norm(sd, f"{prefix}.norm1", p["norm1"])
    inv_conv(sd, f"{prefix}.conv1", p["conv1"])
    inv_norm(sd, f"{prefix}.norm2", p["norm2"])
    inv_conv(sd, f"{prefix}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        inv_linear(sd, f"{prefix}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        inv_conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])


def inv_attn(sd, prefix, p):
    inv_linear(sd, f"{prefix}.to_q", p["to_q"])
    inv_linear(sd, f"{prefix}.to_k", p["to_k"])
    inv_linear(sd, f"{prefix}.to_v", p["to_v"])
    inv_linear(sd, f"{prefix}.to_out.0", p["to_out"])


def inv_spatial(sd, prefix, p):
    inv_norm(sd, f"{prefix}.norm", p["norm"])
    inv_linear(sd, f"{prefix}.proj_in", p["proj_in"])
    for i, blk in enumerate(p["blocks"]):
        b = f"{prefix}.transformer_blocks.{i}"
        inv_norm(sd, f"{b}.norm1", blk["norm1"])
        inv_attn(sd, f"{b}.attn1", blk["attn1"])
        inv_norm(sd, f"{b}.norm2", blk["norm2"])
        inv_attn(sd, f"{b}.attn2", blk["attn2"])
        inv_norm(sd, f"{b}.norm3", blk["norm3"])
        inv_linear(sd, f"{b}.ff.net.0.proj", blk["ff"]["proj"])
        inv_linear(sd, f"{b}.ff.net.2", blk["ff"]["out"])
    inv_linear(sd, f"{prefix}.proj_out", p["proj_out"])


def assert_tree_equal(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        n(x), n(y), rtol=1e-6, atol=1e-7), a, b)


def test_unet_roundtrip():
    ours = init_unet(jax.random.PRNGKey(0), TINY_UNET)
    sd = {}
    inv_conv(sd, "conv_in", ours["conv_in"])
    inv_linear(sd, "time_embedding.linear_1", ours["time_embedding"]["linear_1"])
    inv_linear(sd, "time_embedding.linear_2", ours["time_embedding"]["linear_2"])
    inv_linear(sd, "class_embedding.linear_1", ours["class_embedding"]["linear_1"])
    inv_linear(sd, "class_embedding.linear_2", ours["class_embedding"]["linear_2"])
    for i, blk in enumerate(ours["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            inv_resnet(sd, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            inv_spatial(sd, f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in blk:
            inv_conv(sd, f"down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    inv_resnet(sd, "mid_block.resnets.0", ours["mid_block"]["resnets"][0])
    inv_resnet(sd, "mid_block.resnets.1", ours["mid_block"]["resnets"][1])
    inv_spatial(sd, "mid_block.attentions.0", ours["mid_block"]["attentions"][0])
    for i, blk in enumerate(ours["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            inv_resnet(sd, f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            inv_spatial(sd, f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in blk:
            inv_conv(sd, f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    inv_norm(sd, "conv_norm_out", ours["conv_norm_out"])
    inv_conv(sd, "conv_out", ours["conv_out"])

    back = convert_unet(sd)
    assert (jax.tree_util.tree_structure(jax.tree.map(n, ours))
            == jax.tree_util.tree_structure(back))
    assert_tree_equal(ours, back)


def test_vae_decoder_roundtrip():
    ours = init_vae_decoder(jax.random.PRNGKey(0), TINY_VAE)
    sd = {}
    inv_conv(sd, "post_quant_conv", ours["post_quant_conv"])
    inv_conv(sd, "decoder.conv_in", ours["conv_in"])
    inv_resnet(sd, "decoder.mid_block.resnets.0", ours["mid"]["resnets"][0])
    inv_resnet(sd, "decoder.mid_block.resnets.1", ours["mid"]["resnets"][1])
    a = ours["mid"]["attn"]
    inv_norm(sd, "decoder.mid_block.attentions.0.group_norm", a["norm"])
    inv_linear(sd, "decoder.mid_block.attentions.0.to_q", a["to_q"])
    inv_linear(sd, "decoder.mid_block.attentions.0.to_k", a["to_k"])
    inv_linear(sd, "decoder.mid_block.attentions.0.to_v", a["to_v"])
    inv_linear(sd, "decoder.mid_block.attentions.0.to_out.0", a["to_out"])
    for i, blk in enumerate(ours["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            inv_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in blk:
            inv_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                     blk["upsample"])
    inv_norm(sd, "decoder.conv_norm_out", ours["conv_norm_out"])
    inv_conv(sd, "decoder.conv_out", ours["conv_out"])

    back = convert_vae_decoder(sd)
    assert_tree_equal(ours, back)


def test_clip_text_roundtrip():
    ours = init_clip_text(jax.random.PRNGKey(0), TINY_TEXT)
    sd = {"text_model.embeddings.token_embedding.weight":
              n(ours["token_embedding"]["embedding"]),
          "text_model.embeddings.position_embedding.weight":
              n(ours["position_embedding"]["embedding"])}
    for i, lp in enumerate(ours["layers"]):
        b = f"text_model.encoder.layers.{i}"
        inv_norm(sd, f"{b}.layer_norm1", lp["ln1"])
        inv_linear(sd, f"{b}.self_attn.q_proj", lp["q"])
        inv_linear(sd, f"{b}.self_attn.k_proj", lp["k"])
        inv_linear(sd, f"{b}.self_attn.v_proj", lp["v"])
        inv_linear(sd, f"{b}.self_attn.out_proj", lp["out"])
        inv_norm(sd, f"{b}.layer_norm2", lp["ln2"])
        inv_linear(sd, f"{b}.mlp.fc1", lp["fc1"])
        inv_linear(sd, f"{b}.mlp.fc2", lp["fc2"])
    inv_norm(sd, "text_model.final_layer_norm", ours["final_ln"])

    back = convert_clip_text(sd)
    assert_tree_equal(ours, back)

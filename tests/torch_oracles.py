"""Independent PyTorch oracles for golden-parity tests.

These are small from-first-principles implementations of the reference
architectures' *math* (pre-norm ViT block, BERT post-norm sublayers, VQ
nearest-code, RoPE/RMSNorm), written for the tests — NOT copies of the
reference code. They let us verify the JAX models produce the same numbers
as an independent torch implementation given identical weights.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def layer_norm(x, scale, bias, eps):
    return F.layer_norm(x, (x.shape[-1],), t(scale), t(bias), eps)


def vit_block(x, p, heads, eps, qkv_mode="qv", act="gelu"):
    """Pre-norm ViT block oracle. p: dict of numpy arrays in JAX layout."""
    D = x.shape[-1]
    hd = D // heads
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps)
    qkv = h @ t(p["attn"]["qkv"]["kernel"])
    if qkv_mode == "full":
        qkv = qkv + t(p["attn"]["qkv"]["bias"])
    elif qkv_mode == "qv":
        bias = torch.cat([t(p["attn"]["q_bias"]),
                          torch.zeros(D), t(p["attn"]["v_bias"])])
        qkv = qkv + bias
    q, k, v = qkv.chunk(3, dim=-1)
    B, N = x.shape[0], x.shape[1]

    def heads_split(z):
        return z.reshape(B, N, heads, hd).permute(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, D)
    x = x + o @ t(p["attn"]["proj"]["kernel"]) + t(p["attn"]["proj"]["bias"])

    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps)
    h = h @ t(p["mlp"]["fc1"]["kernel"]) + t(p["mlp"]["fc1"]["bias"])
    if act == "gelu":
        h = F.gelu(h)  # exact erf gelu, matching torch nn.GELU default
    else:
        h = h * torch.sigmoid(1.702 * h)
    h = h @ t(p["mlp"]["fc2"]["kernel"]) + t(p["mlp"]["fc2"]["bias"])
    return x + h


def bert_attention(x_q, x_kv, p, heads, eps, mask=None):
    """Post-norm BERT attention sublayer oracle (self or cross)."""
    D = x_q.shape[-1]
    hd = D // heads
    B, N, M = x_q.shape[0], x_q.shape[1], x_kv.shape[1]

    def lin(name, z):
        return z @ t(p[name]["kernel"]) + t(p[name]["bias"])

    def split(z, L):
        return z.reshape(B, L, heads, hd).permute(0, 2, 1, 3)

    q = split(lin("q", x_q), N)
    k = split(lin("k", x_kv), M)
    v = split(lin("v", x_kv), M)
    scores = q @ k.transpose(-2, -1) / math.sqrt(hd)
    if mask is not None:
        scores = scores.masked_fill(~mask, -1e9)
    o = (scores.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(B, N, D)
    o = lin("out", o)
    return layer_norm(x_q + o, p["norm"]["scale"], p["norm"]["bias"], eps)


def bert_ffn(x, p, eps):
    h = F.gelu(x @ t(p["fc1"]["kernel"]) + t(p["fc1"]["bias"]))
    h = h @ t(p["fc2"]["kernel"]) + t(p["fc2"]["bias"])
    return layer_norm(x + h, p["norm"]["scale"], p["norm"]["bias"], eps)


def vq_nearest(codebook, z):
    zf = t(z).reshape(-1, z.shape[-1])
    e = t(codebook)
    d = (zf ** 2).sum(1, keepdim=True) + (e ** 2).sum(1) - 2 * zf @ e.T
    return torch.argmin(d, dim=1).reshape(z.shape[:-1]).numpy()


def rms_norm(x, scale, eps=1e-6):
    v = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(v + eps) * t(scale)


def rope(q, positions, theta=10000.0):
    """Llama-style rotary embedding oracle. q [B, N, H, D], half-split pairing."""
    B, N, H, D = q.shape
    inv = 1.0 / (theta ** (torch.arange(0, D, 2).float() / D))
    freqs = torch.outer(t(positions).float(), inv)  # [N, D/2]
    cos = torch.cos(freqs)[None, :, None, :]
    sin = torch.sin(freqs)[None, :, None, :]
    q1, q2 = q[..., : D // 2], q[..., D // 2:]
    return torch.cat([q1 * cos - q2 * sin, q2 * cos + q1 * sin], dim=-1)


# --------------------------- unCLIP UNet oracle -----------------------------
# Independent NCHW torch implementation of the UNet2DCondition math + the
# StableUnCLIP img2img denoise-loop semantics the JAX pipeline rebuilds
# (reference models/pipeline_stable_unclip_img2img.py:575-794:
# noise_image_embeddings :528-573, CFG batching :755-770, DDIM v-pred step).
# Driven by the same param pytree (as numpy) as seed_tpu.models.unclip —
# written from the block math, not from either implementation.

def _conv(p, x, stride=1):
    w = t(p["kernel"]).permute(3, 2, 0, 1)           # HWIO -> OIHW
    pad = (w.shape[-2] // 2, w.shape[-1] // 2)
    return F.conv2d(x, w, t(p["bias"]), stride=stride, padding=pad)


def _gn(p, x, groups, eps=1e-5):
    return F.group_norm(x, groups, t(p["scale"]), t(p["bias"]), eps)


def _lin(p, x):
    y = x @ t(p["kernel"])
    return y + t(p["bias"]) if "bias" in p else y


def _unet_resnet(p, x, temb, groups):
    h = F.silu(_gn(p["norm1"], x, groups))
    h = _conv(p["conv1"], h)
    h = h + _lin(p["time_emb_proj"], F.silu(temb))[:, :, None, None]
    h = F.silu(_gn(p["norm2"], h, groups))
    h = _conv(p["conv2"], h)
    skip = _conv(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return skip + h


def _unet_attn(p, x, ctx, heads):
    B, N, D = x.shape
    M, hd = ctx.shape[1], D // heads
    q = _lin(p["to_q"], x).reshape(B, N, heads, hd).permute(0, 2, 1, 3)
    k = _lin(p["to_k"], ctx).reshape(B, M, heads, hd).permute(0, 2, 1, 3)
    v = _lin(p["to_v"], ctx).reshape(B, M, heads, hd).permute(0, 2, 1, 3)
    o = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(-1) @ v
    return _lin(p["to_out"], o.permute(0, 2, 1, 3).reshape(B, N, D))


def _unet_tblock(p, x, ctx, heads, eps=1e-5):
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps)
    x = x + _unet_attn(p["attn1"], h, h, heads)
    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps)
    x = x + _unet_attn(p["attn2"], h, ctx, heads)
    h = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"], eps)
    h = _lin(p["ff"]["proj"], h)
    a, gate = h.chunk(2, -1)                          # GEGLU
    return x + _lin(p["ff"]["out"], a * F.gelu(gate))


def _unet_spatial(p, x, ctx, heads, groups):
    B, C, H, W = x.shape
    h = _gn(p["norm"], x, groups)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = _lin(p["proj_in"], h)
    for blk in p["blocks"]:
        h = _unet_tblock(blk, h, ctx, heads)
    h = _lin(p["proj_out"], h)
    return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


def _sin_embed(ts, dim, max_period=10000.0):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half).float() / half)
    args = ts.float()[:, None] * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


def unclip_unet(params, ucfg, lat, ts, ctx, class_labels):
    """lat [B,4,H,W] NCHW; ts [B]; ctx [B,M,kv]; class_labels [B,Dc]."""
    C, G = ucfg.block_channels, ucfg.norm_groups
    temb = _sin_embed(ts, C[0])
    te = params["time_embedding"]
    temb = _lin(te["linear_2"], F.silu(_lin(te["linear_1"], temb)))
    if class_labels is not None and "class_embedding" in params:
        ce = params["class_embedding"]
        temb = temb + _lin(ce["linear_2"],
                           F.silu(_lin(ce["linear_1"], class_labels)))
    x = _conv(params["conv_in"], lat)
    skips = [x]
    for i, block in enumerate(params["down_blocks"]):
        heads = ucfg.attention_head_dim[i]
        for j, rp in enumerate(block["resnets"]):
            x = _unet_resnet(rp, x, temb, G)
            if block["attentions"]:
                x = _unet_spatial(block["attentions"][j], x, ctx, heads, G)
            skips.append(x)
        if "downsample" in block:
            x = _conv(block["downsample"], x, stride=2)
            skips.append(x)
    mid = params["mid_block"]
    x = _unet_resnet(mid["resnets"][0], x, temb, G)
    x = _unet_spatial(mid["attentions"][0], x, ctx,
                      ucfg.attention_head_dim[-1], G)
    x = _unet_resnet(mid["resnets"][1], x, temb, G)
    n = len(C)
    for bi, block in enumerate(params["up_blocks"]):
        heads = ucfg.attention_head_dim[n - 1 - bi]
        for j, rp in enumerate(block["resnets"]):
            x = torch.cat([x, skips.pop()], dim=1)    # skip-concat order
            x = _unet_resnet(rp, x, temb, G)
            if block["attentions"]:
                x = _unet_spatial(block["attentions"][j], x, ctx, heads, G)
        if "upsample" in block:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(block["upsample"], x)
    x = F.silu(_gn(params["conv_norm_out"], x, G))
    return _conv(params["conv_out"], x)


def _betas(n, schedule):
    if schedule == "scaled_linear":
        return torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, n,
                              dtype=torch.float64) ** 2
    # squaredcos_cap_v2
    def ab(s):
        return math.cos((s + 0.008) / 1.008 * math.pi / 2) ** 2
    return torch.tensor([min(1 - ab((i + 1) / n) / ab(i / n), 0.999)
                         for i in range(n)], dtype=torch.float64)


def unclip_denoise(params, cfg, image_embeds, latents_nhwc, steps, guidance,
                   noise_level=0, embed_noise=None, negative=None):
    """Full denoise-loop oracle: noise_image_embeddings -> CFG-batched UNet
    -> DDIM v-prediction, 'leading' timestep spacing with offset 1.
    latents_nhwc: numpy [B,h,w,4]; returns numpy [B,h,w,4]."""
    D = np.asarray(image_embeds).shape[-1]
    ddpm_ac = torch.cumprod(1 - _betas(1000, "squaredcos_cap_v2"), 0)

    def noise_emb(emb, level, noise):
        norm = params["image_normalizer"]
        x = (t(emb) - t(norm["mean"])) / t(norm["std"])
        a = ddpm_ac[level].float()
        nz = torch.zeros_like(x) if noise is None else t(noise)
        x = a.sqrt() * x + (1 - a).sqrt() * nz
        x = x * t(norm["std"]) + t(norm["mean"])
        lvl = _sin_embed(torch.full((x.shape[0],), level), D)
        return torch.cat([x, lvl], dim=1)

    cond = noise_emb(image_embeds, noise_level, embed_noise)
    uncond = (torch.zeros_like(cond) if negative is None
              else noise_emb(negative, 0, None))
    cls = torch.cat([uncond, cond], 0)
    B = cond.shape[0]
    ctx = t(params["empty_prompt_embeds"]).expand(2 * B, -1, -1)

    ac = torch.cumprod(1 - _betas(1000, "scaled_linear"), 0)
    ratio = 1000 // steps
    ts = list((torch.arange(steps) * ratio).round().long().flip(0) + 1)
    x = t(latents_nhwc).permute(0, 3, 1, 2) * 1.0     # init_noise_sigma
    for tt in ts:
        a_t = ac[tt].float()
        tp = int(tt) - ratio
        a_prev = ac[tp].float() if tp >= 0 else ac[0].float()
        lat2 = torch.cat([x, x], 0)
        pred = unclip_unet(params["unet"], cfg.unet, lat2,
                           torch.full((2 * B,), int(tt)), ctx, cls)
        pu, pc = pred.chunk(2, 0)
        pred = pu + guidance * (pc - pu)
        x0 = a_t.sqrt() * x - (1 - a_t).sqrt() * pred
        eps = a_t.sqrt() * pred + (1 - a_t).sqrt() * x
        x = a_prev.sqrt() * x0 + (1 - a_prev).sqrt() * eps
    return x.permute(0, 2, 3, 1).numpy()

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

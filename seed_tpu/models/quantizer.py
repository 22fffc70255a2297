"""Vector quantization (the 8192 x 32 SEED codebook).

Reference: models/seed_qformer/qformer_quantizer.py:22-140 (VectorQuantizer2)
and SEED_Tokenizer/lavis/models/quantize_semantic.py (training variant).

Bit-exactness note: token-ID parity with the PyTorch reference is the
acceptance bar (BASELINE.md), so the nearest-code distance
``d = |z|^2 + |e|^2 - 2 z.e`` is always computed in fp32 regardless of the
activation dtype, and argmin ties break toward the lower index exactly as
torch.argmin does.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VQResult(NamedTuple):
    quantized: jnp.ndarray   # [B, N, D] straight-through codes
    indices: jnp.ndarray     # [B, N] int32 code ids
    loss: jnp.ndarray        # commitment + codebook loss (scalar)


def init_codebook(key, n_codes: int = 8192, dim: int = 32, dtype=jnp.float32):
    # uniform(-1/n, 1/n) matches VectorQuantizer2.__init__ (:39)
    e = jax.random.uniform(key, (n_codes, dim), minval=-1.0 / n_codes,
                           maxval=1.0 / n_codes)
    return {"codebook": e.astype(dtype)}


def nearest_codes(codebook: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """argmin_j |z_i - e_j|^2 in fp32. z [..., D] -> int32 [...]."""
    zf = z.astype(jnp.float32)
    e = codebook.astype(jnp.float32)
    # |z|^2 + |e|^2 - 2 z.e  (qformer_quantizer.py:94-97); the z^2 term is
    # constant per-row and kept only for parity of intermediate values.
    d = (jnp.sum(zf * zf, axis=-1, keepdims=True)
         + jnp.sum(e * e, axis=-1)
         - 2.0 * jnp.einsum("...d,nd->...n", zf, e,
                            preferred_element_type=jnp.float32))
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def quantize(params, z: jnp.ndarray, beta: float = 0.25,
             legacy: bool = True) -> VQResult:
    """Straight-through VQ with the reference's (buggy-by-default) legacy
    beta placement (qformer_quantizer.py:104-107)."""
    cb = params["codebook"]
    idx = nearest_codes(cb, z)
    z_q = jnp.take(cb, idx, axis=0).astype(z.dtype)
    sg = jax.lax.stop_gradient
    zf, zqf = z.astype(jnp.float32), z_q.astype(jnp.float32)
    if legacy:
        loss = jnp.mean((sg(zqf) - zf) ** 2) + beta * jnp.mean((zqf - sg(zf)) ** 2)
    else:
        loss = beta * jnp.mean((sg(zqf) - zf) ** 2) + jnp.mean((zqf - sg(zf)) ** 2)
    z_q = z + sg(z_q - z)  # straight-through estimator (:110)
    return VQResult(z_q, idx, loss)


def lookup(params, indices: jnp.ndarray) -> jnp.ndarray:
    """Codebook entry lookup (get_codebook_entry, :125-140).

    Out-of-range ids clamp to the nearest valid code (JAX's default OOB
    fill would silently produce NaN embeddings for malformed requests)."""
    return jnp.take(params["codebook"], indices, axis=0, mode="clip")


# ---- EMA codebook (NormEMAVectorQuantizer of the experimental DVM path,
#      MultiModalLLM/src/tokenizer/.../quantizer.py:178-231) ----------------

def init_ema_codebook(key, n_codes: int, dim: int):
    e = jax.random.normal(key, (n_codes, dim))
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    return {"codebook": e, "cluster_size": jnp.zeros((n_codes,)),
            "embed_avg": e.copy()}


def ema_update(params, z: jnp.ndarray, indices: jnp.ndarray,
               decay: float = 0.99, eps: float = 1e-5):
    """One EMA codebook update step; returns new params (pure function)."""
    n_codes = params["codebook"].shape[0]
    zf = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
    onehot = jax.nn.one_hot(indices.reshape(-1), n_codes, dtype=jnp.float32)
    counts = onehot.sum(0)
    sums = onehot.T @ zf
    cluster = decay * params["cluster_size"] + (1 - decay) * counts
    avg = decay * params["embed_avg"] + (1 - decay) * sums
    n = cluster.sum()
    smoothed = (cluster + eps) / (n + n_codes * eps) * n
    return {"codebook": avg / smoothed[:, None],
            "cluster_size": cluster, "embed_avg": avg}

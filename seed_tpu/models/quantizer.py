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


# ---- Gumbel-softmax quantizer (GumbelQuantize training variant,
#      SEED_Tokenizer/lavis/models/quantize_semantic.py:110-199) ------------

def init_gumbel(key, n_codes: int, dim: int, in_dim: int, dtype=jnp.float32):
    """proj (features -> code logits, the 1x1-conv equivalent) + codebook."""
    k1, k2 = jax.random.split(key)
    std = 1.0 / jnp.sqrt(in_dim)
    proj = (jax.random.truncated_normal(k1, -2, 2, (in_dim, n_codes)) * std)
    e = jax.random.normal(k2, (n_codes, dim)) * 0.02
    return {"proj": {"kernel": proj.astype(dtype),
                     "bias": jnp.zeros((n_codes,), dtype)},
            "codebook": e.astype(dtype)}


def gumbel_quantize(params, z: jnp.ndarray, rng, temp: float = 1.0,
                    kl_weight: float = 5e-4, hard: bool = True) -> VQResult:
    """Gumbel-softmax categorical reparameterization (Jang et al. 2016).

    z [..., in_dim] -> logits over codes -> gumbel-softmax sample ->
    z_q = onehot @ codebook (straight-through when ``hard``), plus the
    KL-to-uniform-prior regularizer (quantize_semantic.py:188-190). In
    eval, pass hard=True and rng=None for a deterministic argmax."""
    logits = (z.astype(jnp.float32) @ params["proj"]["kernel"].astype(jnp.float32)
              + params["proj"]["bias"].astype(jnp.float32))
    if rng is not None:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape, minval=1e-10, maxval=1.0)))
        y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
    else:
        y_soft = jax.nn.softmax(logits / temp, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1).astype(jnp.int32)
    if hard:
        one_hot = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
        y = y_soft + jax.lax.stop_gradient(one_hot - y_soft)  # ST estimator
    else:
        y = y_soft
    z_q = (y @ params["codebook"].astype(jnp.float32)).astype(z.dtype)
    qy = jax.nn.softmax(logits, axis=-1)
    n = logits.shape[-1]
    kl = kl_weight * jnp.mean(
        jnp.sum(qy * jnp.log(qy * n + 1e-10), axis=-1))
    return VQResult(z_q, idx, kl)


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


# ---- Norm-EMA quantizer (NormEMAVectorQuantizer, the discrete-vision-model
#      codebook: MultiModalLLM/src/tokenizer/.../quantizer.py:239-329) ------

def _l2norm(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def norm_ema_quantize(params, z: jnp.ndarray, beta: float = 0.25) -> VQResult:
    """Norm-EMA VQ forward (quantizer.py:274-334 semantics).

    z is l2-normalized BEFORE the nearest-code search; the codebook rows
    live on the unit sphere (maintained by ``norm_ema_update``). The only
    gradient loss is the commitment term ``beta * mean((sg(z_q) - z)^2)``
    — the codebook itself learns via EMA, not backprop. Straight-through
    on the normalized z.
    """
    zf = _l2norm(z.astype(jnp.float32))
    idx = nearest_codes(params["codebook"], zf)
    z_q = jnp.take(params["codebook"], idx, axis=0).astype(jnp.float32)
    sg = jax.lax.stop_gradient
    loss = beta * jnp.mean((sg(z_q) - zf) ** 2)
    out = (zf + sg(z_q - zf)).astype(z.dtype)
    return VQResult(out, idx, loss)


def norm_ema_update(params, z: jnp.ndarray, indices: jnp.ndarray,
                    decay: float = 0.99, axis_name: str | None = None):
    """Norm-EMA codebook step (quantizer.py:303-325), pure-functional.

    Per-code means of the (normalized) assigned vectors are l2-normalized,
    codes with zero assignments keep their old row, and the EMA'd weight
    is re-projected onto the unit sphere (norm_ema_inplace :237-239).
    ``axis_name`` psums bins/sums across data-parallel devices — the
    reference's ``all_reduce_fn`` under DDP.
    """
    n_codes = params["codebook"].shape[0]
    zf = _l2norm(z.reshape(-1, z.shape[-1]).astype(jnp.float32))
    onehot = jax.nn.one_hot(indices.reshape(-1), n_codes, dtype=jnp.float32)
    bins = onehot.sum(0)
    sums = onehot.T @ zf
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)
        sums = jax.lax.psum(sums, axis_name)
    cluster = decay * params["cluster_size"] + (1 - decay) * bins
    zero = bins == 0
    mean = sums / jnp.where(zero, 1.0, bins)[:, None]
    target = jnp.where(zero[:, None], params["codebook"], _l2norm(mean))
    weight = _l2norm(decay * params["codebook"] + (1 - decay) * target)
    return {"codebook": weight, "cluster_size": cluster,
            "embed_avg": params.get("embed_avg", weight)}


def kmeans_init_codebook(key, samples: jnp.ndarray, n_codes: int,
                         iters: int = 10):
    """Cosine-similarity k-means codebook init (EmbeddingEMA kmeans_init,
    quantizer.py:149-176 + :211-217). samples [N, D] (normalized inside);
    returns unit-norm [n_codes, D] means (empty clusters keep their seed)."""
    x = _l2norm(samples.astype(jnp.float32))
    n = x.shape[0]
    perm = jax.random.permutation(key, n)
    idx = perm[:n_codes] if n >= n_codes else jax.random.randint(
        key, (n_codes,), 0, n)
    means = x[idx]

    def step(means, _):
        buckets = jnp.argmax(x @ means.T, axis=-1)
        onehot = jax.nn.one_hot(buckets, n_codes, dtype=jnp.float32)
        bins = onehot.sum(0)
        new = _l2norm((onehot.T @ x) / jnp.maximum(bins, 1.0)[:, None])
        return jnp.where((bins == 0)[:, None], means, new), None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    return means

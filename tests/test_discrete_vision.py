"""Discrete vision model (the reference's dormant alternative tokenizer).

Oracle parity is against independent torch/numpy transcriptions written
here (never the reference package — it imports diffusers/timm, absent in
this container). Covers:
- NormEMAVectorQuantizer forward + EMA update semantics
  (discrete_vision_model/quantizer.py:239-329)
- the faithful-quirk contrastive loss (unnormalized embeds, LINEAR
  logit_scale — modeling.py:125-139)
- full DiscreteVisionModel forward: frozen tower gets no gradient,
  straight-through reaches the quant encoder, loss composition
- the FroClipEmbed variant (simple + transformer encoders, both
  quantizers) and cosine-kmeans codebook init
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from seed_tpu.models import discrete_vision as DV
from seed_tpu.models import quantizer as Q
from seed_tpu.models import vit as V
from seed_tpu.models.layers import count_params


def _l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class TestNormEMAQuantizer:
    def test_forward_matches_torch_oracle(self):
        rng = np.random.RandomState(0)
        z = rng.randn(4, 6, 8).astype(np.float32)
        cb = _l2n(rng.randn(32, 8).astype(np.float32))
        params = {"codebook": jnp.asarray(cb),
                  "cluster_size": jnp.zeros((32,)),
                  "embed_avg": jnp.asarray(cb)}
        out = Q.norm_ema_quantize(params, jnp.asarray(z), beta=0.25)

        # independent torch oracle of quantizer.py:274-334
        zt = F.normalize(torch.tensor(z), dim=-1)
        zf = zt.reshape(-1, 8)
        w = torch.tensor(cb)
        d = (zf.pow(2).sum(1, keepdim=True) + w.pow(2).sum(1)
             - 2 * zf @ w.t())
        idx = torch.argmin(d, dim=1)
        z_q = w[idx].view(zt.shape)
        loss = 0.25 * F.mse_loss(z_q.detach(), zt)

        np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1),
                                      idx.numpy())
        np.testing.assert_allclose(float(out.loss), loss.item(), rtol=1e-5)
        # straight-through VALUE is the code row
        np.testing.assert_allclose(np.asarray(out.quantized),
                                   z_q.numpy(), atol=1e-6)

    def test_update_matches_torch_oracle(self):
        rng = np.random.RandomState(1)
        z = rng.randn(64, 8).astype(np.float32)
        cb = _l2n(rng.randn(16, 8).astype(np.float32))
        params = {"codebook": jnp.asarray(cb),
                  "cluster_size": jnp.zeros((16,)),
                  "embed_avg": jnp.asarray(cb)}
        vq = Q.norm_ema_quantize(params, jnp.asarray(z))
        new = Q.norm_ema_update(params, jnp.asarray(z), vq.indices,
                                decay=0.9)

        # oracle: quantizer.py:303-325 training branch
        zt = F.normalize(torch.tensor(z), dim=-1)
        idx = torch.tensor(np.asarray(vq.indices).reshape(-1).astype(np.int64))
        enc = F.one_hot(idx, 16).float()
        bins = enc.sum(0)
        cluster = 0.9 * torch.zeros(16) + 0.1 * bins
        zero = bins == 0
        binsf = bins.masked_fill(zero, 1.0)
        emb_sum = zt.reshape(-1, 8).t() @ enc
        emb_norm = F.normalize((emb_sum / binsf.unsqueeze(0)).t(), dim=-1)
        emb_norm = torch.where(zero[:, None], torch.tensor(cb), emb_norm)
        weight = F.normalize(0.9 * torch.tensor(cb) + 0.1 * emb_norm, dim=-1)

        np.testing.assert_allclose(np.asarray(new["cluster_size"]),
                                   cluster.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new["codebook"]),
                                   weight.numpy(), atol=1e-5)

    def test_commitment_grad_only(self):
        """The codebook gets NO gradient (EMA-learned); z gets beta-MSE."""
        rng = np.random.RandomState(2)
        z = jnp.asarray(rng.randn(4, 8), jnp.float32)
        cb = jnp.asarray(_l2n(rng.randn(16, 8)), jnp.float32)
        params = {"codebook": cb, "cluster_size": jnp.zeros((16,)),
                  "embed_avg": cb}
        g_cb, g_z = jax.grad(
            lambda c, zz: Q.norm_ema_quantize({**params, "codebook": c},
                                              zz).loss, argnums=(0, 1))(cb, z)
        assert float(jnp.abs(g_cb).max()) == 0.0
        assert float(jnp.abs(g_z).max()) > 0.0

    def test_kmeans_init(self):
        rng = np.random.RandomState(3)
        # two well-separated direction clusters
        a = _l2n(rng.randn(40, 8) * 0.05 + np.array([1.0] + [0.0] * 7))
        b = _l2n(rng.randn(40, 8) * 0.05 + np.array([0.0, 1.0] + [0.0] * 6))
        samples = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        means = Q.kmeans_init_codebook(jax.random.PRNGKey(0), samples, 2,
                                       iters=10)
        means = np.asarray(means)
        np.testing.assert_allclose(np.linalg.norm(means, axis=-1), 1.0,
                                   atol=1e-5)
        # each cluster center should align with one cluster direction
        sims = means @ np.stack([a.mean(0), b.mean(0)]).T
        assert sims.max(axis=1).min() > 0.9


class TestContrastive:
    def test_matches_torch_linear_scale_no_norm(self):
        rng = np.random.RandomState(4)
        x = rng.randn(6, 8).astype(np.float32)
        y = rng.randn(6, 8).astype(np.float32)
        got = DV.clip_contrastive_loss(jnp.asarray(2.6592), jnp.asarray(x),
                                       jnp.asarray(y))
        xt, yt = torch.tensor(x), torch.tensor(y)
        logits = 2.6592 * xt @ yt.t()          # modeling.py:130 — no exp()
        tgt = torch.arange(6)
        want = (F.cross_entropy(logits, tgt)
                + F.cross_entropy(logits.t(), tgt)) / 2
        np.testing.assert_allclose(float(got), want.item(), rtol=1e-5)


class TestDiscreteVisionModel:
    def _setup(self):
        cfg = DV.TINY_DVM
        tower_cfg = V.ViTConfig(image_size=28, patch_size=14, dim=cfg.hidden,
                                depth=2, heads=2, mlp_dim=64,
                                qkv_bias="full", act="quick_gelu",
                                ln_eps=1e-5, ln_pre=True, patch_bias=False)
        k = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        params = DV.init_dvm(k1, cfg)
        tower = V.init_vit(k2, tower_cfg)
        head = V.init_clip_vision_projection(k3, tower_cfg,
                                             proj_dim=cfg.proj_dim)
        images = jax.random.normal(k4, (3, 28, 28, 3))
        return cfg, tower_cfg, params, tower, head, images

    def test_forward_and_composition(self):
        cfg, tcfg, params, tower, head, images = self._setup()
        total, m = DV.dvm_loss(params, tower, head, images, cfg, tcfg)
        # composition: total == 1*rec + 1*quant + 1*iti (modeling.py:120)
        np.testing.assert_allclose(
            float(total),
            float(m["loss_rec"]) + float(m["loss_quant"]) + float(m["loss_iti"]),
            rtol=1e-6)
        assert m["indices"].shape == (3, tcfg.num_patches + 1)
        assert int(m["indices"].max()) < cfg.n_codes

    def test_frozen_tower_no_grad_st_reaches_encoder(self):
        cfg, tcfg, params, tower, head, images = self._setup()

        def loss(p, tw):
            return DV.dvm_loss(p, tw, head, images, cfg, tcfg)[0]

        gp, gt = jax.grad(loss, argnums=(0, 1))(params, tower)
        tower_gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(gt))
        assert tower_gnorm == 0.0                     # modeling.py:91-94
        enc_gnorm = sum(float(jnp.abs(g).sum())
                        for g in jax.tree.leaves(gp["quant_encoder"]))
        assert enc_gnorm > 0.0                        # straight-through works
        assert float(jnp.abs(gp["logit_scale"])) > 0.0

    def test_encode_decode_roundtrip_shapes(self):
        cfg, tcfg, params, tower, head, images = self._setup()
        hidden = V.vit_apply(tower, images, tcfg)
        ids = DV.dvm_encode(params, hidden, cfg)
        rec = DV.dvm_decode(params, ids, cfg)
        assert rec.shape == hidden.shape
        # decode is deterministic in the ids
        rec2 = DV.dvm_decode(params, ids, cfg)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))


class TestClipEmbedVariant:
    @pytest.mark.parametrize("encoder", ["simple", "transformer"])
    @pytest.mark.parametrize("quantizer", ["st", "norm_ema"])
    def test_forward_and_grads(self, encoder, quantizer):
        cfg = DV.ClipEmbedDVMConfig(embed_dim=64, num_token=4, code_dim=8,
                                    n_codes=32, encoder=encoder,
                                    quantizer=quantizer, hidden=32, depth=1,
                                    heads=2, mlp_dim=64)
        params = DV.init_clip_embed_dvm(jax.random.PRNGKey(0), cfg)
        embed = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
        (total, m), grads = jax.value_and_grad(
            lambda p: DV.dvm_clip_embed_loss(p, embed, cfg), has_aux=True)(
                params)
        assert m["predict_embed"].shape == (5, 64)
        assert m["indices"].shape == (5, 4)
        np.testing.assert_allclose(
            float(total), float(m["loss_quant"]) + float(m["loss_rec"]),
            rtol=1e-6)
        g = sum(float(jnp.abs(x).sum())
                for x in jax.tree.leaves(grads["quant_encoder"]))
        assert np.isfinite(float(total)) and g > 0.0

    def test_norm_ema_training_improves_usage(self):
        """A few EMA steps should move codebook rows toward the data."""
        cfg = DV.ClipEmbedDVMConfig(embed_dim=32, num_token=4, code_dim=8,
                                    n_codes=16, quantizer="norm_ema",
                                    hidden=16)
        params = DV.init_clip_embed_dvm(jax.random.PRNGKey(0), cfg)
        embed = jax.random.normal(jax.random.PRNGKey(1), (32, 32))
        _, m0 = DV.dvm_clip_embed_loss(params, embed, cfg)
        vq = params["vq"]
        for _ in range(5):
            _, m = DV.dvm_clip_embed_loss({**params, "vq": vq}, embed, cfg)
            vq = Q.norm_ema_update(vq, m["z"], m["indices"], decay=0.5)
        _, m1 = DV.dvm_clip_embed_loss({**params, "vq": vq}, embed, cfg)
        assert float(m1["loss_quant"]) < float(m0["loss_quant"])


def test_param_count_sane():
    p = DV.init_dvm(jax.random.PRNGKey(0), DV.TINY_DVM)
    assert count_params(p) > 0

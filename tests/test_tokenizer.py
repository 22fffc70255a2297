"""SEED-2 tokenizer: parity vs independent torch oracles + invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.models import (TINY_TOKENIZER, TINY_VIT, ViTConfig,
                             decode_embedding, encode, encode_features,
                             init_seed_tokenizer, init_vit, nearest_codes,
                             vit_apply)
from seed_tpu.models import layers as L
from seed_tpu.models.qformer import (QFormerConfig, init_qformer,
                                     qformer_apply, seed_causal_mask)
from seed_tpu.models.vit import block_apply, init_block

import torch_oracles as oracle


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


class TestViTBlock:
    @pytest.mark.parametrize("qkv_mode", ["qv", "full"])
    def test_block_matches_torch(self, qkv_mode):
        cfg = ViTConfig(dim=64, depth=1, heads=4, mlp_dim=128,
                        qkv_bias=qkv_mode, ln_eps=1e-6)
        key = jax.random.PRNGKey(0)
        p = init_block(key, cfg.dim, cfg.mlp_dim, qkv_mode)
        # randomize biases so the test is not trivially zero
        p = jax.tree.map(
            lambda x: x + 0.02 * jax.random.normal(key, x.shape), p)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, cfg.dim))

        got = block_apply(p, x, cfg)
        want = oracle.vit_block(oracle.t(np.asarray(x)), to_np(p), cfg.heads,
                                cfg.ln_eps, qkv_mode=qkv_mode)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-5, atol=2e-5)

    def test_eva_vit_shapes(self):
        p = init_vit(jax.random.PRNGKey(0), TINY_VIT)
        img = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28, 3))
        out = vit_apply(p, img, TINY_VIT)
        assert out.shape == (3, TINY_VIT.num_patches + 1, TINY_VIT.dim)

    def test_patchify_matches_conv_semantics(self):
        """Patch-matmul must equal a stride=patch conv (torch oracle)."""
        import torch
        cfg = ViTConfig(image_size=28, patch_size=14, dim=16, depth=1,
                        heads=2, mlp_dim=32)
        p = init_vit(jax.random.PRNGKey(0), cfg)
        img = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)

        from seed_tpu.models.vit import patchify
        got = np.asarray(
            L.linear(p["patch_embed"], patchify(jnp.asarray(img), 14)))

        # conv weight from our kernel layout [(di,dj,c), D] -> [D, C, P, P]
        kern = np.asarray(p["patch_embed"]["kernel"]).reshape(14, 14, 3, cfg.dim)
        w = torch.from_numpy(kern.transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["patch_embed"]["bias"]))
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        want = torch.nn.functional.conv2d(x, w, b, stride=14)
        want = want.flatten(2).transpose(1, 2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestQFormer:
    CFG = QFormerConfig(hidden=32, layers=4, heads=4, intermediate=64,
                        encoder_width=24, query_len=8)

    def _params(self, key=0):
        p = init_qformer(jax.random.PRNGKey(key), self.CFG)
        k = jax.random.PRNGKey(key + 100)
        return jax.tree.map(lambda x: x + 0.02 * jax.random.normal(k, x.shape), p)

    def test_causal_mask_shape_and_semantics(self):
        m = np.asarray(seed_causal_mask(4, 3))
        # queries attend causally among themselves
        assert m[0, 0, 0, 1] == False and m[0, 0, 1, 0] == True
        assert m[0, 0, 2, 2] == True
        # queries attend fully to text; text attends to everything
        assert m[0, 0, 0, 4:].all() and m[0, 0, 5, :].all()

    def test_qformer_matches_oracle(self):
        cfg = self.CFG
        p = self._params()
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.encoder_width))
        got = np.asarray(qformer_apply(p, img, cfg))

        # independent oracle: embeddings LN -> per-layer self/cross/ffn
        import torch
        x = np.broadcast_to(np.asarray(p["query_tokens"]),
                            (2, cfg.query_len, cfg.hidden))
        xt = oracle.layer_norm(oracle.t(x), p["embeddings"]["norm"]["scale"],
                               p["embeddings"]["norm"]["bias"], cfg.ln_eps)
        mask = torch.from_numpy(np.asarray(seed_causal_mask(cfg.query_len)))
        img_t = oracle.t(np.asarray(img))
        for i, layer in enumerate(to_np(p["layers"])):
            xt = oracle.bert_attention(xt, xt, layer["self"], cfg.heads,
                                       cfg.ln_eps, mask=mask)
            if "cross" in layer:
                xt = oracle.bert_attention(xt, img_t, layer["cross"],
                                           cfg.heads, cfg.ln_eps)
            xt = oracle.bert_ffn(xt, layer["ffn_q"], cfg.ln_eps)
        np.testing.assert_allclose(got, xt.numpy(), rtol=3e-5, atol=3e-5)

    def test_causality_of_queries(self):
        """Perturbing the image must change codes; queries are causal:
        the Q-Former hidden state at query i must not depend on query j>i.
        We check via jacobian sparsity on a 1-layer config."""
        cfg = QFormerConfig(hidden=8, layers=1, heads=2, intermediate=16,
                            encoder_width=8, query_len=4)
        p = init_qformer(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))

        def f(qt):
            pp = dict(p)
            pp = jax.tree_util.tree_map(lambda x: x, p)
            pp["query_tokens"] = qt
            return qformer_apply(pp, img, cfg)[0]

        jac = jax.jacobian(f)(p["query_tokens"])  # [Q, H, 1, Q, H]
        jac = np.abs(np.asarray(jac)).sum(axis=(1, 4))[:, 0, :]  # [Q_out, Q_in]
        for i in range(cfg.query_len):
            for j in range(cfg.query_len):
                if j > i:
                    assert jac[i, j] < 1e-7, (i, j, jac[i, j])
                # diagonal/lower entries must be nonzero
            assert jac[i, i] > 1e-7


class TestVQ:
    def test_nearest_matches_torch(self):
        rng = np.random.RandomState(0)
        cb = rng.randn(64, 8).astype(np.float32)
        z = rng.randn(4, 6, 8).astype(np.float32)
        got = np.asarray(nearest_codes(jnp.asarray(cb), jnp.asarray(z)))
        want = oracle.vq_nearest(cb, z)
        np.testing.assert_array_equal(got, want)

    def test_bf16_activations_fp32_codebook_parity(self):
        """Indices computed from bf16-cast z must match fp32 for well-
        separated codes (the bit-exactness strategy: fp32 distance math)."""
        rng = np.random.RandomState(1)
        cb = (rng.randn(512, 32) * 2).astype(np.float32)
        z = cb[rng.randint(0, 512, size=(8, 32))] + 0.01 * rng.randn(8, 32, 32).astype(np.float32)
        i32 = np.asarray(nearest_codes(jnp.asarray(cb), jnp.asarray(z)))
        ib16 = np.asarray(nearest_codes(jnp.asarray(cb),
                                        jnp.asarray(z, jnp.bfloat16)))
        assert (i32 == ib16).mean() == 1.0


class TestGumbelQuantizer:
    def test_shapes_loss_and_straight_through(self):
        from seed_tpu.models.quantizer import gumbel_quantize, init_gumbel
        p = init_gumbel(jax.random.PRNGKey(0), n_codes=32, dim=8, in_dim=16)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        out = gumbel_quantize(p, z, jax.random.PRNGKey(2), temp=1.0)
        assert out.quantized.shape == (2, 5, 8)
        assert out.indices.shape == (2, 5)
        assert out.indices.dtype == jnp.int32
        assert np.isfinite(float(out.loss))
        # hard=True quantized rows equal exact codebook rows in fwd value
        cb = np.asarray(p["codebook"])
        np.testing.assert_allclose(np.asarray(out.quantized),
                                   cb[np.asarray(out.indices)],
                                   rtol=1e-5, atol=1e-6)
        # gradient flows through the ST estimator to proj AND codebook
        g = jax.grad(lambda pp: jnp.sum(gumbel_quantize(
            pp, z, jax.random.PRNGKey(2)).quantized ** 2))(p)
        assert np.abs(np.asarray(g["codebook"])).max() > 0
        assert np.abs(np.asarray(g["proj"]["kernel"])).max() > 0

    def test_eval_mode_deterministic_argmax(self):
        from seed_tpu.models.quantizer import gumbel_quantize, init_gumbel
        p = init_gumbel(jax.random.PRNGKey(0), n_codes=32, dim=8, in_dim=16)
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 16))
        a = gumbel_quantize(p, z, None)
        b = gumbel_quantize(p, z, None)
        np.testing.assert_array_equal(np.asarray(a.indices),
                                      np.asarray(b.indices))
        logits = np.asarray(z.astype(jnp.float32) @ p["proj"]["kernel"]
                            + p["proj"]["bias"])
        np.testing.assert_array_equal(np.asarray(a.indices),
                                      logits.argmax(-1))


class TestSeedTokenizer:
    def test_encode_decode_shapes(self):
        cfg = TINY_TOKENIZER
        p = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        ids = encode(p, img, cfg)
        assert ids.shape == (2, cfg.qformer.query_len)
        assert ids.dtype == jnp.int32
        assert (np.asarray(ids) >= 0).all()
        assert (np.asarray(ids) < cfg.codebook_size).all()
        emb = decode_embedding(p, ids, cfg)
        assert emb.shape == (2, cfg.image_embed_dim)

    def test_encode_jits_and_is_deterministic(self):
        cfg = TINY_TOKENIZER
        p = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        f = jax.jit(lambda pp, x: encode(pp, x, cfg))
        a, b = f(p, img), f(p, img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_images_different_codes(self):
        cfg = TINY_TOKENIZER
        p = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3)) * 3
        ids = np.asarray(encode(p, imgs, cfg))
        assert not (ids[0] == ids[1]).all()

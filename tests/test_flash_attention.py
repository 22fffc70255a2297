"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.ops.attention import mha, sliced_causal_mask
from seed_tpu.ops.flash_attention import _flash, flash_attention


def rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestFlashForward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_xla_aligned(self, causal):
        B, S, H, D = 1, 256, 2, 128
        q, k, v = rand((B, S, H, D), 0), rand((B, S, H, D), 1), rand((B, S, H, D), 2)
        got = _flash(q, k, v, causal, D ** -0.5, 0)
        mask = sliced_causal_mask(S, S, 0) if causal else None
        want = mha(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_unaligned_head_dim_and_seq(self):
        """D=88 (EVA) and S=257 exercise the padding path (causal)."""
        B, S, H, D = 1, 257, 2, 88
        q, k, v = rand((B, S, H, D), 0), rand((B, S, H, D), 1), rand((B, S, H, D), 2)
        got = _flash(q, k, v, True, D ** -0.5, 0)
        want = mha(q, k, v, mask=sliced_causal_mask(S, S, 0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_noncausal_unaligned_kv_vit_shape(self):
        """The EVA-ViT shape (S=257, D=88, NON-causal): padded kv columns
        must be masked in-kernel or zero K rows leak softmax weight."""
        B, S, H, D = 2, 257, 2, 88
        q, k, v = rand((B, S, H, D), 0), rand((B, S, H, D), 1), rand((B, S, H, D), 2)
        got = _flash(q, k, v, False, D ** -0.5, 0)
        want = mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        # the public entry must now route this shape to the kernel too
        got2 = flash_attention(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_vit_block_use_flash_matches_xla(self):
        """block_apply(use_flash=True) numerics vs the mha path."""
        import dataclasses
        from seed_tpu.models import vit as V
        cfg = dataclasses.replace(V.ViTConfig(image_size=28, patch_size=14,
                                              dim=32, depth=2, heads=2,
                                              mlp_dim=64))
        p = V.init_vit(jax.random.PRNGKey(0), cfg)
        imgs = rand((2, 28, 28, 3), 3)
        want = V.vit_apply(p, imgs, cfg)
        got = V.vit_apply(p, imgs, dataclasses.replace(cfg, use_flash=True))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_q_offset_chunked_prefill(self):
        """Chunked prefill: q chunk at offset inside a longer kv."""
        B, H, D = 1, 2, 128
        Sk, Sq, off = 512, 256, 256
        q = rand((B, Sq, H, D), 0)
        k, v = rand((B, Sk, H, D), 1), rand((B, Sk, H, D), 2)
        got = _flash(q, k, v, True, D ** -0.5, off)
        want = mha(q, k, v, mask=sliced_causal_mask(Sq, Sk, off))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_public_entry_fallback_small(self):
        """Small shapes take the XLA path; output must still be correct."""
        q, k, v = rand((2, 16, 2, 32), 0), rand((2, 16, 2, 32), 1), rand((2, 16, 2, 32), 2)
        got = flash_attention(q, k, v, causal=True)
        want = mha(q, k, v, mask=sliced_causal_mask(16, 16, 0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gqa_repeat(self):
        q = rand((1, 256, 4, 128), 0)
        k, v = rand((1, 256, 2, 128), 1), rand((1, 256, 2, 128), 2)
        got = flash_attention(q, k, v, causal=True)
        want = mha(q, k, v, mask=sliced_causal_mask(256, 256, 0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestShortMhaExactBranch:
    """The op-faithful branch of _short_mha (normalize fp32 probs, round
    to io dtype, then P@V — the op sequence of ops/attention.mha). Even in
    interpret mode the backends may reassociate matmul accumulations
    (oneDNN on CPU), so the contract is ulp-level agreement — measured
    0.02% of elements off by one bf16 ulp — vs the fast branch's
    reordered-rounding divergence, which is orders of magnitude wider.
    The shipping decision for the exact encode path rests on the
    full-scale on-chip token-id agreement (scripts/probe_exact_attn.py,
    PERF.md round 4)."""

    def test_fp32_ulp_close_vit_shape(self):
        from seed_tpu.ops.flash_attention import _short_mha
        B, S, H, D = 2, 257, 4, 88
        q, k, v = rand((B, S, H, D), 7), rand((B, S, H, D), 8), rand((B, S, H, D), 9)
        got = np.asarray(_short_mha(q, k, v, D ** -0.5, True))
        want = np.asarray(mha(q, k, v))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)

    def test_bf16_exact_tighter_than_fast(self):
        from seed_tpu.ops.flash_attention import _short_mha
        B, S, H, D = 2, 65, 4, 24
        q = rand((B, S, H, D), 10).astype(jnp.bfloat16)
        k = rand((B, S, H, D), 11).astype(jnp.bfloat16)
        v = rand((B, S, H, D), 12).astype(jnp.bfloat16)
        want = np.asarray(mha(q, k, v).astype(jnp.float32))
        got = np.asarray(_short_mha(q, k, v, D ** -0.5, True).astype(jnp.float32))
        # one bf16 ulp at these magnitudes, and almost everywhere equal
        np.testing.assert_allclose(got, want, atol=4e-3, rtol=1e-2)
        assert (got == want).mean() > 0.995
        fast = np.asarray(_short_mha(q, k, v, D ** -0.5, False).astype(jnp.float32))
        assert (got == want).mean() >= (fast == want).mean()

    def test_vit_flash_exact_config_routes(self):
        import dataclasses
        from seed_tpu.models import vit as V
        cfg = V.ViTConfig(image_size=28, patch_size=14, dim=32, depth=2,
                          heads=2, mlp_dim=64)
        p = V.init_vit(jax.random.PRNGKey(0), cfg)
        imgs = rand((2, 28, 28, 3), 13)
        want = V.vit_apply(p, imgs, cfg)
        got = V.vit_apply(p, imgs, dataclasses.replace(
            cfg, use_flash=True, flash_exact=True))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestFlashBackward:
    def test_grads_match_xla(self):
        B, S, H, D = 1, 256, 2, 128
        q, k, v = rand((B, S, H, D), 0), rand((B, S, H, D), 1), rand((B, S, H, D), 2)

        def f_flash(q, k, v):
            return jnp.sum(_flash(q, k, v, True, D ** -0.5, 0) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(mha(q, k, v, mask=sliced_causal_mask(S, S, 0)) ** 2)

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-3)

    def test_grads_unaligned_causal(self):
        """Padded q rows / kv cols must not leak into grads (S=300)."""
        B, S, H, D = 1, 300, 2, 64
        q, k, v = rand((B, S, H, D), 3), rand((B, S, H, D), 4), rand((B, S, H, D), 5)

        def f_flash(q, k, v):
            return jnp.sum(_flash(q, k, v, True, D ** -0.5, 0) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(mha(q, k, v, mask=sliced_causal_mask(S, S, 0)) ** 2)

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-3)

    def test_grads_noncausal_unaligned_kv(self):
        """The ViT shape through the generic kernel's backward."""
        B, S, H, D = 1, 257, 2, 88
        q, k, v = rand((B, S, H, D), 6), rand((B, S, H, D), 7), rand((B, S, H, D), 8)

        def f_flash(q, k, v):
            return jnp.sum(_flash(q, k, v, False, D ** -0.5, 0) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(mha(q, k, v) ** 2)

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-3)


class TestFlashInLlama:
    def test_forward_flash_matches_xla(self):
        """use_flash=True must match the XLA path for right-padded input."""
        import jax.numpy as jnp
        from seed_tpu.models import llama as M
        cfg = M.LlamaConfig(vocab_size=300, dim=64, layers=2, heads=2,
                            kv_heads=2, ffn_dim=128, max_seq_len=512)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(0).randint(
            3, 280, size=(2, 256)), jnp.int32)
        a = np.asarray(M.forward(params, ids, cfg))
        b = np.asarray(M.forward(params, ids, cfg, use_flash=True))
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    def test_flash_grads_flow(self):
        import jax.numpy as jnp
        from seed_tpu.models import llama as M
        from seed_tpu.train import next_token_loss
        cfg = M.LlamaConfig(vocab_size=300, dim=64, layers=2, heads=2,
                            kv_heads=2, ffn_dim=128, max_seq_len=512)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(0).randint(
            3, 280, size=(1, 256)), jnp.int32)

        def loss(p):
            return next_token_loss(
                M.forward(p, ids, cfg, use_flash=True, remat=True), ids)

        g = jax.grad(loss)(params)
        gmax = max(np.abs(np.asarray(x)).max() for x in jax.tree.leaves(g))
        assert np.isfinite(gmax) and gmax > 0

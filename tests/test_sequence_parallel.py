"""Sequence (context) parallelism: ring attention + sp LLaMA loss.

Parity vs the single-device exact paths, on the 8-virtual-CPU mesh
(conftest) — the same mechanism as the pipeline-parallel tests. The
reference has no sequence-parallel strategy (beyond-parity, SURVEY §2.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.models import llama as M
from seed_tpu.ops.attention import causal_mask, mha
from seed_tpu.parallel import (llama_loss_sp, make_mesh,
                               sequence_parallel_attention)
from seed_tpu.train import next_token_loss


def _qkv(rng, B, S, H, Hkv, D):
    ks = jax.random.split(jax.random.PRNGKey(rng), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    return q, k, v


class TestRingAttention:
    @pytest.mark.parametrize("sp", [2, 4, 8])
    def test_causal_matches_mha(self, sp):
        mesh = make_mesh(dp=sp, fsdp=8 // sp, tp=1)
        q, k, v = _qkv(0, 2, 32, 4, 4, 16)
        want = mha(q, k, v, mask=causal_mask(32))
        got = sequence_parallel_attention(q, k, v, mesh, axis="data",
                                          causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_noncausal_matches_mha(self):
        mesh = make_mesh(dp=4, fsdp=2, tp=1)
        q, k, v = _qkv(1, 2, 24, 4, 4, 16)
        want = mha(q, k, v)
        got = sequence_parallel_attention(q, k, v, mesh, axis="data",
                                          causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_gqa_matches_mha(self):
        mesh = make_mesh(dp=4, fsdp=2, tp=1)
        q, k, v = _qkv(2, 2, 16, 8, 2, 8)   # 4 query heads per kv head
        want = mha(q, k, v, mask=causal_mask(16))
        got = sequence_parallel_attention(q, k, v, mesh, axis="data",
                                          causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_grads_flow_through_ring(self):
        mesh = make_mesh(dp=4, fsdp=2, tp=1)
        q, k, v = _qkv(3, 1, 16, 2, 2, 8)

        def loss_sp(q, k, v):
            return sequence_parallel_attention(q, k, v, mesh, axis="data",
                                               causal=True).sum()

        def loss_ref(q, k, v):
            return mha(q, k, v, mask=causal_mask(16)).sum()

        g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_sp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=3e-5)


class TestLlamaLossSP:
    def test_loss_matches_single_device(self):
        cfg = M.TINY_LLAMA
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(0).randint(
            3, cfg.vocab_size, size=(2, 32)), jnp.int32)
        want = float(next_token_loss(M.forward(params, ids, cfg), ids))
        mesh = make_mesh(dp=4, fsdp=2, tp=1)
        got = float(jax.jit(
            lambda p, i: llama_loss_sp(p, i, cfg, mesh, axis="data")
        )(params, ids))
        assert abs(got - want) < 2e-5, (got, want)

    def test_loss_respects_label_masking(self):
        cfg = M.TINY_LLAMA
        params = M.init_llama(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(1).randint(
            3, cfg.vocab_size, size=(2, 16)), jnp.int32)
        labels = np.asarray(ids).copy()
        labels[:, :7] = -100            # mask a question span incl. a
        labels = jnp.asarray(labels)    # cross-shard boundary at 8
        want = float(next_token_loss(M.forward(params, ids, cfg), ids,
                                     labels=labels))
        mesh = make_mesh(dp=2, fsdp=4, tp=1)
        got = float(llama_loss_sp(params, ids, cfg, mesh, axis="data",
                                  labels=labels))
        assert abs(got - want) < 2e-5, (got, want)

    def test_grads_match_single_device(self):
        cfg = M.TINY_LLAMA
        params = M.init_llama(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(2).randint(
            3, cfg.vocab_size, size=(1, 16)), jnp.int32)
        mesh = make_mesh(dp=4, fsdp=2, tp=1)
        g_sp = jax.grad(lambda p: llama_loss_sp(p, ids, cfg, mesh,
                                                axis="data"))(params)
        g_ref = jax.grad(lambda p: next_token_loss(
            M.forward(p, ids, cfg), ids))(params)
        flat_sp = jax.tree.leaves(g_sp)
        flat_ref = jax.tree.leaves(g_ref)
        for a, b in zip(flat_sp, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)

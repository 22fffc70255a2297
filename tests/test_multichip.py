"""Multi-chip paths: TP/FSDP-sharded serving engine + encode sharding.

These run on the 8-virtual-CPU-device mesh (conftest) — the same
mechanism the driver's dryrun_multichip uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu.models import TINY_TOKENIZER, encode, init_seed_tokenizer
from seed_tpu.models import llama as M
from seed_tpu.parallel import (LLAMA_TP_RULES, VIT_TP_RULES, batch_sharding,
                               make_mesh, shard_params)
from seed_tpu.serving import GenerationConfig, LlamaEngine

CFG = M.TINY_LLAMA


class TestShardedServing:
    def test_tp_sharded_engine_matches_unsharded(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                               eos_token_id=-1)
        want = LlamaEngine(params, CFG, max_len=64,
                           cache_dtype=jnp.float32).generate([[1, 5, 9]], gen)[0]

        mesh = make_mesh(dp=1, fsdp=4, tp=2)
        sharded = shard_params(params, mesh, LLAMA_TP_RULES)
        got = LlamaEngine(sharded, CFG, max_len=64,
                          cache_dtype=jnp.float32).generate([[1, 5, 9]], gen)[0]
        assert got == want

    def test_sharded_batch_generation(self):
        params = M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        mesh = make_mesh(dp=1, fsdp=8, tp=1)
        sharded = shard_params(params, mesh, LLAMA_TP_RULES)
        eng = LlamaEngine(sharded, CFG, max_len=64, cache_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                               eos_token_id=-1)
        outs = eng.generate([[1, 2, 3], [4, 5]], gen)
        assert len(outs) == 2 and all(len(o) == 4 for o in outs)


class TestPipelineParallel:
    def test_pipeline_loss_matches_unsharded(self):
        """GPipe over pipe=4 must reproduce the unsharded next-token loss
        bit-closely (fp32, same math, only the schedule differs)."""
        from seed_tpu.parallel.pipeline import pipeline_llama_loss
        from seed_tpu.train.losses import next_token_loss
        cfg = M.LlamaConfig(vocab_size=270, dim=64, layers=4, heads=4,
                            kv_heads=2, ffn_dim=128, max_seq_len=64)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(0).randint(
            3, cfg.vocab_size, size=(8, 16)), jnp.int32)
        want = float(next_token_loss(M.forward(params, ids, cfg), ids))

        mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=4, devices=jax.devices()[:4])
        got = float(pipeline_llama_loss(params, ids, cfg, mesh,
                                        num_microbatches=4))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_pipeline_grads_match_unsharded(self):
        """Autodiff through the ppermute schedule: per-layer grads must
        match the plain scan forward's grads."""
        from seed_tpu.parallel.pipeline import pipeline_llama_loss
        from seed_tpu.train.losses import next_token_loss
        cfg = M.LlamaConfig(vocab_size=270, dim=32, layers=2, heads=2,
                            kv_heads=2, ffn_dim=64, max_seq_len=32)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(1).randint(
            3, cfg.vocab_size, size=(4, 8)), jnp.int32)

        g_ref = jax.grad(lambda p: next_token_loss(
            M.forward(p, ids, cfg), ids))(params)
        mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
        g_pp = jax.grad(lambda p: pipeline_llama_loss(
            p, ids, cfg, mesh, num_microbatches=2))(params)
        for path in (("layers", "q_proj", "kernel"),
                     ("layers", "down_proj", "kernel"),
                     ("embed_tokens", "embedding"),
                     ("lm_head", "kernel")):
            a, b = g_ref, g_pp
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg="/".join(path))

    def test_pipeline_fsdp_loss_matches_unsharded(self):
        """pp=2 x fsdp=2 x dp=2: per-layer weights sharded over fsdp and
        gathered just-in-time inside the stage scan must reproduce the
        unsharded loss."""
        from seed_tpu.parallel.pipeline import pipeline_fsdp_llama_loss
        from seed_tpu.train.losses import next_token_loss
        cfg = M.LlamaConfig(vocab_size=270, dim=32, layers=4, heads=2,
                            kv_heads=2, ffn_dim=64, max_seq_len=32)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(3).randint(
            3, cfg.vocab_size, size=(8, 8)), jnp.int32)
        want = float(next_token_loss(M.forward(params, ids, cfg), ids))
        mesh = make_mesh(dp=2, fsdp=2, tp=1, pp=2)
        got = float(pipeline_fsdp_llama_loss(params, ids, cfg, mesh,
                                             num_microbatches=2))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_pipeline_fsdp_grads_match_unsharded(self):
        """ZeRO-3 semantics: the all_gather transpose reduce-scatters
        grads; gathering the sharded grads must match the plain grads."""
        from seed_tpu.parallel.pipeline import pipeline_fsdp_llama_loss
        from seed_tpu.train.losses import next_token_loss
        cfg = M.LlamaConfig(vocab_size=270, dim=32, layers=2, heads=2,
                            kv_heads=2, ffn_dim=64, max_seq_len=32)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(4).randint(
            3, cfg.vocab_size, size=(8, 8)), jnp.int32)
        g_ref = jax.grad(lambda p: next_token_loss(
            M.forward(p, ids, cfg), ids))(params)
        mesh = make_mesh(dp=1, fsdp=2, tp=1, pp=2, devices=jax.devices()[:4])
        g_pf = jax.grad(lambda p: pipeline_fsdp_llama_loss(
            p, ids, cfg, mesh, num_microbatches=2))(params)
        for path in (("layers", "q_proj", "kernel"),
                     ("layers", "down_proj", "kernel"),
                     ("embed_tokens", "embedding")):
            a, b = g_ref, g_pf
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg="/".join(path))

    def test_pipeline_composes_with_data_parallel(self):
        from seed_tpu.parallel.pipeline import pipeline_llama_loss
        from seed_tpu.train.losses import next_token_loss
        cfg = M.LlamaConfig(vocab_size=270, dim=32, layers=4, heads=2,
                            kv_heads=2, ffn_dim=64, max_seq_len=32)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.RandomState(2).randint(
            3, cfg.vocab_size, size=(8, 8)), jnp.int32)
        want = float(next_token_loss(M.forward(params, ids, cfg), ids))
        mesh = make_mesh(dp=2, fsdp=1, tp=1, pp=4)
        got = float(pipeline_llama_loss(params, ids, cfg, mesh,
                                        num_microbatches=2))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestShardedEncode:
    def test_tokenizer_encode_sharded_matches(self):
        cfg = TINY_TOKENIZER
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 28, 28, 3))
        want = np.asarray(encode(params, imgs, cfg))

        mesh = make_mesh(dp=1, fsdp=4, tp=2)
        sharded = shard_params(params, mesh, VIT_TP_RULES)
        imgs_sharded = jax.device_put(imgs, batch_sharding(mesh))
        got = np.asarray(jax.jit(
            lambda p, x: encode(p, x, cfg))(sharded, imgs_sharded))
        np.testing.assert_array_equal(want, got)

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

"""LLaMA decoder: oracle parity, KV-cache consistency, generation engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_tpu import BOI_TOKEN_ID, EOI_TOKEN_ID, IMAGE_ID_SHIFT
from seed_tpu.models import llama as M
from seed_tpu.models import layers as L
from seed_tpu.ops.sampling import apply_top_p, sample
from seed_tpu.serving import (ByteTextTokenizer, GenerationConfig,
                              LlamaEngine, SeedLlamaInterface)

import torch_oracles as oracle

CFG = M.TINY_LLAMA


@pytest.fixture(scope="module")
def params():
    return M.init_llama(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


class TestPrimitives:
    def test_rms_norm_matches_torch(self):
        x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
        scale = np.random.RandomState(1).randn(16).astype(np.float32)
        got = L.rms_norm({"scale": jnp.asarray(scale)}, jnp.asarray(x), 1e-6)
        want = oracle.rms_norm(oracle.t(x), scale)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_rope_matches_torch(self):
        x = np.random.RandomState(0).randn(2, 7, 4, 16).astype(np.float32)
        pos = np.arange(7)
        got = M.rope(jnp.asarray(x), jnp.asarray(pos))
        want = oracle.rope(oracle.t(x), pos)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_rope_position_shift_invariance(self):
        """RoPE attention scores depend only on relative positions."""
        q = jnp.asarray(np.random.RandomState(0).randn(1, 4, 2, 8), jnp.float32)
        k = jnp.asarray(np.random.RandomState(1).randn(1, 4, 2, 8), jnp.float32)
        s0 = jnp.einsum("bnhd,bmhd->bhnm", M.rope(q, jnp.arange(4)),
                        M.rope(k, jnp.arange(4)))
        s1 = jnp.einsum("bnhd,bmhd->bhnm", M.rope(q, jnp.arange(4) + 13),
                        M.rope(k, jnp.arange(4) + 13))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-4, atol=1e-4)


class TestForward:
    def test_shapes_and_padding_mask(self, params):
        ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
        logits = M.forward(params, ids, CFG)
        assert logits.shape == (1, 4, CFG.padded_vocab)
        # padded vocab entries must be masked to ~ -inf
        assert np.asarray(logits)[..., CFG.vocab_size:].max() < -1e8

    def test_causality(self, params):
        """Changing a later token must not affect earlier logits."""
        ids1 = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
        ids2 = jnp.asarray([[1, 5, 9, 200]], jnp.int32)
        l1 = np.asarray(M.forward(params, ids1, CFG))
        l2 = np.asarray(M.forward(params, ids2, CFG))
        np.testing.assert_allclose(l1[:, :3], l2[:, :3], rtol=1e-5, atol=1e-5)
        assert np.abs(l1[:, 3] - l2[:, 3]).max() > 1e-3

    def test_gqa_head_counts(self, params):
        # TINY_LLAMA has kv_heads=2 < heads=4: shapes must work end to end
        assert CFG.kv_heads < CFG.heads
        ids = jnp.asarray([[3, 1, 4]], jnp.int32)
        assert M.forward(params, ids, CFG).shape[1] == 3


class TestKVCache:
    def test_prefill_matches_forward(self, params):
        ids = jnp.asarray([[1, 5, 9, 12, 7]], jnp.int32)
        full = np.asarray(M.forward(params, ids, CFG))
        cache = M.init_cache(CFG, 1, 16, dtype=jnp.float32)
        chunk, cache = M.prefill(params, ids, cache, CFG)
        np.testing.assert_allclose(full, np.asarray(chunk), rtol=2e-4, atol=2e-4)

    def test_incremental_decode_matches_forward(self, params):
        ids = np.asarray([[1, 5, 9, 12, 7, 3]], np.int32)
        full = np.asarray(M.forward(params, jnp.asarray(ids), CFG))
        cache = M.init_cache(CFG, 1, 16, dtype=jnp.float32)
        # prefill 3, then decode one token at a time
        _, cache = M.prefill(params, jnp.asarray(ids[:, :3]), cache, CFG)
        for t in range(3, 6):
            logits, cache = M.decode_step(params, jnp.asarray(ids[:, t:t + 1]),
                                          cache, CFG)
            np.testing.assert_allclose(full[:, t], np.asarray(logits)[:, 0],
                                       rtol=2e-4, atol=2e-4)

    def test_left_padded_prefill(self, params):
        """A left-padded batch must produce the same last-token logits as the
        unpadded sequence."""
        seq = [4, 8, 15, 16]
        cache1 = M.init_cache(CFG, 1, 16, dtype=jnp.float32)
        l1, _ = M.prefill(params, jnp.asarray([seq], jnp.int32), cache1, CFG)
        ref = np.asarray(l1)[:, -1]

        padded = [0, 0] + seq
        mask = [0, 0, 1, 1, 1, 1]
        cache2 = M.init_cache(CFG, 1, 16, dtype=jnp.float32)
        l2, _ = M.prefill(params, jnp.asarray([padded], jnp.int32), cache2,
                          CFG, chunk_mask=jnp.asarray([mask], jnp.int32))
        np.testing.assert_allclose(ref, np.asarray(l2)[:, -1],
                                   rtol=2e-4, atol=2e-4)


class TestInt8KVCache:
    def test_int8_cache_close_to_fp32(self, params):
        """int8 KV cache (per-token/head absmax) must track fp32 logits and
        preserve greedy argmax on a random tiny model."""
        ids = np.asarray([[1, 5, 9, 12, 7, 3]], np.int32)
        full = np.asarray(M.forward(params, jnp.asarray(ids), CFG))
        cache = M.init_cache(CFG, 1, 16, dtype=jnp.int8)
        assert cache.kv.dtype == jnp.int8
        assert cache.scale.shape == cache.kv.shape[:-1] + (2,)
        _, cache = M.prefill(params, jnp.asarray(ids[:, :3]), cache, CFG)
        for t in range(3, 6):
            logits, cache = M.decode_step(params, jnp.asarray(ids[:, t:t + 1]),
                                          cache, CFG)
            got = np.asarray(logits)[:, 0]
            ref = full[:, t]
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
            assert rel < 0.03, rel
            np.testing.assert_array_equal(
                ref[..., :CFG.vocab_size].argmax(-1),
                got[..., :CFG.vocab_size].argmax(-1))

    def test_int8_cache_halves_bytes(self):
        c8 = M.init_cache(CFG, 2, 16, dtype=jnp.int8)
        c16 = M.init_cache(CFG, 2, 16, dtype=jnp.bfloat16)
        bytes8 = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(c8) if x.ndim > 0)
        bytes16 = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(c16) if x.ndim > 0)
        # tiny head_dim=16 makes the scale overhead 1/8th; at the real
        # head_dim=128 the ratio is 264/512 = 0.52
        assert bytes8 < 0.66 * bytes16

    def test_decode_loop_int8_cache(self, params):
        """decode_loop greedy must produce the same tokens with the int8
        cache as with fp32 on a well-separated random model."""
        prompt = jnp.asarray([[1, 5, 9]], jnp.int32)
        outs = []
        for dt in (jnp.float32, jnp.int8):
            cache = M.init_cache(CFG, 1, 32, dtype=dt)
            logits, cache = M.prefill(params, prompt, cache, CFG)
            tok = logits[:, -1, :CFG.vocab_size].argmax(-1).astype(jnp.int32)
            toks, _, _, _ = M.decode_loop(
                params, tok, cache, jax.random.PRNGKey(0), CFG,
                steps=8, do_sample=False, eos_id=-1)
            outs.append(np.asarray(toks))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestFp8KVCache:
    """fp8 (e4m3) cache: the serving default — same 2x HBM saving as int8
    but scale-free, so it rides the fast 2-element-carry bf16 code path
    (the int8 scale buffer's 3-element carry costs 7x decode; PERF.md)."""

    def test_fp8_cache_tracks_fp32_rollout(self, params):
        """Teacher-forced decode: fp8-cached logits must track fp32 within
        e4m3 tolerance at every step. (Exact greedy-argmax equality is NOT
        asserted — a random tiny model has near-tied logits that a 3-bit
        mantissa legitimately flips; the real model's margins are wider,
        c.f. the int8 test's stricter bound.)"""
        ids = np.asarray([[1, 5, 9, 12, 7, 3]], np.int32)
        full = np.asarray(M.forward(params, jnp.asarray(ids), CFG))
        cache = M.init_cache(CFG, 1, 16, dtype=jnp.float8_e4m3fn)
        assert cache.scale is None
        assert cache.kv.dtype.itemsize == 1    # the 2x HBM saving
        _, cache = M.prefill(params, jnp.asarray(ids[:, :3]), cache, CFG)
        for t in range(3, 6):
            logits, cache = M.decode_step(params, jnp.asarray(ids[:, t:t + 1]),
                                          cache, CFG)
            got = np.asarray(logits)[:, 0]
            ref = full[:, t]
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
            assert rel < 0.15, rel

    def test_fp8_cache_logits_close(self, params):
        ids = np.asarray([[1, 5, 9, 12, 7, 3]], np.int32)
        full = np.asarray(M.forward(params, jnp.asarray(ids), CFG))
        cache = M.init_cache(CFG, 1, 16, dtype=jnp.float8_e4m3fn)
        assert cache.kv.dtype == jnp.float8_e4m3fn
        _, cache = M.prefill(params, jnp.asarray(ids[:, :3]), cache, CFG)
        logits, cache = M.decode_step(params, jnp.asarray(ids[:, 3:4]),
                                      cache, CFG)
        got = np.asarray(logits)[:, 0]
        ref = full[:, 3]
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.15, rel   # e4m3: 3-bit mantissa; int8 bound is 0.03


class TestSampling:
    def test_top_p_keeps_crossing_token(self):
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(apply_top_p(logits, 0.5))
        # 0.5 crosses p=0.5 -> kept; everything else filtered
        assert out[0, 0] > -1e8
        assert (out[0, 1:] < -1e8).all()

    def test_top_p_keeps_head(self):
        logits = jnp.log(jnp.asarray([[0.4, 0.35, 0.2, 0.05]]))
        out = np.asarray(apply_top_p(logits, 0.5))
        assert out[0, 0] > -1e8 and out[0, 1] > -1e8
        assert (out[0, 2:] < -1e8).all()

    def test_greedy(self):
        logits = jnp.asarray([[0.1, 3.0, 0.2]])
        tok = sample(jax.random.PRNGKey(0), logits, do_sample=False)
        assert int(tok[0]) == 1

    def test_top_p_candidates_matches_exact(self):
        # the top_k candidate path (decode fast path: skips the full
        # 40320-wide sort) must equal the exact path whenever the nucleus
        # fits inside the candidate set — here a peaked distribution
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(4, 512) * 3, jnp.float32)
        for p in (0.3, 0.7, 0.95):
            exact = np.asarray(apply_top_p(logits, p))
            fast = np.asarray(apply_top_p(logits, p, candidates=128))
            np.testing.assert_allclose(fast, exact, rtol=1e-6)

    def test_top_p_rowwise_candidates_p1_keeps_all(self):
        from seed_tpu.ops.sampling import apply_top_p_rowwise
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(2, 256), jnp.float32)
        p = jnp.asarray([0.5, 1.0], jnp.float32)
        out = np.asarray(apply_top_p_rowwise(logits, p, candidates=64))
        assert (out[0] < -1e8).any()          # row 0 filtered
        assert (out[1] > -1e8).all()          # p=1 row untouched


class TestEngine:
    def test_generate_greedy_matches_manual(self, params):
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                               eos_token_id=-1)
        out = eng.generate([[1, 5, 9]], gen)[0]
        assert len(out) == 5

        # manual greedy rollout with full forward each step
        ids = [1, 5, 9]
        for _ in range(5):
            logits = M.forward(params, jnp.asarray([ids], jnp.int32), CFG)
            ids.append(int(np.asarray(logits)[0, -1].argmax()))
        assert out == ids[3:]

    def test_batch_heterogeneous_lengths(self, params):
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                               eos_token_id=-1)
        both = eng.generate([[1, 5, 9], [2, 7]], gen)
        solo0 = eng.generate([[1, 5, 9]], gen)[0]
        solo1 = eng.generate([[2, 7]], gen)[0]
        assert both[0] == solo0
        assert both[1] == solo1

    def test_forced_first_token(self, params):
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=3, do_sample=False,
                               eos_token_id=-1, forced_first_token=42)
        out = eng.generate([[1, 2]], gen)[0]
        assert out[0] == 42

    def test_chunk_size_invariance(self, params):
        """Greedy output must not depend on how many decode steps run per
        dispatch (decode_loop chunking is a pure scheduling choice)."""
        gen = GenerationConfig(max_new_tokens=7, do_sample=False,
                               eos_token_id=-1)
        outs = []
        for chunk in (1, 3, 32):
            eng = LlamaEngine(params, CFG, max_len=64,
                              cache_dtype=jnp.float32, chunk_steps=chunk)
            outs.append(eng.generate([[1, 5, 9], [2, 7]], gen))
        assert outs[0] == outs[1] == outs[2]

    def test_eos_mid_chunk_stops_row(self, params):
        """A row hitting eos inside a chunk must not emit trailing junk."""
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32,
                          chunk_steps=8)
        # run greedy once to learn the natural 3rd token, then declare it eos
        probe = eng.generate([[1, 5, 9]], GenerationConfig(
            max_new_tokens=6, do_sample=False, eos_token_id=-1))[0]
        eos = probe[2]
        gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                               eos_token_id=eos)
        out = eng.generate([[1, 5, 9]], gen)[0]
        assert out == probe[:2]     # eos stripped, nothing after


class TestDecodeLoop:
    def test_matches_stepwise_greedy(self, params):
        B, P, K = 2, 4, 5
        ids = jnp.asarray(np.random.RandomState(0).randint(3, 200, (B, P)),
                          jnp.int32)
        cache = M.init_cache(CFG, B, 32, jnp.float32)
        logits, cache = M.prefill(params, ids, cache, CFG)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        cache2 = jax.tree.map(jnp.copy, cache)
        toks, done, _, _ = M.decode_loop(
            params, tok, cache, jax.random.PRNGKey(0), CFG, steps=K,
            do_sample=False, eos_id=-1)

        want = []
        cur = tok
        for _ in range(K):
            lg, cache2 = M.decode_step(params, cur[:, None], cache2, CFG)
            cur = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
            want.append(np.asarray(cur))
        np.testing.assert_array_equal(np.asarray(toks), np.stack(want, 1))
        assert not np.asarray(done).any()

    def test_eos_pins_row(self, params):
        B = 2
        cache = M.init_cache(CFG, B, 32, jnp.float32)
        ids = jnp.asarray([[1, 5], [2, 7]], jnp.int32)
        logits, cache = M.prefill(params, ids, cache, CFG)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        # find what row 0 emits next, make THAT the eos id
        lg, c2 = M.decode_step(params, tok[:, None],
                               jax.tree.map(jnp.copy, cache), CFG)
        eos = int(np.asarray(jnp.argmax(lg[:, 0], -1))[0])
        toks, done, _, _ = M.decode_loop(
            params, tok, cache, jax.random.PRNGKey(0), CFG, steps=4,
            do_sample=False, eos_id=eos)
        row0 = np.asarray(toks)[0]
        assert row0[0] == eos and (row0 == eos).all()   # pinned after hit
        assert bool(np.asarray(done)[0])


class TestSampleBatched:
    def test_greedy_rows_match_argmax(self):
        from seed_tpu.ops.sampling import sample_batched
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(4, 50).astype(np.float32))
        tok = sample_batched(
            jax.random.PRNGKey(1), logits,
            jnp.ones(4, jnp.float32), jnp.ones(4, jnp.float32),
            jnp.asarray([True, True, True, True]))
        np.testing.assert_array_equal(
            np.asarray(tok), np.asarray(jnp.argmax(logits, -1)))

    def test_rowwise_top_p_matches_scalar(self):
        from seed_tpu.ops.sampling import apply_top_p_rowwise
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(3, 20).astype(np.float32))
        for p in (0.3, 0.7):
            got = apply_top_p_rowwise(logits, jnp.full(3, p, jnp.float32))
            want = apply_top_p(logits, p)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_mixed_rows(self):
        from seed_tpu.ops.sampling import sample_batched
        rng = np.random.RandomState(2)
        logits = jnp.asarray(rng.randn(2, 30).astype(np.float32))
        # row 0 greedy, row 1 top_p=0.01 (nucleus collapses to argmax too)
        tok = sample_batched(
            jax.random.PRNGKey(3), logits,
            jnp.asarray([1.0, 1.0], jnp.float32),
            jnp.asarray([1.0, 0.01], jnp.float32),
            jnp.asarray([True, False]))
        np.testing.assert_array_equal(
            np.asarray(tok), np.asarray(jnp.argmax(logits, -1)))


class TestMultimodalSplit:
    def test_split_interleaved(self):
        iface = SeedLlamaInterface(engine=None, tok_params=None,
                                   text_tokenizer=ByteTextTokenizer())
        text1 = ByteTextTokenizer().encode("hi")
        codes = list(range(32))
        img = [BOI_TOKEN_ID] + [c + IMAGE_ID_SHIFT for c in codes] + [EOI_TOKEN_ID]
        text2 = ByteTextTokenizer().encode("bye")
        segs = iface.split_output(text1 + img + text2)
        assert [s.kind for s in segs] == ["text", "image", "text"]
        assert segs[0].text == "hi" and segs[2].text == "bye"
        np.testing.assert_array_equal(segs[1].image_codes[0], codes)

    def test_malformed_image_block_degrades_gracefully(self):
        iface = SeedLlamaInterface(engine=None, tok_params=None,
                                   text_tokenizer=ByteTextTokenizer())
        # BOI without EOI
        ids = ByteTextTokenizer().encode("x") + [BOI_TOKEN_ID, IMAGE_ID_SHIFT + 5]
        segs = iface.split_output(ids)
        assert all(s.kind == "text" for s in segs)

    def test_string_space_adapter_roundtrip(self):
        """The reference's '<img><img_xxxxx>...</img>' vocabulary strings
        (seed_llama_inference_8B.py:18-23) round-trip through the adapter."""
        from seed_tpu.serving import codes_to_string, string_to_parts
        codes = np.arange(32, dtype=np.int32)
        s = "describe " + codes_to_string(codes) + " please"
        assert "<img><img_00000>" in s and s.endswith("please")
        parts = string_to_parts(s)
        assert parts[0] == "describe " and parts[2] == " please"
        np.testing.assert_array_equal(parts[1], codes)

    def test_string_adapter_rejects_bad_codes(self):
        from seed_tpu.serving import codes_to_string
        with pytest.raises(ValueError):
            codes_to_string([0, 99999])

    def test_segments_to_string(self):
        from seed_tpu.serving import Segment, segments_to_string
        codes = np.arange(32, dtype=np.int32)[None]
        s = segments_to_string([Segment("text", text="a"),
                                Segment("image", image_codes=codes),
                                Segment("text", text="b")])
        assert s.startswith("a<img>") and s.endswith("</img>b")

    def test_prompt_assembly(self):
        iface = SeedLlamaInterface(engine=None, tok_params=None,
                                   text_tokenizer=ByteTextTokenizer())
        codes = np.arange(32)
        ids = iface.build_prompt(["what is this?", codes])
        assert ids[0] == ByteTextTokenizer.bos_token_id
        assert BOI_TOKEN_ID in ids and EOI_TOKEN_ID in ids
        b = ids.index(BOI_TOKEN_ID)
        assert ids[b + 1] == IMAGE_ID_SHIFT + 0
        assert ids[b + 32] == IMAGE_ID_SHIFT + 31
        assert ids[b + 33] == EOI_TOKEN_ID


class TestRopeScaling:
    def test_linear_scaling_interpolates_positions(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 2, 8), jnp.float32)
        a = M.rope(x, jnp.arange(4) * 2, scaling=None)
        b = M.rope(x, jnp.arange(4) * 4, scaling="linear", factor=2.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_ntk_changes_frequencies(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 2, 8), jnp.float32)
        a = M.rope(x, jnp.arange(4), scaling=None)
        b = M.rope(x, jnp.arange(4), scaling="ntk", factor=4.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_config_threads_through_forward(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, rope_scaling="linear",
                                  rope_scaling_factor=2.0)
        params = M.init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        out = M.forward(params, jnp.asarray([[1, 2, 3]], jnp.int32), cfg)
        assert np.isfinite(np.asarray(out[..., :cfg.vocab_size])).all()


class TestBeamSearch:
    """In-graph beam_loop vs a from-scratch numpy beam oracle (full
    forward recompute per step, identical freeze/normalize semantics)."""

    @staticmethod
    def _oracle(params, prompt, K, steps, eos_id, lp=1.0):
        def last_logp(seq):
            lg = np.asarray(M.forward(
                params, jnp.asarray([seq], jnp.int32), CFG))[0, -1]
            lg = lg.astype(np.float64)
            return lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max()

        l0 = last_logp(prompt)
        first = np.argsort(-l0, kind="stable")[:K]
        # beams: (cum, tokens, finished, gen_len)
        beams = [(float(l0[t]), [int(t)], int(t) == eos_id, 1) for t in first]
        for _ in range(steps):
            cands = []
            for ci, (cum, toks, fin, gl) in enumerate(beams):
                if fin:
                    cands.append((cum, ci, eos_id))
                else:
                    l = last_logp(prompt + toks)
                    for t in range(len(l)):
                        cands.append((cum + float(l[t]), ci, t))
            cands.sort(key=lambda c: (-c[0], c[1] * 10**9 + c[2]))
            new = []
            for cum, ci, t in cands[:K]:
                _, toks, fin, gl = beams[ci]
                if not fin:
                    gl = gl + 1
                    toks = toks + [t]
                new.append((cum, toks, fin or t == eos_id, gl))
            beams = new
        scored = [(cum / gl ** lp, toks, gl) for cum, toks, fin, gl in beams]
        best = max(scored, key=lambda s: s[0])
        toks = best[1][:best[2]]
        if toks and toks[-1] == eos_id:
            toks = toks[:-1]
        return toks

    def test_beam1_equals_greedy(self, params):
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        greedy = eng.generate([[4, 8, 15]], GenerationConfig(
            max_new_tokens=6, do_sample=False, eos_token_id=-1))
        beam = eng._beam_generate([[4, 8, 15]], GenerationConfig(
            max_new_tokens=6, num_beams=1, eos_token_id=-1))
        assert beam == greedy

    def test_beam_matches_numpy_oracle(self, params):
        prompt = [4, 8, 15, 16]
        want = self._oracle(params, prompt, K=3, steps=5, eos_id=-1)
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        got = eng.generate([prompt], GenerationConfig(
            max_new_tokens=6, num_beams=3, eos_token_id=-1))[0]
        assert got == want

    def test_beam_eos_freeze_matches_oracle(self, params):
        """Pick the oracle's step-2 token as eos so beams actually finish
        mid-search; frozen scores must match."""
        prompt = [7, 3, 9]
        probe = self._oracle(params, prompt, K=3, steps=5, eos_id=-1)
        eos = probe[2]
        want = self._oracle(params, prompt, K=3, steps=5, eos_id=eos)
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        got = eng.generate([prompt], GenerationConfig(
            max_new_tokens=6, num_beams=3, eos_token_id=eos))[0]
        assert got == want

    def test_beam_batched_rows_independent(self, params):
        """Each batch row's beam search must equal its solo run."""
        prompts = [[4, 8, 15], [23, 42]]
        eng = LlamaEngine(params, CFG, max_len=64, cache_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=5, num_beams=3,
                               eos_token_id=-1)
        both = eng.generate(prompts, gen)
        for i, p in enumerate(prompts):
            solo = eng.generate([p], gen)[0]
            assert both[i] == solo, p

    def test_beam_length_penalty_changes_selection_consistently(self, params):
        prompt = [11, 12, 13]
        for lp in (0.5, 2.0):
            want = self._oracle(params, prompt, K=3, steps=4, eos_id=-1,
                                lp=lp)
            eng = LlamaEngine(params, CFG, max_len=64,
                              cache_dtype=jnp.float32)
            got = eng.generate([prompt], GenerationConfig(
                max_new_tokens=5, num_beams=3, eos_token_id=-1,
                length_penalty=lp))[0]
            assert got == want, lp


class TestSeedLlama14B:
    """The 14B path is load-bearing, not just a config constant
    (/root/reference/scripts/seed_llama_inference_14B.py)."""

    def test_config_divisibility(self):
        cfg = M.SEED_LLAMA_14B
        assert cfg.dim % cfg.heads == 0 and cfg.dim // cfg.heads == 128
        assert cfg.heads == cfg.kv_heads == 40      # llama2-13b is MHA
        assert cfg.padded_vocab % 128 == 0
        for tp in (2, 4, 8):                         # shardable dims
            assert cfg.heads % tp == 0
            assert cfg.dim % tp == 0 and cfg.ffn_dim % tp == 0

    def test_int8_single_chip_memory_verdict(self):
        """int8 weights + bf16 cache at the serving shape, from the real
        eval_shape byte counts: B=8 fits one 15.75 GiB v5e, B=32 does
        not (needs fp8 cache or TP) — the documented serving envelope."""
        from seed_tpu.ops.quantization import quantize_tree
        cfg = M.SEED_LLAMA_14B
        shapes = jax.eval_shape(
            lambda k: quantize_tree(M.init_llama(k, cfg, jnp.bfloat16)),
            jax.random.PRNGKey(0))
        wbytes = sum(np.prod(s.shape) * s.dtype.itemsize
                     for s in jax.tree.leaves(shapes))
        cbytes = lambda B, S: sum(
            np.prod(s.shape) * s.dtype.itemsize for s in jax.tree.leaves(
                jax.eval_shape(lambda: M.init_cache(cfg, B, S))))
        gb = 1 << 30
        assert 11.9 * gb < wbytes < 13.0 * gb       # 13B int8 + scales: 12.4
        assert (wbytes + cbytes(8, 192)) < 15.0 * gb      # B=8 fits (13.6)
        assert (wbytes + cbytes(32, 192)) > 15.75 * gb    # B=32 does not (17.1)

    def test_decode_loop_traces_at_14b_dims(self):
        """The full int8 decode program traces/eval_shapes at the real 14B
        dims (no dim mismatch anywhere in prefill/decode/sampling)."""
        import functools
        from seed_tpu.ops.quantization import quantize_tree
        cfg = M.SEED_LLAMA_14B
        B, S = 8, 64
        params_s = jax.eval_shape(
            lambda k: quantize_tree(M.init_llama(k, cfg, jnp.bfloat16)),
            jax.random.PRNGKey(0))
        cache_s = jax.eval_shape(lambda: M.init_cache(cfg, B, S))
        out = jax.eval_shape(
            functools.partial(M.decode_loop, cfg=cfg, steps=4,
                              temperature=1.0, top_p=0.5, eos_id=-1),
            params_s, jax.ShapeDtypeStruct((B,), jnp.int32), cache_s,
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        assert out[0].shape == (B, 4)
